"""Compute kernels: distances, top-k, UMAP, Vietoris-Rips persistence."""
