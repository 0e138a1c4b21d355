"""Qwen-VL-Chat on TPU.

A ground-up JAX implementation of the architecture the reference drives
through HF transformers + trust_remote_code
(extract_activations.py:17-28): an OpenCLIP-bigG-style ViT visual
encoder with a 256-query cross-attention resampler feeding a 32-layer
QWen decoder (RMSNorm, rotary, fused-QKV-with-bias attention, SwiGLU
MLP, hidden 4096).

Design departures from the reference's serving path (all TPU-first):
  * per-layer activation capture is a ``lax.scan`` carry with a stacked
    [n_layers, batch, hidden] output — one jitted batched forward
    replaces 32 Python hooks x batch-1 loops x full-sequence
    device->host copies (SURVEY §3.2 hot spots);
  * layer parameters are stacked along a leading layer axis (scan-
    friendly, one HBM buffer per weight kind);
  * weights convert from the HF checkpoint via tdax.models.qwen_vl.convert.
"""

from tdax.models.qwen_vl.config import QwenVLConfig, VisualConfig
from tdax.models.qwen_vl.model import (init_params, forward,
                                       extract_layer_activations)

__all__ = ["QwenVLConfig", "VisualConfig", "init_params", "forward",
           "extract_layer_activations"]
