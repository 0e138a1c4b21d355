#!/usr/bin/env python
"""Alias for visualize_peak_layer.py (the reference ships the file as
``visualize.py`` while its README names it ``visualize_peak_layer.py``,
README.md:22 vs visualize.py:1 — both work here)."""

from visualize_peak_layer import main

if __name__ == "__main__":
    import sys
    args = sys.argv[1:]
    if args:
        main(int(args[0]), *( [args[1]] if len(args) > 1 else [] ))
    else:
        main()
