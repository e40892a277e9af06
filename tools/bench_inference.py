#!/usr/bin/env python
"""Streaming VIS inference benchmark at non-default geometries on one TPU chip.

Thin CLI over bench.py's geometry runner (the same presets bench.py
regression-tracks every round):
  swinl_480 — configs/swinl_ovis.yaml eval geometry: Swin-L backbone, f2 clips,
              20-frame windows, 480p input (OVIS 1920x1080 -> 480x853, pad /32)
  r50_640   — configs/R50_ovis_720.yaml eval geometry: R50, f4 clips, 30-frame
              windows, 640p input (640x1138, pad /32)

Usage: python tools/bench_inference.py swinl_480 [n_runs]
Prints one JSON line like bench.py (clips/s + achieved-TFLOP/s estimate).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA_GEOMETRIES, _geometry_line  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "swinl_480"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    presets = dict(EXTRA_GEOMETRIES)
    if name not in presets:
        raise SystemExit(f"unknown preset {name!r}; choose from {list(presets)}")

    import jax
    # _geometry_line handles the persistent-cache enable itself (after the
    # machine-specific CPU param init)
    _geometry_line(jax, name, presets[name], n_runs=n_runs)


if __name__ == "__main__":
    main()
