#!/usr/bin/env python
"""Streaming VIS inference benchmark at non-default geometries on one TPU chip.

Presets mirror the reference's headline configurations beyond the driver
benchmark's R50-360p (bench.py):
  swinl_480 — configs/swinl_ovis.yaml eval geometry: Swin-L backbone, f2 clips,
              20-frame windows, 480p input (OVIS 1920x1080 -> 480x853, pad /32)
  r50_640   — configs/R50_ovis_720.yaml eval geometry: R50, f4 clips, 30-frame
              windows, 640p input (640x1138, pad /32)

Usage: python tools/bench_inference.py swinl_480 [n_runs]
Prints one JSON line like bench.py.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "swinl_480": dict(backbone="swin_large", H=480, W=853, n_frames_test=2,
                      window=20, n_frames_video=24),
    "r50_640": dict(backbone="resnet50", H=640, W=1138, n_frames_test=4,
                    window=30, n_frames_video=36),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "swinl_480"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    p = PRESETS[name]

    import jax
    from bench import _load_or_init_params
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.models.meta import (InferenceCfg, inference_vis,
                                               preprocess_frames)
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache

    cfg = MDQEModelCfg(backbone=p["backbone"], num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6,
                       n_frames=p["n_frames_test"], n_query=196,
                       query_embed_dim=64, dec_temporal=True)
    inf = InferenceCfg(clip_stride=1, n_frames_test=p["n_frames_test"],
                       n_frames_window_test=p["window"], max_num_instances=120,
                       apply_cls_thres=0.1, detections_per_image=15,
                       clip_topk=150, encode_chunk=10, num_classes=25)

    params = _load_or_init_params(jax, cfg, detr_init)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    enable_cache()

    rng = np.random.default_rng(0)
    H, W = p["H"], p["W"]
    n_frames = p["n_frames_video"]
    video = rng.integers(0, 255, (n_frames, H, W, 3)).astype(np.uint8)
    frames, _ = preprocess_frames(video)

    def run():
        return inference_vis(params, cfg, inf, frames, image_size=(H, W),
                             ori_size=(H, W))

    t0 = time.perf_counter()
    run()  # warm-up + compile
    compile_s = time.perf_counter() - t0
    n_clips = (n_frames - inf.n_frames_test) // inf.clip_stride + 1
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        run()
        rates.append(n_clips / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": f"clips_per_sec_per_chip_{name}",
        "value": round(max(rates), 3),
        "unit": "clips/s",
        "median": round(float(np.median(rates)), 3),
        "runs": [round(r, 3) for r in rates],
        "first_call_incl_compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
