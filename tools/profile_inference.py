#!/usr/bin/env python
"""Host-blocking breakdown of the VIS inference pipeline on the real chip.

Each stage in inference_vis is wrapped with wall-clock timers (models/meta.py
TIMERS). Device dispatch is async, so "dispatch" entries measure call overhead
and "sync" entries absorb whatever device work the pipeline failed to hide —
exactly the quantity to minimize."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.models import meta
    from mdqe_cvpr2023_tpu.models.meta import (InferenceCfg, inference_vis,
                                               preprocess_frames)

    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=4,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    inf = InferenceCfg(clip_stride=1, n_frames_test=4, n_frames_window_test=30,
                       max_num_instances=120, apply_cls_thres=0.1,
                       detections_per_image=15, clip_topk=150, num_classes=25)

    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(detr_init, static_argnums=(1,))(jax.random.PRNGKey(0),
                                                         cfg)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    enable_cache()
    rng = np.random.default_rng(0)
    H, W = 360, 640
    n_frames = int(os.environ.get("PROFILE_FRAMES", 46))  # crosses one window handoff
    video = rng.integers(0, 255, (n_frames, H, W, 3)).astype(np.uint8)
    frames, _ = preprocess_frames(video)

    def run():
        return inference_vis(params, cfg, inf, frames, image_size=(H, W),
                             ori_size=(H, W))

    run()  # compile
    meta.TIMERS.clear()
    n_clips = (n_frames - inf.n_frames_test) // inf.clip_stride + 1
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0

    series = meta.TIMERS.pop("clip_ms_series", [])
    rows = {}
    accounted = 0.0
    for k, v in sorted(meta.TIMERS.items()):
        if k.endswith("_n"):
            continue
        n = meta.TIMERS.get(k + "_n", 1)
        rows[k] = {"total_s": round(v, 3), "n": n, "ms_per_call": round(1e3 * v / n, 2),
                   "ms_per_clip": round(1e3 * v / n_clips, 2)}
        accounted += v
    print(json.dumps({
        "wall_s": round(wall, 3), "n_clips": n_clips,
        "clips_per_s": round(n_clips / wall, 2),
        "ms_per_clip": round(1e3 * wall / n_clips, 2),
        "unaccounted_ms_per_clip": round(1e3 * (wall - accounted) / n_clips, 2),
        "stages": rows,
    }, indent=1))
    print("clip_ms_series:", series)


if __name__ == "__main__":
    main()
