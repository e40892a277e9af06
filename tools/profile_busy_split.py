"""Per-module device-busy split for one driver-geometry video.

bench.py's device_busy_seconds collapses the whole video to one number; this
tool attributes it: jax.profiler trace of ONE video, device events grouped by
XLA module (the jit name prefix of each event), so the next optimization
target is visible — encode vs decode vs clip/tracker vs finalize.

Run: python tools/profile_busy_split.py   (single TPU process, warm cache ~2 min)
Prints one JSON line: {"module": seconds} sorted desc + total.
"""
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _module_split(jax, run_fn):
    td = tempfile.mkdtemp(prefix="busy_split_")
    t0 = time.perf_counter()
    with jax.profiler.trace(td):
        run_fn()
    wall = time.perf_counter() - t0
    paths = glob.glob(os.path.join(td, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return wall, None
    from jax.profiler import ProfileData
    pd = ProfileData.from_file(paths[0])
    # pick the busiest TPU line (same heuristic as bench._device_busy), then
    # sum event durations per event name (XLA module executions)
    best_line, best_busy = None, 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            busy = sum(e.end_ns - e.start_ns for e in line.events)
            if busy > best_busy:
                best_busy, best_line = busy, line
    if best_line is None:
        return wall, None
    agg = {}
    for e in best_line.events:
        name = e.name.split(".")[0]
        agg[name] = agg.get(name, 0.0) + (e.end_ns - e.start_ns) / 1e9
    return wall, dict(sorted(agg.items(), key=lambda kv: -kv[1]))


def main():
    import jax
    from bench import _load_or_init_params
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.models.meta import (InferenceCfg, inference_vis,
                                               preprocess_frames)
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache

    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=4,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    inf = InferenceCfg(clip_stride=1, n_frames_test=4, n_frames_window_test=30,
                       max_num_instances=120, apply_cls_thres=0.1,
                       detections_per_image=15, clip_topk=150, encode_chunk=10,
                       num_classes=25)
    params = _load_or_init_params(jax, cfg, detr_init)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    enable_cache()
    rng = np.random.default_rng(0)
    H, W = 360, 640
    video = rng.integers(0, 255, (36, H, W, 3)).astype(np.uint8)
    frames, _ = preprocess_frames(video, np.array([123.675, 116.28, 103.53]),
                                  np.array([58.395, 57.12, 57.375]))

    def run():
        return inference_vis(params, cfg, inf, frames, image_size=(H, W),
                             ori_size=(H, W))

    run()  # warmup/compile
    wall, split = _module_split(jax, run)
    line = {"wall_seconds": round(wall, 3) if wall else None}
    if split is None:
        line["note"] = "no TPU plane in trace"
    else:
        line["device_busy_seconds"] = round(sum(split.values()), 3)
        line["split_seconds"] = {k: round(v, 4)
                                 for k, v in list(split.items())[:20]}
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
