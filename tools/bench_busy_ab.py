"""Tunnel-invariant banded-vs-legacy A/B on the driver geometry.

Wall clock through the axon tunnel swings 50x in bad windows, so this compares
the two deform-attn kernel families by DEVICE BUSY TIME: one warmup video +
one jax.profiler-traced video per setting (MDQE_DEFORM_BANDED=1/0), summing
device-side op durations from the trace. Run each setting in a separate
process (the env toggle is read at trace time inside the jitted model):

  python tools/bench_busy_ab.py 1   # banded
  python tools/bench_busy_ab.py 0   # legacy

Prints one JSON line with device_busy_seconds for the setting.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["MDQE_DEFORM_BANDED"] = sys.argv[1] if len(sys.argv) > 1 else "1"

import numpy as np


def main():
    import jax
    from bench import _device_busy, _load_or_init_params
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
    wall, busy, plane = _device_busy(jax, run)
    print(json.dumps({
        "banded": os.environ["MDQE_DEFORM_BANDED"],
        "device_busy_seconds": round(busy, 3) if busy is not None else None,
        "wall_seconds": round(wall, 3) if wall else None,
        "note": None if busy is not None else str(plane)[:200],
    }), flush=True)


if __name__ == "__main__":
    main()
