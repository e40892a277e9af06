#!/usr/bin/env python
"""Time the full R50 f4 training step on one TPU chip (fwd + criterion + bwd +
AdamW), with the deform-attn Pallas forward AND Pallas backward in the path.

Reports sec/iter at the OVIS-360 training geometry scaled to a single chip
(global batch IMS_PER_BATCH=16 runs across 8+ chips in production; per-chip
batch is 2). Timing: donated-state steps chained back-to-back, one tiny sync
(see memory: per-call syncs through the axon tunnel cost ~27 ms and lie)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.losses import CriterionCfg
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.parallel.train import (TrainCfg, make_optimizer,
                                                  make_train_step)

    B = int(os.environ.get("TRAIN_BENCH_BATCH", 2))  # per-chip clips
    backbone = os.environ.get("TRAIN_BENCH_BACKBONE", "r50")
    if backbone == "swinl":
        # configs/swinl_ovis.yaml training geometry: f2 clips, largest bucket
        # MIN_SIZE_TRAIN max 736 / MAX_SIZE_TRAIN 1024
        T, Hp, Wp, bb = 2, 736, 1024, "swin_large"
    else:
        T, Hp, Wp, bb = 4, 512, 800, "resnet50"  # R50_ovis_360 largest bucket
    N = 20              # instance slab (MAX_NUM_INSTANCES // 6)

    cfg = MDQEModelCfg(backbone=bb, num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=T,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    crit = CriterionCfg(num_classes=25, n_frames=T, n_query=196)
    from bench import _load_or_init_params
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache
    params = _load_or_init_params(jax, cfg, detr_init)  # CPU-jitted init, cached
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    enable_cache()  # persistent TPU compile cache (never for the CPU init)
    tx = make_optimizer(TrainCfg())
    opt_state = tx.init(params)
    amp = os.environ.get("TRAIN_BENCH_AMP") == "1"  # reference SOLVER.AMP analog
    step = make_train_step(cfg, crit, tx, amp=amp)

    rng = np.random.default_rng(0)
    masks = np.zeros((B, N, T, Hp, Wp), np.float32)
    masks[:, :4, :, 64:256, 64:320] = 1.0
    batch = {
        "images": jnp.asarray(rng.standard_normal((B * T, Hp, Wp, 3)),
                              jnp.float32),
        "image_sizes": jnp.asarray(np.tile([[Hp, Wp]], (B * T, 1)), jnp.int32),
        "labels": jnp.zeros((B, N), jnp.int32),
        "ids": jnp.asarray(np.where(np.arange(N)[None, :, None] < 4,
                                    np.arange(N)[None, :, None], -1)
                           * np.ones((B, 1, T), np.int64), jnp.int32),
        "boxes": jnp.asarray(np.tile([[0.1, 0.12, 0.4, 0.5]], (B, N, T, 1)),
                             jnp.float32),
        "masks": jnp.asarray(masks),
        "valid": jnp.asarray(np.arange(N)[None] < 4).repeat(B, 0),
    }

    key = jax.random.PRNGKey(1)
    params, opt_state, total, _ = step(params, opt_state, batch, key)
    np.asarray(total)  # compile + first step
    # second warm-up with the FED-BACK state: host-uploaded params can have
    # different layouts than the step's outputs, so the first feedback
    # iteration triggers one more compile — it must not land in the timed loop
    params, opt_state, total, _ = step(params, opt_state, batch,
                                       jax.random.fold_in(key, 10**6))
    np.asarray(total)

    K = int(os.environ.get("TRAIN_BENCH_ITERS", 6))
    t0 = time.perf_counter()
    for i in range(K):
        params, opt_state, total, _ = step(params, opt_state, batch,
                                           jax.random.fold_in(key, i))
    np.asarray(total)
    dt = (time.perf_counter() - t0) / K

    # MFU: XLA's own flop count for the COMPILED step / time / chip peak
    # (v5e: 197 TFLOP/s bf16). The step runs largely f32, so this is the
    # honest lower bound against the marketing peak.
    flops = 0.0
    try:
        ca = step.lower(params, opt_state, batch, key).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    peak = 197e12
    print(json.dumps({
        "metric": f"train_step_sec_per_iter_{backbone}_f{T}_{Hp}x{Wp}"
                  + ("_amp" if amp else ""),
        "batch_per_chip": B, "value": round(dt, 3), "unit": "s/iter",
        "clips_per_sec_train": round(B / dt, 2),
        "tflops_per_step": round(flops / 1e12, 2),
        "achieved_tflops_per_s": round(flops / dt / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(flops / dt / peak, 4),
    }))


if __name__ == "__main__":
    main()
