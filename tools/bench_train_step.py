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
    T = 4
    Hp, Wp = 512, 800   # largest train bucket (MIN_SIZE_TRAIN max=512, MAX=800)
    N = 20              # instance slab (MAX_NUM_INSTANCES // 6)

    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=T,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    crit = CriterionCfg(num_classes=25, n_frames=T, n_query=196)
    params = detr_init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainCfg())
    opt_state = tx.init(params)
    step = make_train_step(cfg, crit, tx)

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

    K = int(os.environ.get("TRAIN_BENCH_ITERS", 6))
    t0 = time.perf_counter()
    for i in range(K):
        params, opt_state, total, _ = step(params, opt_state, batch,
                                           jax.random.fold_in(key, i))
    np.asarray(total)
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({
        "metric": "train_step_sec_per_iter_r50_f4_512x800",
        "batch_per_chip": B, "value": round(dt, 3), "unit": "s/iter",
        "clips_per_sec_train": round(B / dt, 2),
    }))


if __name__ == "__main__":
    main()
