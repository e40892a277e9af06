#!/usr/bin/env python
"""Where does the train step's time go? Times stage jits at the bench geometry:
forward-only loss, value_and_grad (fwd+bwd), and the full optimizer step, plus a
forward split into encode / decode / criterion. Differences give the backward and
optimizer shares. Used to direct MFU work (VERDICT r2 weak #2).

Timing per the repo's axon rules: warm every jit twice (layout-feedback compile),
vary the rng each call so the axon result cache can't serve a memo, one np.asarray
sync after K calls.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_fn, K=6):
    out = fn(*args_fn(1000))
    jax_sync(out)
    out = fn(*args_fn(1001))
    jax_sync(out)
    t0 = time.perf_counter()
    for i in range(K):
        out = fn(*args_fn(i))
    jax_sync(out)
    return (time.perf_counter() - t0) / K


def jax_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jax.tree_util.tree_map(
        lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, leaf)))


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.losses import CriterionCfg
    from mdqe_cvpr2023_tpu.losses.criterion import criterion_apply
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.models.detr import detr_encode, detr_apply_backbone
    from mdqe_cvpr2023_tpu.models.decoder import query_relpos_grid
    from mdqe_cvpr2023_tpu.parallel.train import (TrainCfg, make_optimizer,
                                                  make_train_step,
                                                  prepare_targets_device)
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache
    from bench import _load_or_init_params

    amp = os.environ.get("TRAIN_BENCH_AMP") == "1"
    B, T, Hp, Wp, N = 2, 4, 512, 800, 20
    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=T,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    crit = CriterionCfg(num_classes=25, n_frames=T, n_query=196)
    params = _load_or_init_params(jax, cfg, detr_init)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    enable_cache()

    rng = np.random.default_rng(0)
    masks = np.zeros((B, N, T, Hp, Wp), np.float32)
    masks[:, :4, :, 64:256, 64:320] = 1.0
    batch = {
        "images": jnp.asarray(rng.standard_normal((B * T, Hp, Wp, 3)), jnp.float32),
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
    relpos = jnp.asarray(query_relpos_grid(14))
    key = jax.random.PRNGKey(0)

    # ---- forward pieces ----
    @jax.jit
    def fwd_encode(params, images, sizes, rng):
        if amp:
            import jax.numpy as _jnp
            images = images.astype(_jnp.bfloat16)
            params = jax.tree.map(
                lambda x: x.astype(_jnp.bfloat16) if x.dtype == _jnp.float32 else x,
                params)
        return detr_encode(params, cfg, images, sizes, 0.1, rng)[0]

    @jax.jit
    def fwd_full(params, batch, rng):
        out = detr_apply_backbone(params, cfg, batch["images"],
                                  batch["image_sizes"], n_frames=T,
                                  training=True, drop_rate=0.1, rng=rng, amp=amp)
        return out

    @jax.jit
    def fwd_loss(params, batch, rng):
        out = detr_apply_backbone(params, cfg, batch["images"],
                                  batch["image_sizes"], n_frames=T,
                                  training=True, drop_rate=0.1, rng=rng, amp=amp)
        match_masks, masks8 = prepare_targets_device(
            batch["masks"], batch["images"].shape[1:3], 4)
        targets = {"labels": batch["labels"], "ids": batch["ids"],
                   "boxes": batch["boxes"], "valid": batch["valid"],
                   "match_masks": match_masks, "masks8": masks8}
        total, _ = criterion_apply(crit, out, targets, relpos, rng)
        return total

    grad_fn = jax.jit(jax.grad(fwd_loss))

    tx = make_optimizer(TrainCfg())
    opt_state = tx.init(params)
    step = make_train_step(cfg, crit, tx, amp=amp)

    res = {}
    res["fwd_encode"] = timed(
        fwd_encode, lambda i: (params, batch["images"], batch["image_sizes"],
                               jax.random.fold_in(key, i)))
    res["fwd_model"] = timed(
        fwd_full, lambda i: (params, batch, jax.random.fold_in(key, i)))
    res["fwd_loss"] = timed(
        fwd_loss, lambda i: (params, batch, jax.random.fold_in(key, i)))
    res["fwd_bwd"] = timed(
        grad_fn, lambda i: (params, batch, jax.random.fold_in(key, i)))

    # full step (donated): feed state through, like the real loop
    p, o = params, opt_state
    p, o, total, _ = step(p, o, batch, key)
    np.asarray(total)
    p, o, total, _ = step(p, o, batch, jax.random.fold_in(key, 10**6))
    np.asarray(total)
    K = 6
    t0 = time.perf_counter()
    for i in range(K):
        p, o, total, _ = step(p, o, batch, jax.random.fold_in(key, i))
    np.asarray(total)
    res["full_step"] = (time.perf_counter() - t0) / K

    res["derived_decode_fwd"] = res["fwd_model"] - res["fwd_encode"]
    res["derived_criterion_fwd"] = res["fwd_loss"] - res["fwd_model"]
    res["derived_backward"] = res["fwd_bwd"] - res["fwd_loss"]
    res["derived_optimizer"] = res["full_step"] - res["fwd_bwd"]
    print(json.dumps({k: round(v, 4) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
