#!/usr/bin/env python
"""Split the train-geometry encode forward (the step's biggest stage) into
backbone vs input-proj/pos vs encoder, each timed fp32 vs bf16, plus per-stage
XLA flop counts — to locate the gap between the measured ~2.6 TF/s and the
chip's matmul rate. Timing per the repo's axon rules (vary args, one sync)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.models.detr import detr_backbone_features, detr_encode
    from mdqe_cvpr2023_tpu.models.encoder import encoder_apply, flatten_levels
    from mdqe_cvpr2023_tpu.models.resnet import resnet_apply
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache
    from bench import _load_or_init_params

    BT, Hp, Wp = 8, 512, 800
    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=4,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    params = _load_or_init_params(jax, cfg, detr_init)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    enable_cache()

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((BT, Hp, Wp, 3)), jnp.float32)
    sizes = jnp.asarray(np.tile([[Hp, Wp]], (BT, 1)), jnp.int32)

    def cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)

    @jax.jit
    def backbone_only(p, x, eps):
        return resnet_apply(p["backbone"], x + eps)

    @jax.jit
    def feats_only(p, x, s, eps):
        return detr_backbone_features(p, cfg, x + eps, s)[0]

    @jax.jit
    def encode_full(p, x, s, eps):
        return detr_encode(p, cfg, x + eps, s)[0]

    @jax.jit
    def encoder_only(p, srcs, masks, pos, eps):
        srcs = [srcs[0] + eps] + list(srcs[1:])
        return encoder_apply(p["transformer_enc"], cfg.encoder_cfg, srcs, masks,
                             pos)

    def timed(fn, args_fn, K=6):
        out = fn(*args_fn(1000)); np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        out = fn(*args_fn(1001)); np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for i in range(K):
            out = fn(*args_fn(i))
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / K

    def flops(fn, *args):
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    res = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        p = cast(params, dt) if name == "bf16" else params
        x = images.astype(dt)
        res[f"backbone_{name}"] = timed(
            backbone_only, lambda i: (p, x, jnp.asarray(i, dt)))
        res[f"backbone_{name}_tf"] = flops(backbone_only, p, x,
                                           jnp.asarray(0, dt)) / 1e12
        res[f"feats_{name}"] = timed(
            feats_only, lambda i: (p, x, sizes, jnp.asarray(i, dt)))
        res[f"encode_full_{name}"] = timed(
            encode_full, lambda i: (p, x, sizes, jnp.asarray(i, dt)))
        res[f"encode_full_{name}_tf"] = flops(encode_full, p, x, sizes,
                                              jnp.asarray(0, dt)) / 1e12
        # encoder alone on precomputed features
        srcs, masks, pos = jax.jit(
            lambda p_, x_, s_: detr_backbone_features(p_, cfg, x_, s_))(p, x, sizes)
        srcs = jax.tree.map(lambda a: a.astype(dt), srcs)
        pos = jax.tree.map(lambda a: a.astype(dt), pos)
        res[f"encoder_{name}"] = timed(
            encoder_only, lambda i: (p, srcs, masks, pos, jnp.asarray(i, dt)))
        res[f"encoder_{name}_tf"] = flops(encoder_only, p, srcs, masks, pos,
                                          jnp.asarray(0, dt)) / 1e12
    print(json.dumps({k: round(v, 4) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
