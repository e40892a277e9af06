#!/usr/bin/env python
"""Split the batched clip-decode launch into decoder-only vs postprocess-only
device time (same readback-forced timing discipline as bench_inference_stages)."""
import functools
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
    from mdqe_cvpr2023_tpu.models.decoder import decoder_apply
    from mdqe_cvpr2023_tpu.models.meta import (InferenceCfg, encode_window,
                                               spatial_shapes_for,
                                               postprocess_clip,
                                               _decode_clips_batched)
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache

    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=4,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    inf = InferenceCfg()
    enable_cache()
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(detr_init, static_argnums=(1,))(
            jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params, dev)

    H, W = 360, 640
    Hp, Wp = -(-H // 32) * 32, -(-W // 32) * 32
    T, CH = inf.n_frames_test, inf.encode_chunk
    rng = np.random.default_rng(0)
    shapes = spatial_shapes_for(cfg, (Hp, Wp))
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)

    tiny = jax.device_put(np.float32(1.0), dev)
    _ = float(tiny + 1)
    rtt = min(_timed1(lambda: float(tiny + 1)) for _ in range(8))

    def bench(dispatch, probe, n=6):
        out = dispatch()
        probe(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            probe(dispatch())
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - rtt, 0.0)

    chunk_u8 = jax.device_put(
        rng.integers(0, 255, (CH, Hp, Wp, 3)).astype(np.uint8), dev)
    sizes = jax.device_put(
        np.broadcast_to(np.array([H, W], np.int32), (CH, 2)).copy(), dev)
    enc1 = encode_window(params, cfg, chunk_u8, sizes, mean, std, shapes)
    S_BATCH = 8
    # Same window geometry as bench_inference_stages.py so decode8_full_ms is
    # comparable, and enough frames that every dynamic_slice start is in range.
    n_rep = max(-(-inf.n_frames_window_test // CH),
                -(-(S_BATCH - 1 + T) // CH))
    assert n_rep * CH >= S_BATCH - 1 + T
    encoded, mask_flat, maskf = (
        jnp.concatenate([p] * n_rep, axis=0) for p in enc1)
    offs = jax.device_put(np.arange(S_BATCH, dtype=np.int32), dev)

    t_full = bench(
        lambda: _decode_clips_batched(params, cfg, encoded, mask_flat, maskf,
                                      offs, shapes, T, inf.apply_cls_thres,
                                      inf.clip_topk, inf.dedup_sim),
        lambda o: np.asarray(o["scores"][0, :4]))

    S = int(offs.shape[0])

    @functools.partial(jax.jit, static_argnums=(1,))
    def dec_only(params, cfg, encoded, mask_flat, offs):
        def gather(a):
            return jax.vmap(
                lambda o: jax.lax.dynamic_slice_in_dim(a, o, T, 0))(offs)
        enc = gather(encoded)
        mfl = gather(mask_flat)
        return decoder_apply(params["transformer_dec"], cfg.decoder_cfg,
                             enc.reshape(S * T, *enc.shape[2:]),
                             mfl.reshape(S * T, -1), shapes, T, training=False)

    t_dec = bench(
        lambda: dec_only(params, cfg, encoded, mask_flat, offs),
        lambda o: np.asarray(o["cls"][0, :4]))

    out = dec_only(params, cfg, encoded, mask_flat, offs)

    @jax.jit
    def post_only(out, maskf, offs):
        def gather(a):
            return jax.vmap(
                lambda o: jax.lax.dynamic_slice_in_dim(a, o, T, 0))(offs)
        mfe = gather(maskf)
        return jax.vmap(
            lambda c, m, q, f: postprocess_clip(
                c, m, q, f, inf.apply_cls_thres, inf.clip_topk, inf.dedup_sim)
        )(out["cls"], out["mask_coeff"], out["query_embed"], mfe)

    t_post = bench(
        lambda: post_only(out, maskf, offs),
        lambda o: np.asarray(o["scores"][0, :4]))

    print(json.dumps({
        "tunnel_rtt_ms": round(rtt * 1e3, 1),
        "decode8_full_ms": round(t_full * 1e3, 1),
        "decoder_only_ms": round(t_dec * 1e3, 1),
        "postprocess_only_ms": round(t_post * 1e3, 1),
    }, indent=1))


def _timed1(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
