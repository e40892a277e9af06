#!/usr/bin/env python
"""Device-time microbench of the jitted units of VIS inference: chunked window
encode (backbone+encoder+mask-head), the 8-clip batched decode+postprocess, the
per-clip tracker step, and the window average.

NOTE on timing through the axon tunnel: jax.block_until_ready returns
immediately (it does NOT wait for remote execution), so every measurement here
forces completion with a small host readback and subtracts the measured
tunnel round-trip (timed on a trivial op). Best-of-N against tunnel variance."""
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
    from mdqe_cvpr2023_tpu.models.meta import (InferenceCfg, encode_window,
                                               spatial_shapes_for,
                                               _decode_clips_batched,
                                               _tracker_step_jit)
    from mdqe_cvpr2023_tpu.tracking.device_tracker import (
        TrackerCfg, tracker_state_init, tracker_window_average)
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
    T, Wn, CH = inf.n_frames_test, inf.n_frames_window_test, inf.encode_chunk
    rng = np.random.default_rng(0)
    shapes = spatial_shapes_for(cfg, (Hp, Wp))
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)

    tiny = jax.device_put(np.float32(1.0), dev)
    _ = float(tiny + 1)
    rtt = min(_timed1(lambda: float(tiny + 1)) for _ in range(8))

    def bench(dispatch, probe, n=4):
        """dispatch() enqueues device work; probe(out) reads a SMALL output,
        forcing completion. Returns best-of-n seconds minus the tunnel RTT."""
        out = dispatch()
        probe(out)  # warm / compile
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

    t_enc = bench(
        lambda: encode_window(params, cfg, chunk_u8, sizes, mean, std, shapes),
        lambda o: np.asarray(o[1][0, :8]))
    n_chunks = -(-Wn // CH)

    enc1 = encode_window(params, cfg, chunk_u8, sizes, mean, std, shapes)
    encoded, mask_flat, maskf = (
        jnp.concatenate([p] * n_chunks, axis=0) for p in enc1)

    offs = jax.device_put(np.arange(8, dtype=np.int32), dev)
    t_dec = bench(
        lambda: _decode_clips_batched(params, cfg, encoded, mask_flat, maskf,
                                      offs, shapes, T, inf.apply_cls_thres,
                                      inf.clip_topk, inf.dedup_sim),
        lambda o: np.asarray(o["scores"][0, :4]))
    res = _decode_clips_batched(params, cfg, encoded, mask_flat, maskf, offs,
                                shapes, T, inf.apply_cls_thres, inf.clip_topk,
                                inf.dedup_sim)

    tr_cfg = TrackerCfg(num_max_inst=inf.max_num_instances, num_frames=T,
                        window_frames=Wn, clip_stride=inf.clip_stride,
                        num_classes=inf.num_classes, embed_dim=cfg.hidden_dim,
                        mask_hw=(2 * shapes[0][0], 2 * shapes[0][1]),
                        apply_cls_thres=inf.apply_cls_thres,
                        suppress_siou=inf.suppress_siou,
                        suppress_ctt=inf.suppress_ctt)
    step = _tracker_step_jit()
    n_clips = Wn - T + 1
    f0s = [jax.device_put(np.int32(i), dev) for i in range(n_clips)]
    ovs = [jax.device_put(
        np.array([False] * T if i == 0 else [True] * (T - 1) + [False], bool),
        dev) for i in range(n_clips)]

    def track_window():
        state = tracker_state_init(tr_cfg)
        state = jax.device_put(state, dev)
        for i in range(n_clips):
            state = step(state, tr_cfg, res, i % 8, f0s[i], ovs[i])
        return tracker_window_average(state, tr_cfg, False)

    t_trk = bench(track_window, lambda o: np.asarray(o[1]), n=3)

    n_dec_launch = -(-n_clips // 8)
    window_total = n_chunks * t_enc + n_dec_launch * t_dec + t_trk
    print(json.dumps({
        "tunnel_rtt_ms": round(rtt * 1e3, 1),
        "encode_chunk10_ms": round(t_enc * 1e3, 1),
        "encode_window_ms": round(n_chunks * t_enc * 1e3, 1),
        "decode8_ms": round(t_dec * 1e3, 1),
        "decode_window_ms": round(n_dec_launch * t_dec * 1e3, 1),
        "tracker_window_ms": round(t_trk * 1e3, 1),
        "tracker_per_clip_ms": round(t_trk / n_clips * 1e3, 2),
        "window_total_ms": round(window_total * 1e3, 1),
        "implied_clips_per_s": round(n_clips / window_total, 2),
    }, indent=1))


def _timed1(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
