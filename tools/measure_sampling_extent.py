"""Measure the empirical per-q-tile sampling extent of encoder deformable
attention (VERDICT r4 next-round #2, step 1).

The hat-matmul kernel contracts the FULL folded spatial axis per query-point
(~O(10^3) FLOP inflation over the 4-tap bilinear sample). A banded kernel only
pays for a (BY x BX) patch per (batch, head, q-tile) grid cell — IF the cell's
samples are spatially local. This tool measures that locality on the flagship
geometry (R50 f4 360p, the driver metric), for:

  - query ordering: raster (current) vs 16x16 spatial blocks per level
  - q_tile 256
  - at random init AND after --train-steps optimizer steps (offsets move)

For every (layer, level, query-source-level) it reports the p50/p95/max of the
per-cell y/x extents (in that level's pixels, coords clamped to the hat support
[-1, size] so never-contributing samples don't inflate the band) and the
fraction of cells whose extent fits candidate bands. This decides BY/BX and the
expected band-hit rate before any kernel work.

Run on TPU: python tools/measure_sampling_extent.py [--train-steps 30]
"""
import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_block_perm(spatial_shapes, by=16, bx=16):
    """Query permutation: per level, raster order of (by x bx) spatial blocks,
    raster within each block. Returns perm with new_q = perm[old... such that
    reordered[i] = flat[perm[i]]."""
    perm = []
    base = 0
    for (h, w) in spatial_shapes:
        idx = np.arange(h * w).reshape(h, w)
        for y0 in range(0, h, by):
            for x0 in range(0, w, bx):
                blk = idx[y0:y0 + by, x0:x0 + bx].ravel()
                perm.append(base + blk)
        base += h * w
    return np.concatenate(perm)


def per_cell_extents(loc, spatial_shapes, perm, q_tile, level_of_q):
    """loc (B, Q, H, L, P, 2) normalized; returns list of records
    (qlevel, level, ext_y, ext_x) per (b, h, tile, level)."""
    B, Q, H, L, P, _ = loc.shape
    loc = loc[:, perm] if perm is not None else loc
    lvl_q = level_of_q[perm] if perm is not None else level_of_q
    n_tiles = -(-Q // q_tile)
    recs = {l: {} for l in range(L)}
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        gy = loc[:, :, :, l, :, 1] * h_l - 0.5   # (B, Q, H, P)
        gx = loc[:, :, :, l, :, 0] * w_l - 0.5
        gy = np.clip(gy, -1.0, float(h_l))
        gx = np.clip(gx, -1.0, float(w_l))
        for t in range(n_tiles):
            sl = slice(t * q_tile, (t + 1) * q_tile)
            # query-source level of this tile (majority; tiles straddling
            # levels get the mixed marker -1)
            src = np.unique(lvl_q[sl])
            src_l = int(src[0]) if len(src) == 1 else -1
            ty = gy[:, sl]  # (B, Qt, H, P)
            tx = gx[:, sl]
            # per (b, h): extent = rows/cols touched = floor(max)+1 - floor(min) + 1
            ey = (np.floor(ty.max(axis=(1, 3))) - np.floor(ty.min(axis=(1, 3)))
                  + 2)  # (B, H)
            ex = (np.floor(tx.max(axis=(1, 3))) - np.floor(tx.min(axis=(1, 3)))
                  + 2)
            recs[l].setdefault(src_l, []).append(
                np.stack([ey.ravel(), ex.ravel()], -1))
    return recs


def summarize(recs, spatial_shapes, bands=(16, 24, 32, 48)):
    out = []
    for l, by_src in recs.items():
        h_l, w_l = spatial_shapes[l]
        for src_l, chunks in sorted(by_src.items()):
            e = np.concatenate(chunks)  # (n_cells, 2)
            row = {
                "sample_level": l, "hw": [int(h_l), int(w_l)],
                "query_level": src_l, "cells": int(len(e)),
                "ext_y_p50": float(np.percentile(e[:, 0], 50)),
                "ext_y_p95": float(np.percentile(e[:, 0], 95)),
                "ext_y_max": float(e[:, 0].max()),
                "ext_x_p50": float(np.percentile(e[:, 1], 50)),
                "ext_x_p95": float(np.percentile(e[:, 1], 95)),
                "ext_x_max": float(e[:, 1].max()),
            }
            for b in bands:
                # +8/+4: y band start is 8-aligned, x start 4-aligned, so the
                # effective extent budget shrinks by up to that much
                fit = ((e[:, 0] <= b - 7) & (e[:, 1] <= b - 3)).mean()
                row[f"fit_band{b}"] = round(float(fit), 3)
            out.append(row)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=0)
    ap.add_argument("--q-tile", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (sampling locations are platform-"
                         "independent; avoids touching the TPU tunnel). The "
                         "image's sitecustomize pins JAX_PLATFORMS=axon, so "
                         "the env var alone does NOT work — this flag uses "
                         "jax.config before any computation.")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import _load_or_init_params
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
    from mdqe_cvpr2023_tpu.models.attention import _sampling_locations
    from mdqe_cvpr2023_tpu.models.detr import detr_backbone_features
    from mdqe_cvpr2023_tpu.models.encoder import _encoder_layer, flatten_levels
    from mdqe_cvpr2023_tpu.utils.misc import make_reference_points

    cfg = MDQEModelCfg(backbone="resnet50", num_classes=25, hidden_dim=256,
                       n_heads=8, enc_layers=6, dec_layers=6, n_frames=4,
                       n_query=196, query_embed_dim=64, dec_temporal=True)
    params = _load_or_init_params(jax, cfg, detr_init)
    params = jax.device_put(params, jax.devices()[0])

    H, W = 360, 640
    Hp, Wp = -(-H // 32) * 32, -(-W // 32) * 32
    rng = np.random.default_rng(0)
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)
    imgs = rng.integers(0, 255, (args.frames, Hp, Wp, 3)).astype(np.uint8)
    sizes = np.tile([[H, W]], (args.frames, 1)).astype(np.int32)

    @jax.jit
    def capture_locs(params, images_u8, image_sizes):
        """Per-encoder-layer sampling locations (n_layers, B, Q, H, L, P, 2)."""
        images = (images_u8.astype(jnp.float32) - mean) / std
        srcs, masks, pos = detr_backbone_features(params, cfg, images,
                                                  image_sizes)
        ecfg = cfg.encoder_cfg
        src, mask, lvl_pos, shapes = flatten_levels(
            srcs, masks, pos, params["transformer_enc"]["level_embed"])
        B = src.shape[0]
        ref_pts = jnp.concatenate([make_reference_points(s) for s in shapes])
        ref_boxes = jnp.concatenate(
            [ref_pts, jnp.full_like(ref_pts, 0.1)], axis=-1)
        ref_boxes = jnp.broadcast_to(ref_boxes[None], (B,) + ref_boxes.shape)
        x = src
        locs = []
        for lp in params["transformer_enc"]["encoder"]["layers"]:
            locs.append(_sampling_locations(lp["self_attn"], ecfg.attn_cfg,
                                            x + lvl_pos, ref_boxes))
            x = _encoder_layer(lp, ecfg, x, lvl_pos, ref_boxes, shapes, mask)
        return jnp.stack(locs)

    def shapes_static():
        s = []
        for st in (8, 16, 32, 64):
            s.append((-(-Hp // st), -(-Wp // st)))
        return s

    spatial_shapes = shapes_static()
    level_of_q = np.concatenate([np.full(h * w, l, np.int32)
                                 for l, (h, w) in enumerate(spatial_shapes)])

    def measure(params, tag):
        t0 = time.perf_counter()
        locs = np.asarray(capture_locs(params, jnp.asarray(imgs),
                                       jnp.asarray(sizes)))
        print(f"# captured {locs.shape} in {time.perf_counter()-t0:.1f}s",
              flush=True)
        nL = locs.shape[0]
        loc_all = locs.reshape((-1,) + locs.shape[2:])  # fold layers into batch
        for name, perm in [("raster", None),
                           ("block16", build_block_perm(spatial_shapes))]:
            recs = per_cell_extents(loc_all, spatial_shapes, perm, args.q_tile,
                                    level_of_q)
            for row in summarize(recs, spatial_shapes):
                row.update({"tag": tag, "ordering": name, "layers": nL})
                print(json.dumps(row), flush=True)

    measure(params, "init")

    if args.train_steps > 0:
        import optax  # noqa: F401
        from mdqe_cvpr2023_tpu.losses import CriterionCfg
        from mdqe_cvpr2023_tpu.parallel import (TrainCfg, make_optimizer,
                                                make_train_step)
        crit = CriterionCfg(num_classes=cfg.num_classes, n_frames=cfg.n_frames,
                            n_query=cfg.n_query)
        tx = make_optimizer(TrainCfg(warmup_iters=5))
        opt_state = jax.device_put(tx.init(params), jax.devices()[0])
        step = make_train_step(cfg, crit, tx, amp=True)
        T, B, N = cfg.n_frames, 1, 10
        masks = np.zeros((B, N, T, Hp, Wp), np.float32)
        for i in range(N):
            y, x = 20 + 17 * i, 30 + 23 * i
            masks[:, i, :, y:y + 60, x:x + 80] = 1.0
        batch = {
            "images": jnp.asarray(rng.integers(0, 255, (B * T, Hp, Wp, 3)),
                                  jnp.uint8),
            "image_sizes": jnp.asarray(np.tile([[H, W]], (B * T, 1)),
                                       jnp.int32),
            "labels": jnp.asarray(rng.integers(0, 25, (B, N)), jnp.int32),
            "ids": jnp.asarray(np.tile(np.arange(N)[None, :, None], (B, 1, T)),
                               jnp.int32),
            "boxes": jnp.asarray(
                np.tile([[0.3, 0.3, 0.2, 0.25]], (B, N, T, 1)), jnp.float32),
            "masks": jnp.asarray(masks),
            "valid": jnp.ones((B, N), bool),
        }
        t0 = time.perf_counter()
        prng = jax.random.PRNGKey(0)
        for i in range(args.train_steps):
            params, opt_state, total, _ = step(params, opt_state, batch,
                                               jax.random.fold_in(prng, i))
        total = float(np.asarray(jax.block_until_ready(total)))
        print(f"# {args.train_steps} train steps in "
              f"{time.perf_counter()-t0:.1f}s, loss {total:.3f}", flush=True)
        measure(params, f"after_{args.train_steps}_steps")


if __name__ == "__main__":
    main()
