"""Deformable transformer encoder.

Behavioral spec: /root/reference/mdqe/models/transformer_enc.py:11-141 — flatten 4
pyramid levels + learned level_embed, per-pixel center reference points (w/h fixed at
0.1), n_layers x (spatial MSDeformAttn(pred_offsets=True) + FFN), final LayerNorm.
The whole encoder runs with frames folded into the batch dim (BT), fp32 islands inside
the deform-attn core only; everything else may run bf16.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils import nn as fnn
from ..utils.misc import make_reference_points
from .attention import MSDeformAttnCfg, ms_deform_attn_module, ms_deform_attn_module_init


@dataclass(frozen=True)
class EncoderCfg:
    dim: int = 256
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    n_layers: int = 6
    mlp_ratio: float = 4.0

    @property
    def attn_cfg(self) -> MSDeformAttnCfg:
        return MSDeformAttnCfg(self.dim, self.n_levels, self.n_heads, self.n_points,
                               n_frames=1, pred_offsets=True, mode="spatial")


def encoder_init(key, cfg: EncoderCfg, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.n_layers + 2)
    d_ffn = int(cfg.dim * cfg.mlp_ratio)
    layers = []
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[i], 3)
        layers.append({
            "self_attn": ms_deform_attn_module_init(k[0], cfg.attn_cfg, dtype),
            "norm1": fnn.norm_init(cfg.dim, dtype),
            "linear1": fnn.linear_init(k[1], cfg.dim, d_ffn, dtype),
            "linear2": fnn.linear_init(k[2], d_ffn, cfg.dim, dtype),
            "norm2": fnn.norm_init(cfg.dim, dtype),
        })
    return {
        "level_embed": jax.random.normal(keys[-1], (cfg.n_levels, cfg.dim), dtype),
        "encoder": {"layers": layers, "norm": fnn.norm_init(cfg.dim, dtype)},
    }


def flatten_levels(srcs: List[jax.Array], masks, pos, level_embed=None):
    """srcs/pos: lists of (B,H,W,C); masks: list of (B,H,W) bool (True=padded).
    Returns flattened (B,N,C) src, (B,N) mask, (B,N,C) pos(+level), static shapes."""
    spatial_shapes = tuple((int(s.shape[1]), int(s.shape[2])) for s in srcs)
    src_flat = jnp.concatenate([s.reshape(s.shape[0], -1, s.shape[-1]) for s in srcs], axis=1)
    mask_flat = None
    if masks is not None:
        mask_flat = jnp.concatenate([m.reshape(m.shape[0], -1) for m in masks], axis=1)
    pos_flat = None
    if pos is not None:
        parts = []
        for lvl, p in enumerate(pos):
            pf = p.reshape(p.shape[0], -1, p.shape[-1])
            if level_embed is not None:
                pf = pf + level_embed[lvl][None, None]
            parts.append(pf)
        pos_flat = jnp.concatenate(parts, axis=1)
    return src_flat, mask_flat, pos_flat, spatial_shapes


def _encoder_layer(p, cfg: EncoderCfg, x, x_pos, ref_boxes, spatial_shapes,
                   padding_mask, drop_rate=0.0, rng=None, allow_banded=True):
    x2 = ms_deform_attn_module(p["self_attn"], cfg.attn_cfg, x + x_pos, ref_boxes,
                               x, spatial_shapes, padding_mask,
                               allow_banded=allow_banded)
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    x = fnn.layer_norm(p["norm1"], x + fnn.dropout(x2, drop_rate, rngs[0]))
    h = fnn.dropout(jax.nn.gelu(fnn.linear(p["linear1"], x), approximate=False),
                    drop_rate, rngs[1])
    x2 = fnn.linear(p["linear2"], h)
    x = fnn.layer_norm(p["norm2"], x + fnn.dropout(x2, drop_rate, rngs[2]))
    return x


def encoder_apply(params, cfg: EncoderCfg, srcs, masks, pos, drop_rate=0.0,
                  rng=None):
    """srcs/masks/pos: per-level lists (BT leading dim). Returns (BT,N,C) encoded.
    drop_rate/rng: training-time dropout (reference EncoderLayer dropout1-3)."""
    src, mask, lvl_pos, spatial_shapes = flatten_levels(srcs, masks, pos,
                                                        params["level_embed"])
    B = src.shape[0]
    ref_pts = jnp.concatenate([make_reference_points(s) for s in spatial_shapes])  # (N,2)
    ref_boxes = jnp.concatenate([ref_pts, jnp.full_like(ref_pts, 0.1)], axis=-1)   # (N,4)
    ref_boxes = jnp.broadcast_to(ref_boxes[None], (B,) + ref_boxes.shape)

    # scan over the identical layers: one compiled layer body instead of n_layers
    # unrolled copies (cuts XLA compile time ~n_layers-fold on this, the deepest
    # part of the window-encode graph)
    layers = params["encoder"]["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    if rng is not None:
        keys = jnp.stack([jax.random.fold_in(rng, i) for i in range(len(layers))])

        def body(x, xs):
            lp, lrng = xs
            # training (remat) path: keep the legacy full-contraction kernels —
            # the banded pack/permute glue recomputed under the remat policy
            # costs more than the banded kernels save (interleaved step A/B:
            # 1.474-1.482 banded vs 1.358-1.359 legacy s/iter at 512x800; the
            # standalone kernels are a wash there, tools/bench_banded_ab.py)
            x = _encoder_layer(lp, cfg, x, lvl_pos, ref_boxes, spatial_shapes,
                               mask, drop_rate, lrng, allow_banded=False)
            return x, None

        # remat each layer for backward, but SAVE the deform-attn kernel output
        # (~70 MB/layer): storing every layer's full residual set (value/
        # locations/weights, ~200 MB per layer) causes HBM spilling, while
        # recomputing the fused kernel forward costs ~34 ms per layer — the
        # policy keeps the cheap-to-recompute parts remat'd and skips only the
        # expensive kernel re-run (measured 1.43 -> 1.2 s/step)
        save_msda = jax.checkpoint_policies.save_only_these_names("msda_out")
        x, _ = jax.lax.scan(jax.checkpoint(body, policy=save_msda), src,
                            (stacked, keys))
    else:
        def body(x, lp):
            x = _encoder_layer(lp, cfg, x, lvl_pos, ref_boxes, spatial_shapes,
                               mask, 0.0, None)
            return x, None

        x, _ = jax.lax.scan(body, src, stacked)
    return fnn.layer_norm(params["encoder"]["norm"], x)
