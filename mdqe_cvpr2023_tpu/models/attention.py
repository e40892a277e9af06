"""MSDeformAttn module: projections + sampling-offset/attention-weight heads around
the fused deform-attn core op.

Behavioral spec: /root/reference/mdqe/models/ops/modules/ms_deform_attn.py:34-237.
Two modes:
  - 'spatial':  pyramid levels act as attention levels (encoder self-attn and
                box-level decoder cross-attn)
  - 'temporal': clip frames act as attention levels; one core-op call per pyramid
                level with T frames stacked as levels, averaged over pyramid levels
                (instance-level decoder cross-attn)
Two offset schemes:
  - pred_offsets=True:  learned offsets, rotational-grid bias init
  - pred_offsets=False: fixed rotational grid buffer scaled by reference box w/h,
                        plus a learned correction clamped to +-scale*wh
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.deform_attn import ms_deform_attn
from ..utils import nn as fnn

SCALE = 8.0


@dataclass(frozen=True)
class MSDeformAttnCfg:
    d_model: int = 256
    n_levels: int = 4      # pyramid levels
    n_heads: int = 8
    n_points: int = 4
    n_frames: int = 1
    pred_offsets: bool = True
    mode: str = "spatial"  # 'spatial' | 'temporal'

    @property
    def lvl(self) -> int:
        """Number of attention 'levels' (pyramid levels or frames)."""
        return self.n_levels if self.mode == "spatial" else self.n_frames


def _rot_grid_init(cfg: MSDeformAttnCfg) -> np.ndarray:
    """Rotational grid: head h points at angle 2*pi*h/H, ring radius grows with point
    index; normalized by max-abs then scaled (reference _reset_parameters)."""
    thetas = np.arange(cfg.n_heads, dtype=np.float32) * (2.0 * math.pi / cfg.n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, cfg.lvl, cfg.n_points, 1)).copy()
    for k in range(cfg.n_points):
        grid[:, :, k, :] *= k + 1
    return grid / cfg.n_points * SCALE  # (H, lvl, P, 2)


def lvl_spatial_scales(cfg: MSDeformAttnCfg) -> np.ndarray:
    if cfg.mode == "spatial":
        return np.arange(1, cfg.lvl + 1, dtype=np.float32)
    return np.full((cfg.lvl,), 2.0, dtype=np.float32)


def ms_deform_attn_module_init(key, cfg: MSDeformAttnCfg, dtype=jnp.float32):
    d = cfg.d_model
    k1, k2 = jax.random.split(key)
    p = {
        "value_proj": {"weight": fnn.xavier_uniform(k1, (d, d), dtype),
                       "bias": jnp.zeros((d,), dtype)},
        "output_proj": {"weight": fnn.xavier_uniform(k2, (d, d), dtype),
                        "bias": jnp.zeros((d,), dtype)},
        "attention_weights": {"weight": jnp.zeros((cfg.n_heads * cfg.lvl * cfg.n_points, d), dtype),
                              "bias": jnp.zeros((cfg.n_heads * cfg.lvl * cfg.n_points,), dtype)},
        "lvl_spatial_scales": jnp.asarray(lvl_spatial_scales(cfg), dtype),
    }
    grid = _rot_grid_init(cfg)
    n_out = cfg.n_heads * cfg.lvl * cfg.n_points * 2
    if cfg.pred_offsets:
        bias = grid * 0.05 * lvl_spatial_scales(cfg).reshape(1, -1, 1, 1)
        p["sampling_offsets"] = {"weight": jnp.zeros((n_out, d), dtype),
                                 "bias": jnp.asarray(bias.reshape(-1), dtype)}
    else:
        p["sampling_offsets"] = jnp.asarray(grid[None, None], dtype)  # buffer (1,1,H,L,P,2)
        p["sampling_grid_offsets"] = {"weight": jnp.zeros((n_out, d), dtype),
                                      "bias": jnp.zeros((n_out,), dtype)}
    return p


def _sampling_locations(p, cfg: MSDeformAttnCfg, query, reference_points):
    """query (B,Q,C); reference_points (B,Q,4) cxcywh -> locations (B,Q,H,lvl,P,2) fp32."""
    B, Q, _ = query.shape
    ref = reference_points.astype(jnp.float32)[:, :, None, None, None, :]  # (B,Q,1,1,1,4)
    if cfg.pred_offsets:
        off = fnn.linear(p["sampling_offsets"], query).astype(jnp.float32)
        off = off.reshape(B, Q, cfg.n_heads, cfg.lvl, cfg.n_points, 2)
    else:
        # the fixed rotational grid is a BUFFER in the reference (registered via
        # register_buffer, ms_deform_attn.py:95-96): autograd never flows into
        # it and the optimizer never updates/decays it — stop_gradient here
        # plus the optimizer's frozen-leaf mask (parallel/train.py) mirror that
        grid = jax.lax.stop_gradient(p["sampling_offsets"].astype(jnp.float32))
        off = grid * 0.5 * ref[..., 2:]
        corr = fnn.linear(p["sampling_grid_offsets"], query).astype(jnp.float32)
        corr = corr.reshape(B, Q, cfg.n_heads, cfg.lvl, cfg.n_points, 2)
        lim = ref[..., 2:] * SCALE
        corr = jnp.clip(corr, -lim, lim)
        off = off + corr
    return ref[..., :2] + off / SCALE


def _attention_weights(p, cfg: MSDeformAttnCfg, query):
    B, Q, _ = query.shape
    w = fnn.linear(p["attention_weights"], query).astype(jnp.float32)
    w = w.reshape(B, Q, cfg.n_heads, cfg.lvl * cfg.n_points)
    w = jax.nn.softmax(w, axis=-1)
    return w.reshape(B, Q, cfg.n_heads, cfg.lvl, cfg.n_points)


def ms_deform_attn_module(p, cfg: MSDeformAttnCfg, query, reference_points, input_flatten,
                          spatial_shapes: Sequence[Tuple[int, int]], padding_mask=None,
                          n_frames_runtime: int | None = None,
                          allow_banded: bool = True):
    """Apply the module.

    spatial mode:  query (B,Q,C), reference_points (B,Q,4) cxcywh,
                   input_flatten (B,N,C), padding_mask (B,N) True on padded.
    temporal mode: query (B,Q,C), reference_points (B,Q,4) clip boxes,
                   input_flatten (B,T,N,C), padding_mask (B,T,N);
                   T must equal n_frames_runtime (defaults to cfg.n_frames).
    """
    H = cfg.n_heads
    D = cfg.d_model // H

    value = fnn.linear(p["value_proj"], input_flatten)
    if padding_mask is not None:
        value = jnp.where(padding_mask[..., None], 0.0, value)

    loc = _sampling_locations(p, cfg, query, reference_points)   # (B,Q,H,lvl,P,2)
    attw = _attention_weights(p, cfg, query)                     # (B,Q,H,lvl,P)

    if cfg.mode == "spatial":
        B, N, _ = value.shape
        v = value.reshape(B, N, H, D)
        out = ms_deform_attn(v, spatial_shapes, loc, attw,
                             allow_banded=allow_banded)
        # named so remat policies can SAVE the kernel output: re-running the
        # fused forward kernel during the backward costs ~34 ms per encoder
        # layer at train geometry, ~0.2 s/step for 70 MB/layer of savings
        out = checkpoint_name(out, "msda_out")
    else:
        # frames act as levels; one core-op call per pyramid level, averaged
        B, T, N, _ = value.shape
        assert loc.shape[3] == T, (loc.shape, T)
        outs = []
        start = 0
        for (h_l, w_l) in spatial_shapes:
            hw = int(h_l) * int(w_l)
            v_l = value[:, :, start:start + hw]                   # (B,T,hw,C)
            start += hw
            v_l = v_l.reshape(B, T * hw, H, D)
            outs.append(ms_deform_attn(v_l, [(h_l, w_l)] * T, loc, attw))
        out = jnp.mean(jnp.stack(outs), axis=0)

    return fnn.linear(p["output_proj"], out.astype(query.dtype))
