"""Pallas TPU kernel for multi-scale deformable attention — gather-free.

TPU design ("hat-matmul"): bilinear sampling at (x, y) is a rank-1 interpolation
W_y (x) W_x with triangular hat weights  w(i) = relu(1 - |i - coord|)  that are exact
for bilinear with zero padding (out-of-range corners get weight 0). Per level:

    out[q,d] = sum_p a[q,p] * sum_y sum_x hat_y[q,p,y] hat_x[q,p,x] V[y,x,d]

Stage 1 contracts y on the MXU:  S = (hat_y * a) (P*Qt, h) @ V (h, D*w).
Stage 2 folds hat_x into S elementwise (tiled along D with pltpu.repeat, matching
V's channel-major (h, D*w) layout) and contracts x with a constant 0/1 comb matrix
(D*w, D) — again on the MXU. No gather, no scatter; everything stays in VMEM per
query tile.

Rationale: XLA's gather on this TPU sustains only ~5-10 GB/s / ~50-100M rows/s
(measured), making the reference-style gather kernel ~165 ms/frame in the encoder.
This formulation is MXU matmuls + a VPU epilogue and measures ~5.5x faster at
encoder scale (q_tile=256, bf16 compute).

Contract matches ops.deform_attn.ms_deform_attn:
  value (B, N, H, D), spatial_shapes static [(h, w)...], sampling_locations
  (B, Q, H, L, P, 2) in [0,1] (x, y), attention_weights (B, Q, H, L, P) ->
  (B, Q, H*D).  The VJP falls back to the XLA gather formulation (training-time
  only, mirroring the reference's fast-kernel/oracle pairing).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_attn import _ms_deform_attn_xla

Q_TILE = 256


def _level_kernel(g_ref, v_ref, comb_ref, out_ref, *, h, w, D, P, compute_dtype):
    """Grid cell: one (b*h, q-tile).
    g (1, 3P, Qt): rows [gy(P); gx(P); aw(P)] — p-major, lane dim = Qt (aligned).
    v (1, h, D*w) channel-major; comb (D*w, D); out (1, Qt, D)."""
    g = g_ref[0]
    Qt = g.shape[1]
    gy = g[:P]
    gx = g[P:2 * P]
    aw = g[2 * P:3 * P]

    iy = jax.lax.broadcasted_iota(jnp.int32, (P, Qt, h), 2).astype(jnp.float32)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(iy - gy[..., None])) * aw[..., None]
    hat_y = hat_y.reshape(P * Qt, h)
    ix = jax.lax.broadcasted_iota(jnp.int32, (P, Qt, w), 2).astype(jnp.float32)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(ix - gx[..., None])).reshape(P * Qt, w)

    s = jnp.dot(hat_y.astype(compute_dtype), v_ref[0].astype(compute_dtype),
                preferred_element_type=jnp.float32)                 # (PQt, D*w)
    t = s.astype(compute_dtype) * pltpu.repeat(hat_x.astype(compute_dtype), D, axis=1)
    outp = jnp.dot(t, comb_ref[:].astype(compute_dtype),
                   preferred_element_type=jnp.float32)              # (PQt, D)
    out_ref[0] = outp.reshape(P, Qt, D).sum(axis=0)


def _level_kernel_heads(g_ref, v_ref, comb_ref, out_ref, *, h, w, D, P, H,
                        compute_dtype):
    """Variant that loops all H heads of one frame inside a grid cell, amortizing
    per-cell pipeline overhead (used for wide levels where the q-tile can't grow).
    g (1, H, 3P, Qt); v (1, H, h, D*w); comb (D*w, D); out (1, H, Qt, D)."""
    Qt = g_ref.shape[3]
    for head in range(H):
        g = g_ref[0, head]
        gy = g[:P]
        gx = g[P:2 * P]
        aw = g[2 * P:3 * P]
        iy = jax.lax.broadcasted_iota(jnp.int32, (P, Qt, h), 2).astype(jnp.float32)
        hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(iy - gy[..., None])) * aw[..., None]
        hat_y = hat_y.reshape(P * Qt, h)
        ix = jax.lax.broadcasted_iota(jnp.int32, (P, Qt, w), 2).astype(jnp.float32)
        hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(ix - gx[..., None])).reshape(P * Qt, w)

        s = jnp.dot(hat_y.astype(compute_dtype), v_ref[0, head].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        t = s.astype(compute_dtype) * pltpu.repeat(hat_x.astype(compute_dtype), D,
                                                   axis=1)
        outp = jnp.dot(t, comb_ref[:].astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        out_ref[0, head] = outp.reshape(P, Qt, D).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("h", "w", "P", "H", "q_tile",
                                             "compute_dtype_name"))
def _deform_attn_level_heads(v, g, *, h, w, P, H, q_tile, compute_dtype_name):
    """v (B, H, h, D*w); g (B, H, 3P, Qp) -> (B, H, Qp, D) f32."""
    B = v.shape[0]
    Qp = g.shape[3]
    D = v.shape[3] // w
    compute_dtype = jnp.dtype(compute_dtype_name)
    comb = (jax.lax.broadcasted_iota(jnp.int32, (D * w, D), 0) // w
            == jax.lax.broadcasted_iota(jnp.int32, (D * w, D), 1)
            ).astype(compute_dtype)

    flops = 2 * B * H * Qp * P * (h + D) * w * D
    return pl.pallas_call(
        functools.partial(_level_kernel_heads, h=h, w=w, D=D, P=P, H=H,
                          compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
        grid=(B, Qp // q_tile),
        in_specs=[
            pl.BlockSpec((1, H, 3 * P, q_tile), lambda b, q: (b, 0, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, h, D * w), lambda b, q: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * w, D), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, q_tile, D), lambda b, q: (b, 0, q, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=v.size * 2,
                                      transcendentals=0),
    )(g, v, comb)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("h", "w", "P", "q_tile",
                                             "compute_dtype_name"))
def _deform_attn_level(v, g, *, h, w, P, q_tile, compute_dtype_name):
    """v (BH, h, D*w); g (BH, 3P, Qp) fp32, Qp % q_tile == 0 -> (BH, Qp, D) f32."""
    BH, _, Qp = g.shape
    D = v.shape[2] // w
    compute_dtype = jnp.dtype(compute_dtype_name)
    # comb[d*w + x, d] = 1: contracts x while keeping the channel d
    comb = (jax.lax.broadcasted_iota(jnp.int32, (D * w, D), 0) // w
            == jax.lax.broadcasted_iota(jnp.int32, (D * w, D), 1)
            ).astype(compute_dtype)

    flops = 2 * BH * Qp * P * (h + D) * w * D
    return pl.pallas_call(
        functools.partial(_level_kernel, h=h, w=w, D=D, P=P,
                          compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((BH, Qp, D), jnp.float32),
        grid=(BH, Qp // q_tile),
        in_specs=[
            pl.BlockSpec((1, 3 * P, q_tile), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, D * w), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * w, D), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=v.size * 2,
                                      transcendentals=0),
    )(g, v, comb)


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             q_tile: int, compute_dtype_name: str):
    B, N, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    BH = B * H

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)

    Qp = _round_up(Q, q_tile)
    pad_q = Qp - Q

    out = jnp.zeros((BH, Qp, D), jnp.float32)
    start = 0
    vt = value.transpose(0, 2, 1, 3).reshape(BH, N, D)  # (BH, N, D)
    # ship V to the kernel in the compute dtype (halves VMEM blocks + DMA for bf16)
    vt = vt.astype(jnp.dtype(compute_dtype_name))
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        hw = int(h_l) * int(w_l)
        v_l = jax.lax.dynamic_slice_in_dim(vt, start, hw, axis=1)
        start += hw

        gy = loc[:, :, :, l, :, 1].transpose(0, 2, 3, 1).reshape(BH, P, Q)
        gx = loc[:, :, :, l, :, 0].transpose(0, 2, 3, 1).reshape(BH, P, Q)
        aw = attw[:, :, :, l].transpose(0, 2, 3, 1).reshape(BH, P, Q)
        gy = gy * h_l - 0.5
        gx = gx * w_l - 0.5

        # contract the LONGER spatial axis on the MXU (stage 1, kernel axis "h") and
        # fold the shorter one in the VPU stage (kernel axis "w") — the elementwise
        # cost scales with D * (folded axis)
        if w_l < h_l:
            # fold x: channel-major (h, D*w) layout — see kernel docstring
            v_l = v_l.reshape(BH, h_l, w_l, D).transpose(0, 1, 3, 2)
            v_l = v_l.reshape(BH, h_l, D * w_l)
        else:
            # fold y: transpose the map so the kernel's "y" is the image x axis
            v_l = v_l.reshape(BH, h_l, w_l, D).transpose(0, 2, 3, 1)
            v_l = v_l.reshape(BH, w_l, D * h_l)
            gy, gx = gx, gy
            h_l, w_l = w_l, h_l
        if pad_q:
            padv = ((0, 0), (0, 0), (0, pad_q))
            gy = jnp.pad(gy, padv, constant_values=-10.0)
            gx = jnp.pad(gx, padv, constant_values=-10.0)
            aw = jnp.pad(aw, padv)
        g = jnp.concatenate([gy, gx, aw], axis=1)  # (BH, 3P, Qp)
        # wide levels can't grow the q-tile (stage-1 buffer P*Qt x D*w fp32 must fit
        # scoped VMEM), so they amortize per-cell overhead by looping all heads in
        # one grid cell instead; narrow levels simply double the q-tile.
        wide = D * w_l * P * 2 * q_tile * 4 > 16 * 2 ** 20
        if wide:
            vh = v_l.reshape(B, H, h_l, D * w_l)
            gh = g.reshape(B, H, 3 * P, Qp)
            qt_h = q_tile
            while P * qt_h * D * w_l * 4 > 6 * 2 ** 20 and qt_h > 64 \
                    and Qp % (qt_h // 2) == 0:
                qt_h //= 2
            lvl = _deform_attn_level_heads(vh, gh, h=int(h_l), w=int(w_l), P=P,
                                           H=H, q_tile=qt_h,
                                           compute_dtype_name=compute_dtype_name)
            lvl = lvl.reshape(BH, Qp, D)
        else:
            qt_l = min(2 * q_tile, Qp)
            if Qp % qt_l:
                qt_l = q_tile
            lvl = _deform_attn_level(v_l, g, h=int(h_l), w=int(w_l), P=P,
                                     q_tile=qt_l,
                                     compute_dtype_name=compute_dtype_name)
        out = out + lvl

    out = out[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, q_tile: int = Q_TILE,
                          compute_dtype_name: str = "bfloat16"):
    """Pallas hat-matmul forward; VJP falls back to the XLA gather formulation."""
    return _forward(value, spatial_shapes, sampling_locations, attention_weights,
                    q_tile, compute_dtype_name)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights, q_tile,
         compute_dtype_name):
    out = _forward(value, spatial_shapes, sampling_locations, attention_weights,
                   q_tile, compute_dtype_name)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, q_tile, compute_dtype_name, res, g):
    value, loc, attw = res
    _, vjp = jax.vjp(lambda v, l, a: _ms_deform_attn_xla(v, spatial_shapes, l, a),
                     value, loc, attw)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
