"""Multi-scale deformable attention core op (TPU-native).

This replaces the reference's CUDA extension (behavioral spec:
/root/reference/mdqe/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299 forward,
oracle: /root/reference/mdqe/models/ops/functions/ms_deform_attn_func.py:45-65).

Tensor contract (matches the reference kernel):
  value:               (B, N, H, D)   N = sum_l h_l*w_l
  spatial_shapes:      static tuple of (h_l, w_l) — shapes are compile-time constants
                       on TPU (fixed-size padded inputs), so levels unroll under jit
  sampling_locations:  (B, Q, H, L, P, 2) normalized [0,1], last dim (x, y)
  attention_weights:   (B, Q, H, L, P), softmaxed over L*P
  returns:             (B, Q, H*D)

Sampling semantics = torch grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False): pixel coord = loc * size - 0.5, out-of-range corners contribute 0.

TPU design notes: the op is gather-bound, not FLOP-bound. We lower it as one fused
row-gather per (level): all (Q*P*4corner) row indices for all heads are gathered from a
(B*H, h*w, D) value slab with a single take_along_axis (one XLA gather HLO), then the
bilinear corner weights and attention weights are applied as fused VPU elementwise ops.
Gradients flow through take_along_axis (transpose = scatter-add), matching the CUDA
backward's atomicAdd accumulation. Location/weight math is kept in fp32 (the reference
forces fp32 through the kernel); `value` may be bf16.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_bilinear_gather(v_l, x, y, h_l, w_l):
    """v_l: (B, hw, H, D); x, y: (B, Q, H, P) pixel coords (already *size - 0.5).
    Returns sampled (B, Q, H, P, D) with zero padding outside."""
    B, hw, H, D = v_l.shape
    Q, P = x.shape[1], x.shape[3]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # corner indices and weights, stacked on a new trailing axis (4 corners)
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)      # (B,Q,H,P,4)
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    wts = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                     (1 - fx) * fy, fx * fy], axis=-1)          # (B,Q,H,P,4)
    valid = ((xs >= 0) & (xs < w_l) & (ys >= 0) & (ys < h_l)).astype(wts.dtype)
    wts = wts * valid
    lin = jnp.clip(ys, 0, h_l - 1) * w_l + jnp.clip(xs, 0, w_l - 1)  # (B,Q,H,P,4)

    # one gather per level: (B*H, Q*P*4) rows of D
    v_bh = v_l.transpose(0, 2, 1, 3).reshape(B * H, hw, D)
    idx = lin.transpose(0, 2, 1, 3, 4).reshape(B * H, Q * P * 4, 1)
    rows = jnp.take_along_axis(v_bh, idx, axis=1)                # (B*H, Q*P*4, D)
    rows = rows.reshape(B, H, Q, P, 4, D)

    wts = wts.transpose(0, 2, 1, 3, 4)                           # (B,H,Q,P,4)
    out = jnp.einsum("bhqpc,bhqpcd->bhqpd", wts, rows.astype(wts.dtype))
    return out.transpose(0, 2, 1, 3, 4)                          # (B,Q,H,P,D)


def ms_deform_attn(value, spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations, attention_weights, impl: str = "auto",
                   allow_banded: bool = True):
    """Fused multi-scale deformable attention (see module docstring for the contract).

    impl: 'auto' (Pallas hat-matmul kernel on TPU for large query counts, XLA
          gather for small ones and on CPU), 'pallas', or 'xla'.
    allow_banded: opt OUT of the banded kernels even for Q == N callers.
          The training encoder sets this False: interleaved same-window step
          A/Bs at the 512x800 train geometry measured the banded step at
          1.474-1.482 s/iter vs 1.358-1.359 legacy even though the standalone
          kernels are a wash there (fwd+bwd 1.04x, tools/bench_banded_ab.py
          --train-geom) — the banded pack/permute glue recomputed under the
          encoder's remat policy eats the kernel win. Inference (fwd-only,
          eval geometry) keeps banded: fwd 1.24x and whole-video device busy
          1.26 -> 1.11 s."""
    if impl == "auto":
        impl = "xla" if jax.default_backend() in ("cpu",) else "pallas"
    if impl == "pallas":
        import os
        from .deform_attn_pallas import Q_TILE, ms_deform_attn_pallas
        # banded kernels pay off when the queries ARE the pixels (encoder
        # self-attention, Q == N): block-permuted q-tiles are spatially local
        # so each grid cell contracts only a small patch per level. Scattered
        # small-Q callers (decoder) keep the legacy full-contraction kernels.
        # MDQE_DEFORM_BANDED=0 disables the banded path (perf A/B). Q == N is
        # a structural requirement (the banded packing permutes queries by the
        # pixel block permutation), so the env var can only opt OUT, never
        # force banded onto scattered-Q callers. Positional args: custom_vjp
        # nondiff args don't accept keywords.
        banded = (allow_banded
                  and value.shape[1] == sampling_locations.shape[1]
                  and os.environ.get("MDQE_DEFORM_BANDED") != "0")
        return ms_deform_attn_pallas(value, tuple(spatial_shapes),
                                     sampling_locations, attention_weights,
                                     Q_TILE, "bfloat16", banded)
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights)


def _ms_deform_attn_xla(value, spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations, attention_weights):
    """XLA gather formulation (differentiable; CPU/test path and VJP fallback)."""
    B, N, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)

    # fp32 islands (the reference forces fp32 through the kernel); promote to f64
    # only when the caller passes f64 (oracle/parity tests)
    cdt = jnp.promote_types(jnp.result_type(value, sampling_locations), jnp.float32)
    loc = sampling_locations.astype(cdt)
    attw = attention_weights.astype(cdt)

    out = jnp.zeros((B, Q, H, D), dtype=cdt)
    start = 0
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        hw = int(h_l) * int(w_l)
        v_l = jax.lax.dynamic_slice_in_dim(value, start, hw, axis=1)
        x = loc[:, :, :, l, :, 0] * w_l - 0.5
        y = loc[:, :, :, l, :, 1] * h_l - 0.5
        sampled = _level_bilinear_gather(v_l, x, y, int(h_l), int(w_l))  # (B,Q,H,P,D)
        out = out + jnp.einsum("bqhp,bqhpd->bqhd", attw[:, :, :, l], sampled)
        start += hw
    return out.reshape(B, Q, H * D)


# ---------------------------------------------------------------------------
# readable reference (oracle) — mirrors the reference repo's pure-torch oracle
# (ms_deform_attn_func.py:45-65) but in plain JAX; used by tests only.
# ---------------------------------------------------------------------------

def ms_deform_attn_ref(value, spatial_shapes, sampling_locations, attention_weights):
    """Unfused per-corner oracle implementation (float64-friendly). Same contract."""
    B, N, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype
    out = jnp.zeros((B, Q, H, D), dtype=dtype)
    start = 0
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        hw = int(h_l) * int(w_l)
        v_l = value[:, start:start + hw].reshape(B, h_l, w_l, H, D)
        start += hw
        x = sampling_locations[:, :, :, l, :, 0].astype(dtype) * w_l - 0.5
        y = sampling_locations[:, :, :, l, :, 1].astype(dtype) * h_l - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        acc = jnp.zeros((B, Q, H, P, D), dtype=dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                cx, cy = x0 + dx, y0 + dy
                wgt = (1 - jnp.abs(x - cx)) * (1 - jnp.abs(y - cy))
                ok = (cx >= 0) & (cx < w_l) & (cy >= 0) & (cy < h_l)
                cxc = jnp.clip(cx, 0, w_l - 1)
                cyc = jnp.clip(cy, 0, h_l - 1)
                # vals[b,q,h,p,d] = v_l[b, cy, cx, h, d]
                vals = v_l[jnp.arange(B)[:, None, None, None], cyc, cxc,
                           jnp.arange(H)[None, None, :, None]]
                acc = acc + jnp.where(ok[..., None], wgt[..., None] * vals, 0.0)
        out = out + (attention_weights[:, :, :, l, :, None].astype(dtype) * acc).sum(axis=3)
    return out.reshape(B, Q, H * D)
