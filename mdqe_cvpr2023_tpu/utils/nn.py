"""Minimal functional NN layer library (pure JAX, pytree params).

Design: every layer is a pure function `f(params, x)`; params are nested dicts whose
leaf shapes follow torch conventions (Linear weight (out,in), Conv weight OIHW) so the
released Detectron2 checkpoints (reference Model Zoo) load via a pure name map with no
tensor surgery. Activations are NHWC (TPU-native); XLA folds the implied transposes
into dot_general/conv, so this costs nothing at runtime.

Parity targets (re-derived, not copied):
  - MLP: /root/reference/mdqe/models/misc.py:6-18 (GELU between layers)
  - PositionEmbeddingSine: /root/reference/mdqe/models/position_encoding.py:12-48
  - torch nn.MultiheadAttention (batch_first) for decoder self-attention
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers (torch-compatible)
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ on a torch-convention weight (fan_out, fan_in, ...)."""
    fan_out, fan_in = shape[0], shape[1]
    rf = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    limit = math.sqrt(6.0 / ((fan_in + fan_out) * rf))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def kaiming_uniform(key, shape, a=1.0, dtype=jnp.float32):
    """torch nn.init.kaiming_uniform_(a=a) on OIHW / (out,in) weights."""
    fan_in = int(np.prod(shape[1:]))
    bound = math.sqrt(6.0 / ((1 + a * a) * fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default init (kaiming_uniform a=sqrt(5) => U(-1/sqrt(fan_in),...))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "weight": jax.random.uniform(k1, (out_dim, in_dim), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (out_dim,), dtype, -bound, bound),
    }


def conv_init(key, in_ch, out_ch, ksize, groups=1, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    shape = (out_ch, in_ch // groups, ksize, ksize)
    fan_in = (in_ch // groups) * ksize * ksize
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(k1, shape, dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (out_ch,), dtype, -bound, bound),
    }


def norm_init(dim, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def linear(p, x):
    """x (..., in) @ weight (out, in)^T + bias."""
    y = jnp.einsum("...i,oi->...o", x, p["weight"])
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def conv2d(p, x, stride=1, padding="SAME", groups=1, dilation=1):
    """NHWC conv with OIHW weights. padding: int (torch-style symmetric) or 'SAME'."""
    w = p["weight"]
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def conv_transpose2d_up2(p, x):
    """Depthwise 1x1 transposed conv, stride 2, output_padding 1 (the reference mask-head
    upsampler, segmentation.py:28-29): equivalent to zero-interleave then scale + bias,
    i.e. out[2i,2j] = x[i,j]*w_c, other positions = bias. Implemented with pad-free
    reshape tricks (fast on TPU)."""
    B, H, W, C = x.shape
    w = p["weight"].reshape(C)[None, None, None, :]  # depthwise 1x1: OIHW (C,1,1,1)
    scaled = x * w
    out = jnp.zeros((B, H, 2, W, 2, C), dtype=x.dtype)
    out = out.at[:, :, 0, :, 0, :].set(scaled)
    out = out.reshape(B, 2 * H, 2 * W, C)
    if "bias" in p and p["bias"] is not None:
        # bias adds everywhere (conv bias)
        out = out + p["bias"]
    return out


def group_norm(p, x, num_groups, eps=1e-5):
    """torch nn.GroupNorm on NHWC input: normalize per (group) over (H, W, C/G).
    Statistics in fp32 regardless of activation dtype (bf16-safe)."""
    B, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(B, H, W, C) * p["weight"].astype(jnp.float32) \
        + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(p, x, eps=1e-5):
    """LayerNorm with fp32 statistics (bf16-safe)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p["weight"].astype(jnp.float32) \
        + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def frozen_batch_norm(p, x, eps=1e-5):
    """FrozenBN folded at apply time: y = (x - mean) / sqrt(var+eps) * w + b on NHWC.

    All four stats are BUFFERS in the reference (D2 FrozenBatchNorm2d registers
    weight/bias/running_mean/running_var as buffers): autograd never reaches
    them and the optimizer never updates or weight-decays them. stop_gradient
    makes our grads match (zero) and the optimizer's frozen-leaf mask
    (parallel/train.py) keeps AdamW off them."""
    scale = jax.lax.stop_gradient(p["weight"] * jax.lax.rsqrt(p["running_var"] + eps))
    bias = jax.lax.stop_gradient(p["bias"] - p["running_mean"] * scale)
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def mlp_init(key, in_dim, hidden_dim, out_dim, num_layers, dtype=jnp.float32):
    dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, num_layers)
    return {"layers": [linear_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)]}


def mlp(p, x):
    """3-layer GELU MLP head (reference models/misc.py:6-18): GELU after all but last."""
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.gelu(x, approximate=False)
    return x


# ---------------------------------------------------------------------------
# multi-head attention (torch nn.MultiheadAttention, batch_first)
# ---------------------------------------------------------------------------

def mha_init(key, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj_weight": xavier_uniform(k1, (3 * dim, dim), dtype),
        "in_proj_bias": jnp.zeros((3 * dim,), dtype),
        "out_proj": {"weight": xavier_uniform(k2, (dim, dim), dtype),
                     "bias": jnp.zeros((dim,), dtype)},
    }


def mha(p, q, k, v, num_heads):
    """q,k,v: (B, L, C). Standard softmax attention, torch-parameterized."""
    C = q.shape[-1]
    wq, wk, wv = jnp.split(p["in_proj_weight"], 3, axis=0)
    bq, bk, bv = jnp.split(p["in_proj_bias"], 3, axis=0)
    qh = jnp.einsum("blc,oc->blo", q, wq) + bq
    kh = jnp.einsum("blc,oc->blo", k, wk) + bk
    vh = jnp.einsum("blc,oc->blo", v, wv) + bv
    B, Lq, _ = qh.shape
    Lk = kh.shape[1]
    dh = C // num_heads
    qh = qh.reshape(B, Lq, num_heads, dh).transpose(0, 2, 1, 3)
    kh = kh.reshape(B, Lk, num_heads, dh).transpose(0, 2, 1, 3)
    vh = vh.reshape(B, Lk, num_heads, dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
    # fp32 softmax island (exact no-op for f32 activations)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
    return linear(p["out_proj"], out)


# ---------------------------------------------------------------------------
# sine position embedding
# ---------------------------------------------------------------------------

def position_embedding_sine(not_mask, num_pos_feats, temperature=10000.0, scale=2 * math.pi):
    """not_mask: (B, H, W) float/bool with 1 on valid pixels -> (B, H, W, 2*num_pos_feats).

    Matches reference position_encoding.py:28-48 (normalize=True): cumsum over valid
    pixels, normalized by the per-row/col totals, interleaved sin/cos.
    """
    nm = not_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(nm, axis=1)
    x_embed = jnp.cumsum(nm, axis=2)
    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t  # (B,H,W,F)
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # (B,H,W,2F) channel-last


def dropout(x, rate: float, rng):
    """Inverted dropout; identity when rate==0 or rng is None (eval)."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def drop_path(x, rate: float, rng):
    """Stochastic depth (timm DropPath): zero the whole residual branch per
    sample with prob `rate`, scaling survivors by 1/(1-rate). Identity when
    rate==0 or rng is None (eval)."""
    if rng is None or rate <= 0.0:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
