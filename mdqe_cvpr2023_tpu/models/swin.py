"""Swin backbone (v2 default, v1 selectable), NHWC, torch-convention weights.

Behavioral spec, v2: /root/reference/mdqe/backbone/swin_transformer_v2.py:482-727 —
cosine window attention with clamped learned logit scale (:161-164), continuous
position bias MLP on log-scaled relative coords (:100-120), q/v-only bias (:136-141),
shifted windows with cyclic roll + cross-window masking, PatchMerging, post-norm
blocks (x = shortcut + norm1(attn(x))), per-stage output LayerNorms, last stage uses
window_size // 2 (:562).

Behavioral spec, v1: /root/reference/mdqe/backbone/swin_transformer.py:440-683 —
pre-norm blocks (x = shortcut + attn(norm1(x))), scaled dot-product attention with a
learned relative-position-bias table (:94-134), full qkv bias, PatchMerging with norm
BEFORE reduction (:255-291), constant window size across stages (:330).
APE (absolute position embedding, off in every reference preset,
backbone/config.py:16,34,52,70): learned (1, C, H0, W0) embedding at the
pretrain patch resolution, bicubic-resized (exact torch kernel via static
interpolation matrices) and added after patch embed (:504-509, 595-598).

Training-time stochastic depth (timm DropPath, reference v1 :228 / v2 :287-288,
rate linearly spaced 0 -> drop_path_rate over all blocks) applies when an rng is
passed; eval (rng=None) is deterministic.

Param tree mirrors the torch names (patch_embed.proj, layers.{i}.blocks.{j}.attn.*,
layers.{i}.downsample.*, norm{i}) so released checkpoints (prefixed
detr.backbone.0.backbone.) load via the standard converter.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import nn as fnn


@dataclass(frozen=True)
class SwinCfg:
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_stages: Tuple[int, ...] = (1, 2, 3)  # stage3..5 = strides 8/16/32
    version: int = 2           # 1 = swin_transformer.py, 2 = swin_transformer_v2.py
    drop_path_rate: float = 0.0  # reference configs train with 0.2
    # absolute position embedding (reference swin_transformer.py:504-509,
    # 595-598 — OFF in every reference preset, backbone/config.py:16,34,52,70)
    ape: bool = False
    pretrain_img_size: int = 224

    @property
    def emit_stages(self) -> Tuple[int, ...]:
        """out_stages restricted to stages that exist; if the requested set is
        mostly absent (a custom swin shallower than 4 stages), fall back to the
        last min(3, n_stages) stages so the model still gets a 3-level pyramid."""
        n = len(self.depths)
        valid = tuple(i for i in self.out_stages if i < n)
        if len(valid) < min(len(self.out_stages), n):
            valid = tuple(range(max(0, n - len(self.out_stages)), n))
        return valid

    def stage_dim(self, i):
        return self.embed_dim * 2 ** i

    def stage_window(self, i):
        if self.version == 1:  # v1 keeps one window size (swin_transformer.py:330)
            return self.window_size
        return self.window_size // 2 if i == len(self.depths) - 1 else self.window_size

    def block_drop_path(self, i, j):
        """Linearly spaced stochastic-depth rate for block j of stage i
        (reference v2 :536-537: linspace over sum(depths))."""
        total = sum(self.depths)
        if total <= 1 or self.drop_path_rate <= 0.0:
            return 0.0
        idx = sum(self.depths[:i]) + j
        return self.drop_path_rate * idx / (total - 1)


@lru_cache(maxsize=None)
def _coords_table(wh: int, ww: int) -> np.ndarray:
    """(1, 2wh-1, 2ww-1, 2) log-scaled relative coords (reference :103-120)."""
    rh = np.arange(-(wh - 1), wh, dtype=np.float64)
    rw = np.arange(-(ww - 1), ww, dtype=np.float64)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1)[None]
    table[..., 0] /= max(wh - 1, 1)
    table[..., 1] /= max(ww - 1, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


@lru_cache(maxsize=None)
def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    ch, cw = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    coords = np.stack([ch.reshape(-1), cw.reshape(-1)])  # (2, whww)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return rel.sum(-1)  # (whww, whww)


@lru_cache(maxsize=None)
def _shift_attn_mask(Hp: int, Wp: int, win: int, shift: int) -> np.ndarray:
    """(nW, win*win, win*win) additive mask (0 / -100) for shifted windows."""
    img = np.zeros((Hp, Wp))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    mw = img.reshape(Hp // win, win, Wp // win, win).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, win * win)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, win: Tuple[int, int], num_heads: int, mask=None):
    """x (B_, N, C) windows; cosine attention with CPB (reference :136-185)."""
    B_, N, C = x.shape
    dh = C // num_heads
    q_bias = p["q_bias"]
    v_bias = p["v_bias"]
    qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(v_bias), v_bias])
    qkv = jnp.einsum("bnc,oc->bno", x, p["qkv"]["weight"]) + qkv_bias
    qkv = qkv.reshape(B_, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, H, N, dh)

    qn = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
    kn = k / jnp.clip(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12, None)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn)
    logit_scale = jnp.exp(jnp.clip(p["logit_scale"], None, math.log(100.0)))
    attn = attn * logit_scale[None]

    table = jnp.asarray(_coords_table(win[0], win[1]))
    cpb = fnn.linear(p["cpb_mlp"]["0"], table)
    cpb = jax.nn.relu(cpb)
    cpb = jnp.einsum("...i,oi->...o", cpb, p["cpb_mlp"]["2"]["weight"])
    cpb = cpb.reshape(-1, num_heads)
    idx = jnp.asarray(_rel_pos_index(win[0], win[1]).reshape(-1))
    bias = cpb[idx].reshape(N, N, num_heads).transpose(2, 0, 1)
    bias = 16.0 * jax.nn.sigmoid(bias)
    attn = attn + bias[None]

    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, num_heads, N, N) + mask[None, :, None]
        attn = attn.reshape(B_, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
    # the CPB table/bias are strong f32, which silently promoted the whole
    # block under bf16 params; attention logits/softmax stay f32 (AMP-style
    # islands), the value matmul and everything after return to the
    # activation dtype
    return fnn.linear(p["proj"], out.astype(x.dtype))


def _window_attention_v1(p, x, win: Tuple[int, int], num_heads: int, mask=None):
    """x (B_, N, C) windows; scaled dot-product attention with a learned
    relative-position-bias table (reference swin_transformer.py:94-152)."""
    B_, N, C = x.shape
    dh = C // num_heads
    qkv = jnp.einsum("bnc,oc->bno", x, p["qkv"]["weight"]) + p["qkv"]["bias"]
    qkv = qkv.reshape(B_, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, H, N, dh)

    # attention logits/softmax stay f32 islands like the v2 path
    attn = jnp.einsum("bhnd,bhmd->bhnm", (q * dh ** -0.5).astype(jnp.float32),
                      k.astype(jnp.float32))
    idx = jnp.asarray(_rel_pos_index(win[0], win[1]).reshape(-1))
    bias = p["relative_position_bias_table"][idx]
    bias = bias.reshape(N, N, num_heads).transpose(2, 0, 1).astype(jnp.float32)
    attn = attn + bias[None]

    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, num_heads, N, N) + mask[None, :, None]
        attn = attn.reshape(B_, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return fnn.linear(p["proj"], out.astype(x.dtype))


def _block(p, x, H, W, win: int, shift: int, num_heads: int, version: int = 2,
           dp_rate: float = 0.0, rng=None):
    """One Swin block on (B, H, W, C): post-norm (v2) or pre-norm (v1), with
    stochastic depth on both residual branches when an rng is given."""
    B, _, _, C = x.shape
    shortcut = x
    if version == 1:  # pre-norm (swin_transformer.py:208)
        x = fnn.layer_norm(p["norm1"], x)

    pad_b = (win - H % win) % win
    pad_r = (win - W % win) % win
    xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r

    if shift > 0:
        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_attn_mask(Hp, Wp, win, shift))
    else:
        mask = None

    xw = xp.reshape(B, Hp // win, win, Wp // win, win, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(-1, win * win, C)
    attn_fn = _window_attention_v1 if version == 1 else _window_attention
    aw = attn_fn(p["attn"], xw, (win, win), num_heads, mask)
    aw = aw.reshape(B, Hp // win, Wp // win, win, win, C).transpose(0, 1, 3, 2, 4, 5)
    xp = aw.reshape(B, Hp, Wp, C)

    if shift > 0:
        xp = jnp.roll(xp, (shift, shift), axis=(1, 2))
    x = xp[:, :H, :W]

    r1 = jax.random.fold_in(rng, 0) if rng is not None else None
    r2 = jax.random.fold_in(rng, 1) if rng is not None else None
    if version == 1:
        x = shortcut + fnn.drop_path(x, dp_rate, r1)
        h = fnn.layer_norm(p["norm2"], x)
        h = fnn.linear(p["mlp"]["fc1"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = fnn.linear(p["mlp"]["fc2"], h)
        x = x + fnn.drop_path(h, dp_rate, r2)
    else:
        x = shortcut + fnn.drop_path(fnn.layer_norm(p["norm1"], x), dp_rate, r1)
        h = fnn.linear(p["mlp"]["fc1"], x)
        h = jax.nn.gelu(h, approximate=False)
        h = fnn.linear(p["mlp"]["fc2"], h)
        x = x + fnn.drop_path(fnn.layer_norm(p["norm2"], h), dp_rate, r2)
    return x


def _patch_merge(p, x, version: int = 2):
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C). v2 reduces then norms (2C);
    v1 norms (4C) then reduces (swin_transformer.py:288-291)."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    if version == 1:
        return fnn.linear(p["reduction"], fnn.layer_norm(p["norm"], x))
    x = fnn.linear(p["reduction"], x)
    return fnn.layer_norm(p["norm"], x)


@lru_cache(maxsize=None)
def _bicubic_matrix(n_out: int, n_in: int, a: float = -0.75) -> np.ndarray:
    """Dense 1-D bicubic interpolation matrix (n_out, n_in) with torch
    F.interpolate(mode='bicubic', align_corners=False) semantics: half-pixel
    source positions, Keys kernel a=-0.75, edge-clamped taps. Static shapes ->
    built once in numpy; the 2-D resize is then two small matmuls (MXU)."""
    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        for tap in range(x0 - 1, x0 + 3):
            m[i, min(max(tap, 0), n_in - 1)] += k(src - tap)
    return m


def swin_apply(params, x, cfg: SwinCfg = SwinCfg(), rng=None):
    """x (B, H, W, 3) -> list of NHWC stage outputs (strides 8, 16, 32 for MDQE).
    rng != None enables training-time stochastic depth at cfg.drop_path_rate."""
    B, H, W, _ = x.shape
    ps = cfg.patch_size
    pad_b = (ps - H % ps) % ps
    pad_r = (ps - W % ps) % ps
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    x = jax.lax.conv_general_dilated(x, params["patch_embed"]["proj"]["weight"],
                                     (ps, ps), "VALID",
                                     dimension_numbers=("NHWC", "OIHW", "NHWC"))
    x = x + params["patch_embed"]["proj"]["bias"]
    x = fnn.layer_norm(params["patch_embed"]["norm"], x)
    if cfg.ape:
        # param kept in the torch layout (1, C, H0, W0) so checkpoints load
        # with no tensor surgery; bicubic-resized to the runtime patch grid
        # (reference swin_transformer.py:595-598)
        ape = params["absolute_pos_embed"][0].astype(jnp.float32)  # (C, H0, W0)
        ky = jnp.asarray(_bicubic_matrix(x.shape[1], ape.shape[1]))
        kx = jnp.asarray(_bicubic_matrix(x.shape[2], ape.shape[2]))
        ape = jnp.einsum("hH,cHW,wW->hwc", ky, ape, kx)
        x = x + ape[None].astype(x.dtype)

    outs = []
    for i, depth in enumerate(cfg.depths):
        win = cfg.stage_window(i)
        heads = cfg.num_heads[i]
        lp = params["layers"][i]
        for j in range(depth):
            shift = 0 if j % 2 == 0 else win // 2
            brng = (jax.random.fold_in(rng, sum(cfg.depths[:i]) + j)
                    if rng is not None else None)
            x = _block(lp["blocks"][j], x, x.shape[1], x.shape[2], win, shift,
                       heads, cfg.version, cfg.block_drop_path(i, j), brng)
        if i in cfg.emit_stages:
            nrm = params[f"norm{i}"]
            outs.append(fnn.layer_norm(nrm, x))
        if "downsample" in lp:
            x = _patch_merge(lp["downsample"], x, cfg.version)
    return outs


def _win_attn_init(key, dim, heads, win, version: int = 2):
    ks = jax.random.split(key, 4)
    if version == 1:
        # learned bias table, trunc-normal std 0.02 (swin_transformer.py:118)
        table = 0.02 * jax.random.truncated_normal(
            ks[0], -2.0, 2.0, ((2 * win - 1) * (2 * win - 1), heads), jnp.float32)
        return {
            "relative_position_bias_table": table,
            "qkv": fnn.linear_init(ks[2], dim, 3 * dim),
            "proj": fnn.linear_init(ks[3], dim, dim),
        }
    return {
        "logit_scale": jnp.full((heads, 1, 1), math.log(10.0), jnp.float32),
        "cpb_mlp": {"0": fnn.linear_init(ks[0], 2, 512),
                    "2": {"weight": fnn.xavier_uniform(ks[1], (heads, 512))}},
        "qkv": {"weight": fnn.xavier_uniform(ks[2], (3 * dim, dim))},
        "q_bias": jnp.zeros((dim,), jnp.float32),
        "v_bias": jnp.zeros((dim,), jnp.float32),
        "proj": fnn.linear_init(ks[3], dim, dim),
    }


# reference presets (mdqe/backbone/config.py:6-76); 'large' keeps the window
# size the released swinl configs actually use (configs/swinl_*.yaml WINDOW_SIZE 12)
SWIN_PRESETS = {
    "tiny": SwinCfg(embed_dim=96, depths=(2, 2, 6, 2),
                    num_heads=(3, 6, 12, 24), window_size=8),
    "small": SwinCfg(embed_dim=96, depths=(2, 2, 18, 2),
                     num_heads=(3, 6, 12, 24), window_size=16),
    "base": SwinCfg(embed_dim=128, depths=(2, 2, 18, 2),
                    num_heads=(4, 8, 16, 32), window_size=16),
    "large": SwinCfg(embed_dim=192, depths=(2, 2, 18, 2),
                     num_heads=(6, 12, 24, 48), window_size=12),
}


def swin_init(key, cfg: SwinCfg = SwinCfg()):
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params = {
        "patch_embed": {
            "proj": fnn.conv_init(next(ki), 3, cfg.embed_dim, cfg.patch_size),
            "norm": fnn.norm_init(cfg.embed_dim),
        },
        "layers": [],
    }
    if cfg.ape:
        r = cfg.pretrain_img_size // cfg.patch_size
        # trunc_normal_(std=.02) on the torch-layout (1, C, H0, W0) param
        params["absolute_pos_embed"] = 0.02 * jax.random.truncated_normal(
            next(ki), -2.0, 2.0, (1, cfg.embed_dim, r, r))
    for i, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(i)
        d_ffn = int(dim * cfg.mlp_ratio)
        blocks = []
        for j in range(depth):
            k = jax.random.split(jax.random.fold_in(keys[8 + i], j), 4)
            blocks.append({
                "attn": _win_attn_init(k[0], dim, cfg.num_heads[i],
                                       cfg.stage_window(i), cfg.version),
                "norm1": fnn.norm_init(dim),
                "mlp": {"fc1": fnn.linear_init(k[1], dim, d_ffn),
                        "fc2": fnn.linear_init(k[2], d_ffn, dim)},
                "norm2": fnn.norm_init(dim),
            })
        layer = {"blocks": blocks}
        if i < len(cfg.depths) - 1:
            layer["downsample"] = {
                "reduction": {"weight": fnn.xavier_uniform(next(ki), (2 * dim, 4 * dim))},
                # v1 norms the 4C concat before reduction; v2 norms the 2C output
                "norm": fnn.norm_init(4 * dim if cfg.version == 1 else 2 * dim),
            }
        params["layers"].append(layer)
    for i in range(len(cfg.depths)):
        if i in cfg.emit_stages:
            params[f"norm{i}"] = fnn.norm_init(cfg.stage_dim(i))
    return params


swin_large_init = swin_init
