"""Transformer decoder: grid-guided query initialization, inter-frame query
association, two-level (box/instance) deformable decoder, and output heads.

Behavioral spec: /root/reference/mdqe/models/transformer_dec.py:16-513.
  - grid_guided_query_selection (:81-109): split the stride-8 class-score map into a
    sqrt(Q) x sqrt(Q) grid, pick the per-cell peak as each query's initial location.
  - inter_frame_query_association (:111-145): align per-frame queries to the central
    (key) frame via embedding similarity restricted to a relpos window.
  - DecoderDefAttnLayer (:268-431): box-level (per-frame) deformable cross-attn +
    self-attn + FFN, then instance-level (per-clip): softmax time-weight fusion,
    instance self-attn, optional temporal deformable cross-attn (TCA), FFN.
  - DecoderDefAttn loop (:434-513): warmup bbox layer, iterative box refinement via
    inverse_sigmoid, clip-level circumscribed reference boxes.

All shapes are static under jit: the clip length T, query count Q and feature shapes
are compile-time constants; train vs inference paths are selected in Python.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import nn as fnn
from ..utils.misc import grid_sample, interpolate_bilinear, inverse_sigmoid
from ..utils.boxes import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh
from .attention import MSDeformAttnCfg, ms_deform_attn_module, ms_deform_attn_module_init
from .mask_head import MaskHeadCfg, mask_head_apply, mask_head_init


@dataclass(frozen=True)
class DecoderCfg:
    num_classes: int = 80
    dim: int = 256
    n_heads: int = 8
    n_levels: int = 4
    n_frames: int = 1          # training clip length (weights are inflated to this)
    n_points: int = 4
    n_layers: int = 6
    mlp_ratio: float = 4.0
    n_query: int = 196
    query_embed_dim: int = 64
    window_inter_frame_asso: int = 5
    rpn_level: int = 0
    use_tca: bool = True
    mask_on: bool = True

    @property
    def n_query_bins(self) -> int:
        return int(math.sqrt(self.n_query))

    @property
    def box_attn_cfg(self) -> MSDeformAttnCfg:
        return MSDeformAttnCfg(self.dim, self.n_levels, self.n_heads, self.n_points,
                               n_frames=self.n_frames, pred_offsets=False, mode="spatial")

    @property
    def inst_attn_cfg(self) -> MSDeformAttnCfg:
        return MSDeformAttnCfg(self.dim, self.n_levels, self.n_heads, self.n_points,
                               n_frames=self.n_frames, pred_offsets=False, mode="temporal")

    @property
    def mask_head_cfg(self) -> MaskHeadCfg:
        return MaskHeadCfg(self.dim, (self.dim, self.dim))


@lru_cache(maxsize=None)
def query_relpos_grid(n_bins: int) -> np.ndarray:
    """(Q, Q, 2) |grid_i - grid_j| over the n_bins x n_bins query lattice
    (reference transformer_dec.py:61-64)."""
    i, j = np.meshgrid(np.arange(n_bins), np.arange(n_bins), indexing="ij")
    idx = np.stack([j, i], axis=-1).reshape(-1, 2)
    return np.abs(idx[:, None] - idx[None])


def _layer_init(key, cfg: DecoderCfg):
    d = cfg.dim
    d_ffn = int(d * cfg.mlp_ratio)
    ks = jax.random.split(key, 10)
    p = {
        "self_attn": fnn.mha_init(ks[0], d),
        "norm1": fnn.norm_init(d),
        "cross_attn": ms_deform_attn_module_init(ks[1], cfg.box_attn_cfg),
        "norm2": fnn.norm_init(d),
        "linear1": fnn.linear_init(ks[2], d, d_ffn),
        "linear2": fnn.linear_init(ks[3], d_ffn, d),
        "norm3": fnn.norm_init(d),
        "time_weights": fnn.linear_init(ks[4], d, 1),
        "self_attn_inst": fnn.mha_init(ks[5], d),
        "norm1_inst": fnn.norm_init(d),
        "norm2_inst": fnn.norm_init(d),
        "linear1_inst": fnn.linear_init(ks[6], d, d_ffn),
        "linear2_inst": fnn.linear_init(ks[7], d_ffn, d),
        "norm3_inst": fnn.norm_init(d),
    }
    if cfg.use_tca:
        p["temp_attn_inst"] = ms_deform_attn_module_init(ks[8], cfg.inst_attn_cfg)
    return p


def decoder_init(key, cfg: DecoderCfg):
    d = cfg.dim
    ks = jax.random.split(key, cfg.n_layers + 10)
    p = {
        "decoder_norm": fnn.norm_init(d),
        "bbox_embed": fnn.mlp_init(ks[0], d, d, 4, 3),
        "point2pos_proj": fnn.linear_init(ks[1], 2, d),
        "decoder": {"layers": [_layer_init(ks[2 + i], cfg) for i in range(cfg.n_layers)]},
        "rpn_cls_embed": fnn.mlp_init(ks[-5], d, d, cfg.num_classes, 3),
        "cls_embed": fnn.mlp_init(ks[-4], d, d, cfg.num_classes, 3),
        "track_embed": fnn.mlp_init(ks[-3], d, d, cfg.query_embed_dim, 3),
    }
    if cfg.mask_on:
        p["mask_head"] = mask_head_init(ks[-2], cfg.mask_head_cfg)
        p["mask_embed"] = fnn.mlp_init(ks[-1], d, d, cfg.mask_head_cfg.num_gen_params, 3)
    # focal-style bias init for classification heads (reference :76-79)
    bias_value = math.log((1 - 0.01) / 0.01)
    for head in ("cls_embed", "rpn_cls_embed"):
        p[head]["layers"][-1]["bias"] = jnp.full_like(p[head]["layers"][-1]["bias"], -bias_value)
    p["bbox_embed"]["layers"][-1]["bias"] = jnp.zeros_like(p["bbox_embed"]["layers"][-1]["bias"])
    return p


# ---------------------------------------------------------------------------
# query initialization
# ---------------------------------------------------------------------------

def grid_guided_query_selection(cfg: DecoderCfg, rpn_cls_conf):
    """rpn_cls_conf: (BT, H, W, K) logits -> (BT, Q, 2) normalized xy of per-cell peaks."""
    BT, H, W, K = rpn_cls_conf.shape
    nb = cfg.n_query_bins
    max_score = jax.nn.sigmoid(rpn_cls_conf.astype(jnp.float32)).max(axis=-1)  # (BT,H,W)
    H_up = (2 * H // nb + 1) * nb
    W_up = (2 * W // nb + 1) * nb
    up = interpolate_bilinear(max_score, (H_up, W_up))  # (BT,H_up,W_up)
    r, t = H_up // nb, W_up // nb
    cells = up.reshape(BT, nb, r, nb, t).transpose(0, 1, 3, 2, 4).reshape(BT, nb, nb, r * t)
    sel = jnp.argmax(cells, axis=-1)                         # (BT,nb,nb)
    ly, lx = sel // t, sel % t
    cy = jnp.arange(nb)[None, :, None] * r + ly              # (BT,nb,nb)
    cx = jnp.arange(nb)[None, None, :] * t + lx
    qx = cx.astype(jnp.float32) / W_up
    # NOTE: faithful to the reference (transformer_dec.py:106), whose torch.div has no
    # rounding_mode and therefore true-divides: qy = (y + x/W_up) / H_up. The small
    # x-fraction leak into y is part of the trained models' behavior.
    qy = (cy.astype(jnp.float32) + qx) / H_up
    return jnp.stack([qx, qy], axis=-1).reshape(BT, nb * nb, 2)


def inter_frame_query_association(cfg: DecoderCfg, query_init, query_coords,
                                  query_embed, n_frames: int, training: bool):
    """Align per-frame queries to the central frame (reference :111-145).
    query_init (BT,Q,C), query_coords (BT,Q,2), query_embed (BT,Q,Ct)."""
    BT, Q, C = query_init.shape
    if n_frames == 1:
        return query_init, query_coords
    B = BT // n_frames
    ct = (n_frames - 1) // 2
    w = cfg.window_inter_frame_asso if training else cfg.window_inter_frame_asso / 2

    emb = query_embed.reshape(B, n_frames, Q, -1)
    sim = jnp.einsum("btqc,bkc->btqk", emb, emb[:, ct])  # (B,T,Q,K)
    relpos = jnp.asarray(query_relpos_grid(cfg.n_query_bins))  # (Q,K,2)
    neg_inf = jnp.asarray(-jnp.inf, sim.dtype)
    masked = []
    for t in range(n_frames):
        itv = max(t - ct, ct - t)
        mask_t = jnp.any(relpos > w * itv, axis=-1)  # (Q,K)
        masked.append(jnp.where(mask_t[None], neg_inf, sim[:, t]))
    sim = jnp.stack(masked, axis=1).reshape(BT, Q, Q)
    aligned_idx = jnp.argmax(sim, axis=-2)  # (BT,K): best source query per target slot
    q_al = jnp.take_along_axis(query_init, aligned_idx[..., None], axis=1)
    c_al = jnp.take_along_axis(query_coords, aligned_idx[..., None], axis=1)
    return q_al, c_al


def level_slices(spatial_shapes):
    starts, s = [], 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += int(h) * int(w)
    return starts, s


def query_initialization(params, cfg: DecoderCfg, encoded_feat, spatial_shapes,
                         n_frames: int, training: bool):
    """Returns (query (BT,Q,C), query_coords (BT,Q,2), init_aux dict)."""
    BT = encoded_feat.shape[0]
    starts, total = level_slices(spatial_shapes)
    H, W = spatial_shapes[cfg.rpn_level]
    s0 = starts[cfg.rpn_level]
    rpn_feat = jax.lax.dynamic_slice_in_dim(encoded_feat, s0, H * W, axis=1)
    rpn_cls_conf = fnn.mlp(params["rpn_cls_embed"], rpn_feat).reshape(BT, H, W, -1)

    query_coords = grid_guided_query_selection(cfg, rpn_cls_conf)  # (BT,Q,2)
    nb = cfg.n_query_bins
    grid = (2.0 * query_coords - 1.0).reshape(BT, nb, nb, 2)

    # sample encoder features at the selected points on every level, mean over levels
    feats = []
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        f_l = jax.lax.dynamic_slice_in_dim(encoded_feat, starts[l], h_l * w_l, axis=1)
        f_l = f_l.reshape(BT, h_l, w_l, -1)
        feats.append(grid_sample(f_l, grid, padding_mode="border"))
    query_init = jnp.mean(jnp.stack(feats), axis=0).reshape(BT, cfg.n_query, -1)

    query_init_embed = fnn.mlp(params["track_embed"], query_init)  # (BT,Q,Ct)
    query, query_coords_al = inter_frame_query_association(
        cfg, query_init, query_coords, query_init_embed, n_frames, training)

    init_aux = {
        "rpn_sem_cls": rpn_cls_conf,            # (BT,H,W,K) logits
        "query_init_embed": query_init_embed,   # (BT,Q,Ct) pre-association
        "query_coords_grid": grid,              # (BT,nb,nb,2) in [-1,1]
    }
    return query, query_coords_al, init_aux


# ---------------------------------------------------------------------------
# decoder layer
# ---------------------------------------------------------------------------

def _ffn(p, x, suffix="", drop_rate=0.0, rng=None):
    rngs = jax.random.split(rng, 2) if rng is not None else (None,) * 2
    h = jax.nn.gelu(fnn.linear(p["linear1" + suffix], x), approximate=False)
    h = fnn.dropout(h, drop_rate, rngs[0])
    x = x + fnn.dropout(fnn.linear(p["linear2" + suffix], h), drop_rate, rngs[1])
    return fnn.layer_norm(p["norm3" + suffix], x)


def _tca_frames(T: int, n_frames_train: int):
    """Frame subset used by temporal cross-attention (reference :368-372)."""
    ct = (T - 1) // 2
    itv = max(T // n_frames_train, 1)
    start = max(ct - ((n_frames_train - 1) // 2) * itv, 0)
    return list(range(start, T, itv))[:n_frames_train]


def _decoder_layer(p, cfg: DecoderCfg, x, x_pos, x_ref_boxes, x_inst, x_inst_pos,
                   x_inst_ref_boxes, src, spatial_shapes, padding_mask, T: int,
                   drop_rate=0.0, rng=None):
    rngs = jax.random.split(rng, 6) if rng is not None else (None,) * 6
    # ----- box level (per frame, BT batch) -----
    x2 = ms_deform_attn_module(p["cross_attn"], cfg.box_attn_cfg, x + x_pos, x_ref_boxes,
                               src, spatial_shapes, padding_mask)
    x = fnn.layer_norm(p["norm2"], x + fnn.dropout(x2, drop_rate, rngs[0]))
    shortcut_x = x

    q = x + x_pos
    x = fnn.layer_norm(p["norm1"], x + fnn.dropout(
        fnn.mha(p["self_attn"], q, q, x, cfg.n_heads), drop_rate, rngs[1]))
    x = _ffn(p, x, drop_rate=drop_rate, rng=rngs[2])
    shortcut_w = x

    # ----- instance level (per clip, B batch) -----
    BT, Q, C = x.shape
    B = BT // T
    tw = fnn.linear(p["time_weights"], shortcut_w.reshape(B, T, Q, C))  # (B,T,Q,1)
    sx = shortcut_x.reshape(B, T, Q, C)
    # fp32 softmax island (exact no-op on the f32 path)
    x_inst2 = (jax.nn.softmax(tw.astype(jnp.float32), axis=1).astype(sx.dtype)
               * sx).sum(axis=1)  # (B,Q,C)

    if cfg.use_tca:
        frames = _tca_frames(T, cfg.n_frames)
        srcs_t = src.reshape(B, T, -1, C)[:, frames]
        pm_t = padding_mask.reshape(B, T, -1)[:, frames] if padding_mask is not None else None
        if len(frames) < cfg.n_frames:
            pad = cfg.n_frames - len(frames)
            srcs_t = jnp.concatenate([srcs_t] + [srcs_t[:, -1:]] * pad, axis=1)
            if pm_t is not None:
                pm_t = jnp.concatenate([pm_t] + [pm_t[:, -1:]] * pad, axis=1)
        x_inst2 = ms_deform_attn_module(p["temp_attn_inst"], cfg.inst_attn_cfg,
                                        x_inst2 + x_inst_pos, x_inst_ref_boxes,
                                        srcs_t, spatial_shapes, pm_t)
    x_inst = fnn.layer_norm(p["norm2_inst"],
                            x_inst + fnn.dropout(x_inst2, drop_rate, rngs[3]))

    q_inst = x_inst + x_inst_pos
    x_inst = fnn.layer_norm(p["norm1_inst"],
                            x_inst + fnn.dropout(
                                fnn.mha(p["self_attn_inst"], q_inst, q_inst, x_inst,
                                        cfg.n_heads), drop_rate, rngs[4]))
    x_inst = _ffn(p, x_inst, "_inst", drop_rate=drop_rate, rng=rngs[5])
    return x, x_inst


def _clip_ref_boxes(cfg: DecoderCfg, x_ref_boxes, T: int):
    """Circumscribed clip boxes over the central n_frames window (reference :473-480)."""
    BT, Q, _ = x_ref_boxes.shape
    B = BT // T
    ct = (T - 1) // 2
    t0 = max(ct - (cfg.n_frames - 1) // 2, 0)
    t1 = ct + cfg.n_frames
    boxes = x_ref_boxes.reshape(B, T, Q, 4).transpose(0, 2, 1, 3)[:, :, t0:t1]  # (B,Q,t,4)
    boxes = jnp.clip(box_cxcywh_to_xyxy(boxes), 0.0, 1.0)
    circ = jnp.concatenate([boxes[..., :2].min(axis=-2), boxes[..., 2:].max(axis=-2)], axis=-1)
    return box_xyxy_to_cxcywh(circ)  # (B,Q,4)


def decoder_loop(params, cfg: DecoderCfg, x, x_ref_points, src, spatial_shapes,
                 padding_mask, T: int, drop_rate=0.0, rng=None):
    """Returns stacked intermediates: (L+1,BT,Q,C), (L+1,B,Q,C), (L+1,BT,Q,4 cxcywh)."""
    dn = params["decoder_norm"]
    bbox = params["bbox_embed"]
    p2p = params["point2pos_proj"]
    BT, Q, C = x.shape
    B = BT // T
    ct = (T - 1) // 2

    x_ref_boxes = jnp.concatenate([x_ref_points, jnp.full_like(x_ref_points, 0.1)], axis=-1)
    x_inst = x.reshape(B, T, Q, C)[:, ct]

    def refine(x, x_ref_boxes):
        # box path stays fp32 under AMP (x may be bf16): offsets are cast up,
        # positional projections cast back down to the compute dtype
        off = fnn.mlp(bbox, fnn.layer_norm(dn, x)).astype(jnp.float32)
        boxes = jax.nn.sigmoid(off + inverse_sigmoid(x_ref_boxes))
        ref = jax.lax.stop_gradient(boxes)
        return boxes, ref, fnn.linear(p2p, boxes[..., :2]).astype(x.dtype)

    x_boxes, x_ref_boxes, x_pos = refine(x, x_ref_boxes)
    x_inst_ref_boxes = _clip_ref_boxes(cfg, x_ref_boxes, T)
    x_inst_pos = fnn.linear(p2p, x_inst_ref_boxes[..., :2]).astype(x.dtype)

    # scan over the identical layers: one compiled (layer + refine) body instead of
    # n_layers unrolled copies — the decoder graph (box+instance level deform attn
    # per layer) dominated clip-decode compile time when unrolled
    layers = params["decoder"]["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    n_layers = len(layers)
    if rng is not None:
        keys = jnp.stack([jax.random.fold_in(rng, i) for i in range(n_layers)])
        xs_in = (stacked, keys)
    else:
        xs_in = (stacked,)

    def body(carry, xs):
        x, x_inst, x_ref_boxes, x_pos, x_inst_ref_boxes, x_inst_pos = carry
        lp = xs[0]
        lrng = xs[1] if len(xs) > 1 else None
        x, x_inst = _decoder_layer(lp, cfg, x, x_pos, x_ref_boxes, x_inst,
                                   x_inst_pos, x_inst_ref_boxes, src,
                                   spatial_shapes, padding_mask, T, drop_rate,
                                   lrng)
        x_boxes, x_ref_boxes, x_pos = refine(x, x_ref_boxes)
        x_inst_ref_boxes = _clip_ref_boxes(cfg, x_ref_boxes, T)
        x_inst_pos = fnn.linear(p2p, x_inst_ref_boxes[..., :2]).astype(x.dtype)
        carry = (x, x_inst, x_ref_boxes, x_pos, x_inst_ref_boxes, x_inst_pos)
        return carry, (x, x_inst, x_boxes)

    carry0 = (x, x_inst, x_ref_boxes, x_pos, x_inst_ref_boxes, x_inst_pos)
    # remat per layer during training (see encoder_apply); eval takes no grad,
    # so checkpoint is free there
    scan_body = jax.checkpoint(body) if rng is not None else body
    _, (ys_x, ys_inst, ys_boxes) = jax.lax.scan(scan_body, carry0, xs_in)
    inter_x = jnp.concatenate([x[None], ys_x])
    inter_inst = jnp.concatenate([x_inst[None], ys_inst])
    inter_boxes = jnp.concatenate([x_boxes[None], ys_boxes])
    return inter_x, inter_inst, inter_boxes


# ---------------------------------------------------------------------------
# full decoder forward
# ---------------------------------------------------------------------------

def _encoded_to_maps(encoded_feat, spatial_shapes):
    starts, _ = level_slices(spatial_shapes)
    maps = []
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        f = jax.lax.dynamic_slice_in_dim(encoded_feat, starts[l], h_l * w_l, axis=1)
        maps.append(f.reshape(f.shape[0], h_l, w_l, -1))
    return maps


def decoder_apply(params, cfg: DecoderCfg, encoded_feat, padding_mask, spatial_shapes,
                  n_frames: int, training: bool, is_coco: bool = False,
                  with_proto: bool = True, drop_rate=0.0, rng=None):
    """encoded_feat (BT,N,C); padding_mask (BT,N) True=padded; spatial_shapes static.

    training  -> dict with per-layer 'cls' (L,B,Q,K), 'boxes' (L,B,Q,T,4 xyxy),
                 'mask_coeff' (L,B,Q,M), 'proto' (B,h,w,T? ...), plus query-init aux.
    inference -> dict with last-layer 'cls' (B,Q,K) sigmoid, 'mask_coeff', 'query_embed'.
    """
    T = n_frames
    query, query_coords, init_aux = query_initialization(
        params, cfg, encoded_feat, spatial_shapes, T, training)

    inter_x, inter_inst, inter_boxes = decoder_loop(
        params, cfg, query, query_coords, encoded_feat, spatial_shapes, padding_mask,
        T, drop_rate, rng)

    L1, BT, Q, C = inter_x.shape
    B = BT // T
    boxes = box_cxcywh_to_xyxy(
        inter_boxes.reshape(L1, B, T, Q, 4).transpose(0, 1, 3, 2, 4))  # (L,B,Q,T,4)

    dn = params["decoder_norm"]

    if training:
        normed = fnn.layer_norm(dn, inter_inst)
        out = {
            "cls": fnn.mlp(params["cls_embed"], normed),               # (L,B,Q,K) logits
            "boxes": boxes,
            "mask_coeff": jnp.tanh(fnn.mlp(params["mask_embed"], normed)),
            "query_init": init_aux,
            "query_coords": query_coords,
        }
        if with_proto and cfg.mask_on:
            maps = _encoded_to_maps(encoded_feat, spatial_shapes)
            out["proto"] = mask_head_apply(params["mask_head"], cfg.mask_head_cfg,
                                           maps[2], [maps[1], maps[0]])  # (BT,h4,w4,M)
        return out

    last = fnn.layer_norm(dn, inter_inst[-1])
    out = {"cls": jax.nn.sigmoid(fnn.mlp(params["cls_embed"], last))}
    if is_coco:
        maps = _encoded_to_maps(encoded_feat, spatial_shapes)
        proto = mask_head_apply(params["mask_head"], cfg.mask_head_cfg,
                                maps[2], [maps[1], maps[0]])              # (T,h4,w4,M)
        coeff = jnp.tanh(fnn.mlp(params["mask_embed"], last))             # (B,Q,M)
        out["masks"] = jnp.einsum("bqm,thwm->bqthw", coeff, proto)
        out["boxes"] = boxes[-1]
    else:
        out["mask_coeff"] = jnp.tanh(fnn.mlp(params["mask_embed"], last))
        out["query_embed"] = inter_inst[-1]
    return out
