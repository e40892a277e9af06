"""Inner detection model: backbone + input projections + encoder + decoder with the
three-phase API used by windowed VIS inference.

Behavioral spec: /root/reference/mdqe/models/mdqe.py:14-117 (forward,
forward_pre_backbone, forward_deformable_enc, forward_mask_head_inference) and the
MaskedBackbone+Joiner wrapper (/root/reference/mdqe/mdqe.py:22-57,
models/backbone.py:96-109).

TPU design: images arrive as a fixed-shape padded batch (BT, Hp, Wp, 3) plus true
per-frame sizes (BT, 2); padding masks per level are computed from the sizes with
static shapes. Everything is jit-compatible with shapes as compile-time constants.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils import nn as fnn
from ..utils.misc import interpolate_nearest
from .resnet import resnet_apply, resnet_init
from .encoder import EncoderCfg, encoder_apply, encoder_init, flatten_levels
from .decoder import DecoderCfg, decoder_apply, decoder_init, _encoded_to_maps
from .mask_head import mask_head_apply


@dataclass(frozen=True)
class MDQEModelCfg:
    backbone: str = "resnet50"  # resnet50/resnet101 or swin_{tiny,small,base,large}
    swin: "object" = None       # optional SwinCfg override (presets otherwise)
    num_classes: int = 80
    hidden_dim: int = 256
    n_heads: int = 8
    n_feature_levels: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    enc_points: int = 4
    dec_points: int = 4
    n_frames: int = 1
    n_query: int = 196
    query_embed_dim: int = 64
    window_inter_frame_asso: int = 5
    mlp_ratio: float = 4.0
    dec_temporal: bool = True
    mask_on: bool = True

    @property
    def backbone_channels(self) -> Tuple[int, ...]:
        if self.backbone.startswith("resnet"):
            return (512, 1024, 2048)  # res3, res4, res5
        if self.backbone.startswith("swin"):
            sc = self.swin_cfg
            return tuple(sc.stage_dim(i) for i in sc.emit_stages)
        raise ValueError(self.backbone)

    @property
    def swin_cfg(self):
        from .swin import SWIN_PRESETS
        if self.swin is not None:
            return self.swin
        return SWIN_PRESETS[self.backbone[len("swin_"):]]

    @property
    def feature_strides(self) -> Tuple[int, ...]:
        if self.backbone.startswith("swin"):
            sc = self.swin_cfg
            return tuple(sc.patch_size * 2 ** i for i in sc.emit_stages)
        return (8, 16, 32)

    @property
    def encoder_cfg(self) -> EncoderCfg:
        return EncoderCfg(self.hidden_dim, self.n_heads, self.n_feature_levels,
                          self.enc_points, self.enc_layers, self.mlp_ratio)

    @property
    def decoder_cfg(self) -> DecoderCfg:
        return DecoderCfg(self.num_classes, self.hidden_dim, self.n_heads,
                          self.n_feature_levels, self.n_frames, self.dec_points,
                          self.dec_layers, self.mlp_ratio, self.n_query,
                          self.query_embed_dim, self.window_inter_frame_asso,
                          use_tca=self.dec_temporal, mask_on=self.mask_on)


def detr_init(key, cfg: MDQEModelCfg):
    kb, kp, ke, kd = jax.random.split(key, 4)
    if cfg.backbone.startswith("resnet"):
        depth = int(cfg.backbone[len("resnet"):])
        backbone = resnet_init(kb, depth)
    elif cfg.backbone.startswith("swin"):
        from .swin import swin_init
        backbone = swin_init(kb, cfg.swin_cfg)
    else:
        raise ValueError(cfg.backbone)

    # input projections: 1x1 conv + GN(32) per backbone level; extra pyramid level
    # via 3x3 stride-2 conv from the last backbone feature (models/mdqe.py:32-45)
    chans = list(cfg.backbone_channels)
    proj = []
    kproj = jax.random.split(kp, cfg.n_feature_levels)
    for i in range(cfg.n_feature_levels):
        if i < len(chans):
            conv = fnn.conv_init(kproj[i], chans[i], cfg.hidden_dim, 1)
        else:
            conv = fnn.conv_init(kproj[i], chans[-1], cfg.hidden_dim, 3)
        proj.append({"conv": conv, "gn": fnn.norm_init(cfg.hidden_dim)})

    return {
        "backbone": backbone,
        "input_proj": proj,
        "transformer_enc": encoder_init(ke, cfg.encoder_cfg),
        "transformer_dec": decoder_init(kd, cfg.decoder_cfg),
    }


def padding_masks(image_sizes, padded_hw: Tuple[int, int], strides: Sequence[int]):
    """image_sizes (BT, 2) true [h, w]; returns per-stride (BT, Hs, Ws) bool masks
    (True on padded pixels), matching MaskedBackbone.mask_out_padding's ceil(h/s)."""
    masks = []
    Hp, Wp = padded_hw
    h = image_sizes[:, 0][:, None]
    w = image_sizes[:, 1][:, None]
    for s in strides:
        Hs, Ws = -(-Hp // s), -(-Wp // s)
        vr = -(-h // s)  # ceil
        vc = -(-w // s)
        rows = jnp.arange(Hs)[None] >= vr  # (BT,Hs) True past the valid rows
        cols = jnp.arange(Ws)[None] >= vc
        masks.append(rows[:, :, None] | cols[:, None, :])
    return masks


def detr_backbone_features(params, cfg: MDQEModelCfg, images, image_sizes,
                           rng=None):
    """images (BT,Hp,Wp,3) normalized NHWC; image_sizes (BT,2).
    Returns (srcs, masks, pos): per-level projected features, padding masks, sine pos.
    rng != None enables Swin stochastic depth (training)."""
    # remat the backbone for backward: its stem/res2 activations are ~GBs at
    # train geometry and storing them contributes to HBM spilling; recomputing
    # the whole backbone costs a few ms (free under eval-only jits)
    if cfg.backbone.startswith("resnet"):
        feats = jax.checkpoint(resnet_apply)(params["backbone"], images)
        feat_list = [feats["res3"], feats["res4"], feats["res5"]]
    else:
        from .swin import swin_apply
        if rng is None:
            feat_list = jax.checkpoint(
                lambda p, x: swin_apply(p, x, cfg.swin_cfg))(params["backbone"],
                                                             images)
        else:
            feat_list = jax.checkpoint(
                lambda p, x, r: swin_apply(p, x, cfg.swin_cfg, rng=r))(
                    params["backbone"], images, rng)

    strides = list(cfg.feature_strides)
    extra_levels = cfg.n_feature_levels - len(feat_list)
    for i in range(extra_levels):
        strides.append(strides[-1] * 2)
    masks = padding_masks(image_sizes, images.shape[1:3], strides)

    srcs = []
    for i in range(cfg.n_feature_levels):
        p = params["input_proj"][i]
        if i < len(feat_list):
            x = fnn.conv2d(p["conv"], feat_list[i], stride=1, padding=0)
        else:
            base = feat_list[-1] if i == len(feat_list) else srcs[-1]
            x = fnn.conv2d(p["conv"], base, stride=2, padding=1)
        srcs.append(fnn.group_norm(p["gn"], x, 32))

    n_steps = cfg.hidden_dim // 2
    pos = [fnn.position_embedding_sine(~m, n_steps).astype(images.dtype) for m in masks]
    return srcs, masks, pos


def detr_encode(params, cfg: MDQEModelCfg, images, image_sizes, drop_rate=0.0,
                rng=None):
    """backbone + input projections + deformable encoder for a (window of) frames.
    Returns (encoded (BT,N,C), mask_flat (BT,N), spatial_shapes)."""
    bb_rng = jax.random.fold_in(rng, 17) if rng is not None else None
    srcs, masks, pos = detr_backbone_features(params, cfg, images, image_sizes,
                                              bb_rng)
    encoded = encoder_apply(params["transformer_enc"], cfg.encoder_cfg, srcs, masks,
                            pos, drop_rate, rng)
    _, mask_flat, _, spatial_shapes = flatten_levels(srcs, masks, None)
    return encoded, mask_flat, spatial_shapes


def detr_mask_feats(params, cfg: MDQEModelCfg, encoded, spatial_shapes):
    """Proto mask features for a window: (BT, H4, W4, M)."""
    maps = _encoded_to_maps(encoded, spatial_shapes)
    dcfg = cfg.decoder_cfg
    return mask_head_apply(params["transformer_dec"]["mask_head"], dcfg.mask_head_cfg,
                           maps[2], [maps[1], maps[0]])


def detr_apply_backbone(params, cfg: MDQEModelCfg, images, image_sizes,
                        n_frames: int, training: bool, is_coco: bool = False,
                        drop_rate: float = 0.0, rng=None, amp: bool = False):
    """Full forward: encode + decode. Returns the decoder output dict.
    drop_rate/rng enable the reference's 0.1 transformer dropout during training.

    amp=True runs backbone + input projections + encoder AND the decoder in
    bf16 — the TPU analog of the reference's SOLVER.AMP autocast training.
    DELIBERATE TPU-SPECIFIC DEVIATION from the reference's autocast scope:
    under CUDA autocast the reference forces the WHOLE deform-attn forward
    (@autocast(enabled=False) on ms_deform_attn.py:118 spatial_forward and
    :175 temporal_clip_forward), the whole decoder (transformer_dec.py:446),
    the matcher (matcher.py:196) and the losses' .float() casts to fp32. On
    this TPU, f32-input matmuls already execute as bf16 MXU passes, so
    keeping those modules f32 buys no accuracy at real bandwidth cost;
    instead we run their matmuls in bf16 and keep NARROW fp32 islands where
    low precision actually changes results: the box-refinement path
    (inverse_sigmoid + reference points), sampling-location/attention-weight
    construction, softmaxes, norm statistics, matcher assignment costs and
    the reid loss (criterion.py:540). bf16-vs-f32 forward closeness is
    gated by tests/test_model_forward.py::test_amp_forward_close_to_f32;
    the deviation is also recorded in README.md and PARITY.md. Params stay
    fp32 masters; the cast is differentiable so grads accumulate in fp32."""
    enc_rng = jax.random.fold_in(rng, 1) if rng is not None else None
    dec_rng = jax.random.fold_in(rng, 2) if rng is not None else None
    p = params
    if amp:
        images = images.astype(jnp.bfloat16)
        p = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)
    encoded, mask_flat, spatial_shapes = detr_encode(p, cfg, images, image_sizes,
                                                     drop_rate, enc_rng)
    if not amp:
        encoded = encoded.astype(jnp.float32)
    return decoder_apply(p["transformer_dec"], cfg.decoder_cfg, encoded, mask_flat,
                         spatial_shapes, n_frames, training, is_coco=is_coco,
                         drop_rate=drop_rate, rng=dec_rng)
