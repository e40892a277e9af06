"""Data-parallel training: global-batch jit over a 1-D device mesh.

Behavioral spec: the reference trains with multi-process DDP (train_net.py:261-271,
D2 DefaultTrainer) — gradient all-reduce, `all_reduce(num_masks)` in the loss
(criterion.py:354-358), AdamW with backbone-LR x0.1 and full-model grad-norm clip
0.01 (train_net.py:118-165), WarmupMultiStep LR.

TPU-native equivalent: one jitted global-batch train step over
Mesh(jax.devices(), ('data',)) with batch inputs sharded on the leading axis and
params replicated; XLA inserts the gradient all-reduce (psum over ICI) and makes the
num_masks normalization global automatically. No hand-written collectives needed —
exactly the scaling-book recipe (mesh + shardings, compiler-inserted collectives).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.criterion import CriterionCfg, criterion_apply
from ..models.decoder import query_relpos_grid
from ..models.detr import MDQEModelCfg, detr_apply_backbone
from ..utils.misc import interpolate_bilinear


@dataclass(frozen=True)
class TrainCfg:
    base_lr: float = 1e-4
    weight_decay: float = 1e-4
    backbone_multiplier: float = 0.1
    clip_norm: float = 0.01
    steps: Tuple[int, ...] = (10000,)
    max_iter: int = 12000
    warmup_iters: int = 10
    warmup_factor: float = 1.0
    gamma: float = 0.1
    # D2 MODEL.BACKBONE.FREEZE_AT (default 2, inherited by the reference's
    # configs): 1 freezes the ResNet stem, 2 stem+res2 — those parameters have
    # requires_grad=False in the reference and never reach the optimizer OR
    # the full-model grad-norm clip
    freeze_at: int = 2
    # bf16 backbone+encoder+decoder and bf16-matmul criterion with fp32
    # islands/accumulation (reference SOLVER.AMP.ENABLED)
    amp: bool = False


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def frozen_leaf_mask(params, freeze_at: int = 0):
    """Bool pytree marking leaves the reference NEVER optimizes — torch buffers
    and requires_grad=False parameters (train_net.py:123-124 iterates
    named_parameters and skips non-grad ones):

      - FrozenBN stats (weight/bias/running_mean/running_var are all buffers
        in D2's FrozenBatchNorm2d)
      - the decoder deform-attn's fixed rotational sampling grid
        (register_buffer, ms_deform_attn.py:95-96) and lvl_spatial_scales
      - with freeze_at>0, the D2-frozen ResNet stages (1: stem, 2: stem+res2)

    Used both to zero these leaves' grads BEFORE the full-model clip (so the
    global norm matches the reference, where frozen params contribute no
    grads at all) and to route them to a no-op optimizer transform (so AdamW
    weight decay never shrinks a buffer)."""
    frozen_stages = ("stem", "res2")[:max(min(int(freeze_at), 2), 0)]

    def all_true(t):
        return jax.tree.map(lambda _: True, t)

    def walk(node, in_backbone):
        if isinstance(node, dict):
            if "running_mean" in node:  # a FrozenBN stats dict
                return all_true(node)
            out = {}
            for k, v in node.items():
                if k == "lvl_spatial_scales" or (
                        k == "sampling_offsets" and not isinstance(v, dict)):
                    out[k] = all_true(v)
                elif in_backbone and k in frozen_stages:
                    out[k] = all_true(v)
                else:
                    out[k] = walk(v, in_backbone or k == "backbone")
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, in_backbone) for v in node)
        return False

    return walk(params, False)


def make_optimizer(tc: TrainCfg) -> optax.GradientTransformation:
    def lr_schedule(step):
        lr = tc.base_lr
        warm = jnp.where(step < tc.warmup_iters,
                         tc.warmup_factor + (1 - tc.warmup_factor)
                         * step / max(tc.warmup_iters, 1), 1.0)
        decay = 1.0
        for s in tc.steps:
            decay = decay * jnp.where(step >= s, tc.gamma, 1.0)
        return lr * warm * decay

    def group_labels(params):
        frozen = frozen_leaf_mask(params, tc.freeze_at)
        is_backbone = jax.tree_util.tree_map_with_path(
            lambda path, _: bool(path and getattr(path[0], "key", None)
                                 == "backbone"),
            params)
        return jax.tree.map(
            lambda f, b: "frozen" if f else ("backbone" if b else "rest"),
            frozen, is_backbone)

    tx = optax.multi_transform(
        {"backbone": optax.adamw(lambda s: tc.backbone_multiplier * lr_schedule(s),
                                 weight_decay=tc.weight_decay),
         "rest": optax.adamw(lr_schedule, weight_decay=tc.weight_decay),
         # buffers / frozen stages: no update, no weight decay (reference
         # excludes them from the optimizer entirely)
         "frozen": optax.set_to_zero()},
        group_labels)
    # zero frozen-leaf grads FIRST so the full-model global-norm clip sees the
    # same norm the reference computes (frozen params contribute no grads
    # there), then clip, then the per-group transforms
    chain = [optax.masked(optax.set_to_zero(),
                          lambda p: frozen_leaf_mask(p, tc.freeze_at))]
    if tc.clip_norm > 0:
        chain.append(optax.clip_by_global_norm(tc.clip_norm))
    return optax.chain(*chain, tx)


def prepare_targets_device(masks_full, padded_hw, match_stride: int):
    """masks_full (B,N,T,Hp,Wp) float or bool -> (match_masks (B,N,T,h4,w4),
    masks8 flat (B,N,T,P8) bool) — the reference's prepare_targets mask transforms
    (mdqe.py:276-281) plus the peak matcher's stride-8 downsample (matcher.py:281)."""
    Hp, Wp = padded_hw
    h4, w4 = -(-Hp // match_stride), -(-Wp // match_stride)
    h8, w8 = -(-Hp // 8), -(-Wp // 8)
    masks_full = masks_full.astype(jnp.float32)  # bool over the wire
    match_masks = interpolate_bilinear(masks_full, (h4, w4))
    masks8 = interpolate_bilinear(masks_full, (h8, w8)) > 0.5
    B, N, T = masks8.shape[:3]
    return match_masks, masks8.reshape(B, N, T, h8 * w8)


def make_train_step(model_cfg: MDQEModelCfg, crit_cfg: CriterionCfg, tx,
                    match_stride: int = 4, dropout_rate: float = 0.1,
                    pixel_mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
                    pixel_std: Tuple[float, ...] = (58.395, 57.12, 57.375),
                    amp: bool = False):
    """Returns train_step(params, opt_state, batch, rng) -> (params, opt_state,
    total_loss, loss_dict). Jit with donated params/opt_state.

    Images arrive RAW (uint8 RGB from the loader) and are normalized on device
    (reference preprocess_image, mdqe.py:473-484) — the uint8 wire format is 4x
    cheaper to ship to a tunneled chip than pre-normalized f32."""
    relpos = jnp.asarray(query_relpos_grid(
        int(round(crit_cfg.n_query ** 0.5))))
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)

    def loss_fn(params, batch, rng):
        T = crit_cfg.n_frames
        drop_rng = jax.random.fold_in(rng, 999)
        images = (batch["images"].astype(jnp.float32) - mean) / std
        out = detr_apply_backbone(params, model_cfg, images,
                                  batch["image_sizes"], n_frames=T, training=True,
                                  drop_rate=dropout_rate, rng=drop_rng, amp=amp)
        match_masks, masks8 = prepare_targets_device(
            batch["masks"], batch["images"].shape[1:3], match_stride)
        targets = {
            "labels": batch["labels"], "ids": batch["ids"], "boxes": batch["boxes"],
            "valid": batch["valid"], "match_masks": match_masks, "masks8": masks8,
        }
        total, ldict = criterion_apply(crit_cfg, out, targets, relpos, rng,
                                       amp=amp)
        return total, ldict

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        (total, ldict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, ldict

    return train_step


def shard_batch(batch, mesh: Mesh):
    """Place batch arrays with the leading axis sharded over the 'data' mesh axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
