"""Matchers, fixed-shape and jit-compatible.

Behavioral spec: /root/reference/mdqe/models/matcher.py.
  - hungarian_match_costs + dynamic_k_matching (:69-235): one-to-many dynamic-k
    assignment (IDOL-style): cost = class + 2*(L1+GIoU video boxes) + 4*(BCE+dice
    pairwise mask costs), gated by in-box/in-center tests; top-10-IoU-sum dynamic k;
    conflict resolution; >=1 query per GT guarantee.
  - clip_peak_match (:238-337): per-pixel GT assignment on the stride-8 map for
    query-init supervision (area-sorted sequential assignment with blocking).

TPU redesign: the reference's data-dependent loops become fixed-iteration masked
loops (bounded by the padded instance capacity), and per-video lists become a dense
(Q, N) assignment matrix; invalid GT slots are masked with +inf cost. All functions
operate on a single video and are vmapped over the batch by the criterion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.boxes import box_xyxy_to_cxcywh, video_generalized_box_iou, video_box_iou

INF = 1e5
BIG = 1e9


def batch_dice_cost(inputs, targets, compute_dtype=jnp.float32):
    """inputs (Q, THW) logits, targets (N, THW) float -> (Q, N) f32.
    compute_dtype=bfloat16 runs the big (Q,THW)x(THW,N) matmuls in bf16 with
    fp32 accumulation (AMP); reductions are always fp32."""
    p = jax.nn.sigmoid(inputs.astype(compute_dtype))
    t = targets.astype(compute_dtype)
    num = 2.0 * jnp.einsum("qp,np->qn", p, t,
                           preferred_element_type=jnp.float32)
    den = p.sum(-1, dtype=jnp.float32)[:, None]         + t.sum(-1, dtype=jnp.float32)[None]
    return 1.0 - (num + 1.0) / (den + 1.0)


def batch_sigmoid_ce_cost(inputs, targets, compute_dtype=jnp.float32):
    """inputs (Q, THW) logits, targets (N, THW) float -> (Q, N) f32 mean BCE."""
    x = inputs.astype(compute_dtype)
    t = targets.astype(compute_dtype)
    thw = x.shape[1]
    # BCE(x, 1) = softplus(-x); BCE(x, 0) = softplus(x)
    pos = jax.nn.softplus(-x)
    neg = jax.nn.softplus(x)
    return (jnp.einsum("qp,np->qn", pos, t, preferred_element_type=jnp.float32)
            + jnp.einsum("qp,np->qn", neg, 1.0 - t,
                         preferred_element_type=jnp.float32)) / thw


def get_in_boxes_info(boxes, gt_boxes, expanded_strides=32):
    """boxes (Q,T,4) xyxy, gt_boxes (N,T,4). Returns in_box_anchor (Q,T) bool
    (reference matcher.py:69-97; the per-gt variant is unused by the caller)."""
    gt_c = box_xyxy_to_cxcywh(gt_boxes)
    c = box_xyxy_to_cxcywh(boxes)
    ax = c[..., 0][:, None]  # (Q,1,T)
    ay = c[..., 1][:, None]
    in_boxes = ((ax > gt_boxes[None, :, :, 0]) & (ax < gt_boxes[None, :, :, 2])
                & (ay > gt_boxes[None, :, :, 1]) & (ay < gt_boxes[None, :, :, 3]))
    r = 2.5 / expanded_strides
    in_centers = ((ax > gt_c[None, :, :, 0] - r) & (ax < gt_c[None, :, :, 0] + r)
                  & (ay > gt_c[None, :, :, 1] - r) & (ay < gt_c[None, :, :, 1] + r))
    return jnp.any(in_boxes, 1) | jnp.any(in_centers, 1)  # (Q,T)


def dynamic_k_matching(cost, ious, gt_valid, n_candidate_k=10):
    """cost (Q,N), ious (Q,N) in [0,1], gt_valid (N,) bool.
    Returns assignment matrix (Q,N) in {0,1} with rows summing to <=1 and every valid
    gt having >=1 query (when enough queries exist)."""
    Q, N = cost.shape
    cost = jnp.where(gt_valid[None], cost, INF * 10)
    ious = jnp.where(gt_valid[None], jnp.clip(ious, 0.0, None), 0.0)

    k = min(n_candidate_k, Q)
    topk_ious = jax.lax.top_k(ious.T, k)[0]           # (N, k)
    dynamic_ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 2, None)  # (N,)

    # per-gt top-k lowest-cost queries: rank by cost within each column
    order = jnp.argsort(cost, axis=0)                  # (Q,N)
    rank = jnp.argsort(order, axis=0)
    matching = (rank < dynamic_ks[None]) & gt_valid[None]

    def resolve(m):
        """queries matched to >1 gt keep only their min-cost gt (reference :118-123)."""
        over = m.sum(1) > 1
        best = jnp.argmin(cost, axis=1)  # reference: argmin over full cost row
        keep = jax.nn.one_hot(best, N, dtype=bool)
        return jnp.where(over[:, None], keep, m)

    matching = resolve(matching)

    # guarantee >=1 query per valid gt (reference :126-137), bounded loop
    def body(_, carry):
        m, c = carry
        unmatched_gt = (m.sum(0) == 0) & gt_valid
        free_q = m.sum(1) == 0
        need = jnp.any(unmatched_gt) & jnp.any(free_q)

        c2 = jnp.where((~free_q)[:, None], c + INF, c)
        pick = jnp.argmin(jnp.where(unmatched_gt[None], c2, INF * 100), axis=0)  # (N,)
        add = jax.nn.one_hot(pick, m.shape[0], dtype=bool).T & unmatched_gt[None]
        m2 = resolve(m | add)
        m2 = jnp.where(need, m2, m)
        c2 = jnp.where(need, c2, c)
        return m2, c2

    matching, _ = jax.lax.fori_loop(0, N, body, (matching, cost))
    return matching.astype(jnp.float32)


def hungarian_match_costs(out_prob, out_boxes, out_masks, tgt_labels, tgt_boxes,
                          tgt_match_masks, gt_valid,
                          compute_dtype=jnp.float32):
    """Single-video cost assembly (reference :179-232).

    out_prob (Q,K) sigmoid; out_boxes (Q,T,4) xyxy; out_masks (Q,T,h,w) logits;
    tgt_labels (N,); tgt_boxes (N,T,4); tgt_match_masks (N,T,h,w); gt_valid (N,).
    Returns (cost (Q,N), giou_iou (Q,N))."""
    Q, K = out_prob.shape
    N = tgt_labels.shape[0]
    labels = jnp.clip(tgt_labels, 0, K - 1)
    cost_class = -out_prob[:, labels]                             # (Q,N)

    tm = tgt_match_masks.reshape(N, -1).astype(compute_dtype)
    om = out_masks.reshape(Q, -1)
    cost_mask = batch_sigmoid_ce_cost(om, tm, compute_dtype) \
        + batch_dice_cost(om, tm, compute_dtype)

    gt_wh = box_xyxy_to_cxcywh(tgt_boxes)[..., 2:]
    valid_box = jnp.all(gt_wh > 0, -1)                            # (N,T)
    cost_l1 = jnp.abs(out_boxes.reshape(Q, 1, -1)
                      - tgt_boxes.reshape(1, N, -1)).sum(-1)      # cdist p=1 on (T*4)
    giou = video_generalized_box_iou(out_boxes, tgt_boxes, valid_box)  # (Q,N)
    cost_bbox = cost_l1 + (1.0 - giou)

    in_boxes = get_in_boxes_info(out_boxes, tgt_boxes)            # (Q,T)
    C = cost_class + 2.0 * cost_bbox + 4.0 * cost_mask
    C = jnp.where(jnp.isfinite(C), C, 1000.0)
    C = C + 100.0 * (~in_boxes).sum(-1)[:, None]
    return C, giou


def clip_peak_match(gt_labels, gt_boxes, gt_ids, gt_masks8, gt_valid, ref_points,
                    num_classes: int):
    """Per-pixel GT assignment on the stride-8 map (reference :238-337), one video.

    gt_labels (N,); gt_boxes (N,T,4) xyxy; gt_ids (N,T); gt_masks8 (N,T,P) bool
    (already downsampled to the rpn map and flattened); gt_valid (N,);
    ref_points (P,2) normalized centers.
    Returns (labels (T,P) int, dist_weight (T,P,K), ids (T,P) int)."""
    N, T, P = gt_masks8.shape
    boxes_c = box_xyxy_to_cxcywh(gt_boxes)
    area = jnp.where(gt_valid, boxes_c[..., 2:].prod(-1).mean(-1), BIG)
    order = jnp.argsort(area)  # ascending area, invalid last

    labels_s = gt_labels[order].astype(jnp.int32)
    boxes_s = boxes_c[order]
    ids_s = gt_ids[order].astype(jnp.int32)
    masks_s = gt_masks8[order]
    valid_s = gt_valid[order] & jnp.all(boxes_s[..., 2:] > 0, -1).any(-1) \
        & (labels_s >= 0)

    d = (boxes_s[:, :, None, :2] - ref_points[None, None]) \
        / jnp.clip(boxes_s[:, :, None, 2:], 0.05, None)
    dist0 = jnp.sum(d * d, axis=-1)  # (N,T,P)

    def per_frame(t):
        def body(n, carry):
            labels_t, weight_t, ids_t, dist_t = carry   # (P,), (P,K), (P,), (N,P)
            use = valid_s[n] & (ids_s[n, t] != -1)

            mask_px = masks_s[n, t]                     # (P,) bool
            has_mask = jnp.any(mask_px)
            nearest = jnp.argmin(dist_t[n])
            pos = jnp.where(has_mask, mask_px,
                            jax.nn.one_hot(nearest, P, dtype=bool))
            pos = pos & use

            lbl = jnp.clip(labels_s[n], 0, num_classes - 1)
            w = 1.0 - 2.0 * jnp.clip(dist_t[n], 0.0, 0.5)
            labels_t = jnp.where(pos, lbl, labels_t)
            ids_t = jnp.where(pos, ids_s[n, t], ids_t)
            # write only this instance's class channel (reference matcher.py:332
            # assigns matched_dist[t, pos, label_n]); other channels keep earlier
            # instances' weights
            onehot = jax.nn.one_hot(lbl, num_classes, dtype=jnp.float32)
            sel = pos[:, None] & (onehot[None] > 0)
            weight_t = jnp.where(sel, w[:, None], weight_t)
            dist_t = jnp.where(pos[None, :], BIG, dist_t)
            return labels_t, weight_t, ids_t, dist_t

        init = (jnp.full((P,), -1, jnp.int32),
                jnp.zeros((P, num_classes), jnp.float32),
                jnp.full((P,), -1, jnp.int32),
                dist0[:, t])
        labels_t, weight_t, ids_t, _ = jax.lax.fori_loop(0, N, body, init)
        return labels_t, weight_t, ids_t

    labels, weights, ids = jax.vmap(per_frame)(jnp.arange(T))
    return labels, weights, ids
