"""Training criterion: query-init losses + hungarian (dynamic-k) losses over the
final and auxiliary decoder layers.

Behavioral spec: /root/reference/mdqe/models/criterion.py:278-602, with loss weights
from mdqe/mdqe.py:160-162 (sem_cls_init 2, cls 2, bbox/giou 2, mask 4, dice 4,
unlisted x0.5) and num_masks normalized across the data-parallel batch
(criterion.py:354-358 — here the global-batch jit formulation makes that sum global
automatically, no explicit collective needed).

TPU redesign highlights:
  - matching and all mask losses are linear in the (Q,N) assignment matrix, so every
    mask loss is expressed as (Q,THW)x(THW,N) matmuls (MXU) contracted with the
    assignment — the reference's per-matched-pair gather/stack never materializes.
  - the contrastive reid loss's randperm sampling becomes masked top-k over random
    priorities with fixed caps (50T negatives / 10T positives per instance).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils.boxes import box_xyxy_to_cxcywh, video_box_iou
from ..utils.misc import grid_sample
from .matcher import (clip_peak_match, dynamic_k_matching, hungarian_match_costs,
                      batch_dice_cost, batch_sigmoid_ce_cost)


@dataclass(frozen=True)
class CriterionCfg:
    num_classes: int = 25
    eos_coef: float = 1.0
    n_frames: int = 4
    n_query: int = 196
    window_inter_frame_asso: int = 5
    interinst_enabled: bool = True
    interinst_threshold: float = 0.1
    num_points: int = 12544
    box_weight: float = 2.0
    mask_weight: float = 4.0
    dice_weight: float = 4.0
    sem_cls_weight: float = 2.0
    cls_weight: float = 2.0
    aux_weight: float = 0.5  # weight for losses not in the dict (reid losses)


# ---------------------------------------------------------------------------
# elementary losses
# ---------------------------------------------------------------------------

def sigmoid_focal_loss(logits, targets, no_obj_weight, alpha=0.25, gamma=2.0):
    """(BQ, K) focal with per-query no-object down-weight (criterion.py:152-188)."""
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jax.nn.softplus(x) - x * targets  # BCE-with-logits
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * loss
    is_obj = jnp.any(targets > 0, -1)
    weight = is_obj + no_obj_weight * (~is_obj)
    return (loss.sum(-1) * weight).sum() / jnp.clip(weight.sum(), 1.0, None)


def weighted_sigmoid_focal_loss(logits, targets, dist_weight, num_boxes,
                                alpha=2.0, gamma=2.0):
    """Point-sampled query-init semantic loss (criterion.py:196-231).
    logits/targets/dist_weight (BT, P, K); num_boxes (BT,)."""
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jax.nn.softplus(x) - x * targets
    p_t = (1 - p) * targets + p * (1 - targets)
    loss = ce * p_t ** alpha
    gamma_t = dist_weight * targets + (1 - dist_weight) * (1 - targets)
    loss = loss * gamma_t ** gamma
    return (loss.sum((-2, -1)) / num_boxes).mean()


# ---------------------------------------------------------------------------
# per-layer hungarian losses (single video; vmapped over batch)
# ---------------------------------------------------------------------------

def _per_video_layer(cfg: CriterionCfg, cls_logits, boxes, coeff, proto, tgt,
                     amp: bool = False):
    """cls_logits (Q,K); boxes (Q,T,4); coeff (Q,M); proto (T,h,w,M); tgt dict.
    Returns partial sums (to be combined over the batch) + assignment stats.

    amp=True keeps the big (Q,THW) mask tensors and their (Q,THW)x(THW,N)
    matmuls in bf16 with fp32 accumulations/reductions (every .sum over THW is
    explicitly fp32); the box/class terms and all final sums stay fp32. The
    f32 path is bit-identical to the pre-AMP code."""
    cdt = jnp.bfloat16 if amp else jnp.float32
    Q, K = cls_logits.shape
    T = boxes.shape[1]
    boxes = boxes.astype(jnp.float32)
    prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    out_masks = jnp.einsum("qm,thwm->qthw", coeff.astype(cdt),
                           proto.astype(cdt),
                           preferred_element_type=jnp.float32
                           ).astype(cdt)  # (Q,T,h,w)

    gt_valid = tgt["valid"]
    N = gt_valid.shape[0]
    cost, giou = hungarian_match_costs(prob, boxes, out_masks, tgt["labels"],
                                       tgt["boxes"], tgt["match_masks"], gt_valid,
                                       compute_dtype=cdt)
    A = jax.lax.stop_gradient(dynamic_k_matching(cost, giou, gt_valid))  # (Q,N)

    num_matched = A.sum()
    matched_q = A.sum(1)  # (Q,) 0/1

    # ---- classification (focal) ----
    labels_oh = jax.nn.one_hot(jnp.clip(tgt["labels"], 0, K - 1), K, dtype=jnp.float32) \
        * gt_valid[:, None]
    target_classes = A @ labels_oh  # (Q,K)

    # ---- boxes ----
    gt_wh = box_xyxy_to_cxcywh(tgt["boxes"])[..., 2:]
    valid_ft = jnp.all(gt_wh > 0, -1) & gt_valid[:, None]  # (N,T)
    l1_pair = (jnp.abs(boxes[:, None] - tgt["boxes"][None]).sum(-1)
               * valid_ft[None]).sum(-1)  # (Q,N)
    loss_bbox_sum = (A * l1_pair).sum()

    iou, inter, union = video_box_iou(boxes, tgt["boxes"])  # (Q,N,T)
    lt = jnp.minimum(boxes[:, None, :, :2], tgt["boxes"][None, :, :, :2])
    rb = jnp.maximum(boxes[:, None, :, 2:], tgt["boxes"][None, :, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    giou_ft = jnp.where(inter > 0,
                        inter / jnp.clip(union, 1e-3, None)
                        - (area - union) / jnp.clip(area, 1e-3, None), 0.0)
    loss_giou_sum = (A[:, :, None] * (1.0 - giou_ft) * valid_ft[None]).sum()

    # ---- masks (+ optional inter-instance repulsion) ----
    tm = (tgt["match_masks"].astype(cdt)
          * gt_valid[:, None, None, None].astype(cdt)).reshape(N, -1)  # (N,THW)
    om = out_masks.reshape(Q, -1)
    thw = om.shape[1]
    pos = jax.nn.softplus(-om)
    neg = jax.nn.softplus(om)
    mm = lambda a, b: jnp.einsum("qp,np->qn", a, b,
                                 preferred_element_type=jnp.float32)

    if cfg.interinst_enabled:
        # neighbor union (incl self) per gt: video-box-IoU (wh clamped) > threshold
        b = tgt["boxes"]
        wh_c = jnp.clip(box_xyxy_to_cxcywh(b)[..., 2:], 0.05, None)
        xy_c = 0.5 * (b[..., 2:] + b[..., :2])
        adj = jnp.concatenate([xy_c - 0.5 * wh_c, xy_c + 0.5 * wh_c], -1)
        biou = video_box_iou(adj, adj)[0].max(-1)  # (N,N)
        neighbor = (biou > cfg.interinst_threshold) & gt_valid[None] & gt_valid[:, None]
        u = (jnp.einsum("mn,np->mp", neighbor.astype(cdt),
                        (tm > 0.5).astype(cdt),
                        preferred_element_type=jnp.float32) > 0).astype(cdt)
        # BCE with pixel weights (1 + union):
        w_t = tm * (1.0 + u)
        w_nt = (1.0 - tm) * (1.0 + u)
        bce_pair = mm(pos, w_t) + mm(neg, w_nt)         # (Q,N) f32
        wsum = jnp.clip((1.0 + u).sum(-1, dtype=jnp.float32), 1.0, None)  # (N,)
        loss_mask_sum = (A * (bce_pair / wsum[None])).sum()
        # dice with background-repulsion term (u' = u & ~t):
        up = u * (1.0 - (tm > 0.5))
        fg = jax.nn.sigmoid(om)
        bg = jax.nn.sigmoid(-om)
        num_pair = 2.0 * mm(fg, tm) + mm(bg, up)
        den_pair = fg.sum(-1, dtype=jnp.float32)[:, None] \
            + tm.sum(-1, dtype=jnp.float32)[None] \
            + up.sum(-1, dtype=jnp.float32)[None]
        dice_pair = 1.0 - (num_pair + 1.0) / (den_pair + 1.0)
        loss_dice_sum = (A * dice_pair).sum()
    else:
        bce_pair = (mm(pos, tm) + mm(neg, 1.0 - tm)) / thw
        loss_mask_sum = (A * bce_pair).sum()
        dice_pair = batch_dice_cost(om, tm, cdt)
        loss_dice_sum = (A * dice_pair).sum()

    return {
        "num_matched": num_matched,
        "target_classes": target_classes,
        "loss_bbox_sum": loss_bbox_sum,
        "loss_giou_sum": loss_giou_sum,
        "loss_mask_sum": loss_mask_sum,
        "loss_dice_sum": loss_dice_sum,
    }


def _hungarian_layer_losses(cfg: CriterionCfg, cls_l, boxes_l, coeff_l, proto,
                            targets, amp: bool = False):
    """One decoder layer over the whole batch. cls_l (B,Q,K), boxes_l (B,Q,T,4),
    coeff_l (B,Q,M), proto (B,T,h,w,M)."""
    parts = jax.vmap(lambda c, bx, cf, pr, tv, tl, tb, tm, ti:
                     _per_video_layer(cfg, c, bx, cf, pr,
                                      {"valid": tv, "labels": tl, "boxes": tb,
                                       "match_masks": tm, "ids": ti}, amp))(
        cls_l, boxes_l, coeff_l, proto, targets["valid"], targets["labels"],
        targets["boxes"], targets["match_masks"], targets["ids"])

    num_masks = jnp.clip(parts["num_matched"].sum(), 1.0, None)
    T = boxes_l.shape[2]
    B, Q, K = cls_l.shape
    loss_cls = sigmoid_focal_loss(cls_l.reshape(B * Q, K),
                                  parts["target_classes"].reshape(B * Q, K),
                                  cfg.eos_coef)
    return {
        "loss_cls": loss_cls,
        "loss_bbox": parts["loss_bbox_sum"].sum() / (T * num_masks),
        "loss_giou": parts["loss_giou_sum"].sum() / (T * num_masks),
        "loss_mask": parts["loss_mask_sum"].sum() / num_masks,
        "loss_dice": parts["loss_dice_sum"].sum() / num_masks,
    }


# ---------------------------------------------------------------------------
# query-initialization losses
# ---------------------------------------------------------------------------

def _query_init_losses(cfg: CriterionCfg, rpn_logits, query_init_embed,
                       query_coords_grid, targets, relpos_grid, rng):
    """rpn_logits (BT,H,W,K); query_init_embed (BT,Q,E); query_coords_grid
    (BT,nb,nb,2) in [-1,1]; targets include stride-8 masks ('masks8' (B,N,T,H*W))."""
    BT, H, W, K = rpn_logits.shape
    T = cfg.n_frames
    B = BT // T
    P = H * W

    from ..utils.misc import make_reference_points
    ref_points = make_reference_points((H, W))

    labels, dist_w, ids = jax.vmap(
        lambda tl, tb, ti, tm, tv: clip_peak_match(tl, tb, ti, tm, tv, ref_points,
                                                   cfg.num_classes))(
        targets["labels"], targets["boxes"], targets["ids"], targets["masks8"],
        targets["valid"])
    # labels (B,T,P), dist_w (B,T,P,K), ids (B,T,P)

    # ---- semantic loss on sampled uncertain points ----
    logits = rpn_logits.reshape(B * T, P, K)
    tgt_oh = jax.nn.one_hot(jnp.clip(labels, 0, K - 1), K, dtype=jnp.float32) \
        * (labels >= 0)[..., None]
    tgt_oh = tgt_oh.reshape(B * T, P, K)
    dist_w = dist_w.reshape(B * T, P, K)

    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    uncertainty = (K * (1 - p) * tgt_oh + p * (1 - tgt_oh)).sum(-1)  # (BT,P)
    n_pts = min(cfg.num_points, P)
    _, point_idx = jax.lax.top_k(uncertainty, n_pts)  # (BT,n_pts)

    take = lambda arr: jnp.take_along_axis(arr, point_idx[..., None], axis=1)
    pt_logits, pt_tgt, pt_dist = take(logits), take(tgt_oh), take(dist_w)
    num_boxes = jnp.clip(jnp.any(pt_tgt > 0, -1).sum(-1).astype(jnp.float32), 1.0, None)
    sem_loss = weighted_sigmoid_focal_loss(pt_logits, pt_tgt, pt_dist, num_boxes)

    # ---- query ids at selected query positions (nearest grid sample, border) ----
    id_map = ids.reshape(B * T, H, W, 1).astype(jnp.float32)
    q_ids = grid_sample(id_map, query_coords_grid, padding_mode="border",
                        mode="nearest")
    q_ids = q_ids.reshape(B, T, cfg.n_query).astype(jnp.int32)  # (B,T,Q)

    # ---- contrastive reid loss ----
    emb = query_init_embed.reshape(B, T, cfg.n_query, -1).astype(jnp.float32)
    ctt, aux, cnt = jax.vmap(
        lambda e, qi, gid, gv, r: _reid_loss_video(cfg, e, qi, gid, gv, relpos_grid, r))(
        emb, q_ids, targets["ids"], targets["valid"],
        jax.random.split(rng, B))
    total_cnt = jnp.clip(cnt.sum(), 1.0, None)
    ctt_loss = ctt.sum() / total_cnt
    aux_loss = aux.sum() / total_cnt

    return {"loss_sem_cls_query_init": sem_loss,
            "loss_reid_query_init": ctt_loss,
            "loss_reid_query_init_aux": aux_loss}


def _reid_loss_video(cfg: CriterionCfg, embeds, q_ids, gt_ids, gt_valid,
                     relpos_grid, rng):
    """embeds (T,Q,E); q_ids (T,Q) per-query instance ids; gt_ids (N,T); gt_valid (N,).
    Fixed-shape version of criterion.py:540-602."""
    T, Q, E = embeds.shape
    N = gt_ids.shape[0]
    TQ = T * Q
    flat_ids = q_ids.reshape(TQ)
    flat_emb = embeds.reshape(TQ, E)
    w = max(cfg.window_inter_frame_asso, 2)
    K_neg = min(50 * T, TQ)
    K_pos = min(max(K_neg // 5, 2), TQ)

    inst_ids = jnp.max(jnp.where(gt_ids >= 0, gt_ids, -1), axis=-1)  # (N,)

    def per_instance(n, key):
        inst_id = inst_ids[n]
        present = (flat_ids == inst_id)
        use = gt_valid[n] & (inst_id >= 0) & jnp.any(present)

        anchor = jnp.argmax(present)  # first occurrence in TQ
        anchor_t = anchor // Q
        anchor_q = anchor % Q

        # fired area: relpos <= w*(|t - anchor_t| + 1) on both axes, per frame
        t_idx = jnp.arange(T)
        lim = (w * (jnp.abs(t_idx - anchor_t) + 1))[:, None]     # (T,1)
        fired_tq = jnp.all(relpos_grid[:, anchor_q][None] <= lim[..., None],
                           axis=-1)                              # (T,Q)
        fired = fired_tq.reshape(TQ)
        all_same = jnp.all(jnp.where(fired, flat_ids == inst_id, True))
        fired = fired | all_same

        same = fired & (flat_ids == inst_id)
        diff = fired & (flat_ids != inst_id)

        n_neg = jnp.minimum(diff.sum(), K_neg)
        n_pos = jnp.maximum(n_neg // 5, 2)

        k1, k2 = jax.random.split(key)
        pri_pos = jnp.where(same, jax.random.uniform(k1, (TQ,)), -jnp.inf)
        pri_neg = jnp.where(diff, jax.random.uniform(k2, (TQ,)), -jnp.inf)
        pos_vals, pos_idx = jax.lax.top_k(pri_pos, K_pos)
        neg_vals, neg_idx = jax.lax.top_k(pri_neg, K_neg)
        pos_sel = (jnp.arange(K_pos) < jnp.minimum(n_pos, same.sum())) \
            & jnp.isfinite(pos_vals)
        neg_sel = (jnp.arange(K_neg) < n_neg) & jnp.isfinite(neg_vals)

        target_e = flat_emb[anchor]
        pos_dot = flat_emb[pos_idx] @ target_e                  # (K_pos,)
        neg_dot = flat_emb[neg_idx] @ target_e                  # (K_neg,)

        # ctt: mean over selected pos of log(1 + clamp(sum_neg exp(neg-pos), 1e3))
        expsum = (jnp.exp(neg_dot[:, None] - pos_dot[None])
                  * neg_sel[:, None]).sum(0)
        ctt = jnp.log1p(jnp.clip(expsum, None, 1e3))
        ctt = (ctt * pos_sel).sum() / jnp.clip(pos_sel.sum(), 1.0, None)

        # aux cosine regression over selected pos+neg. Normalize via
        # rsqrt(max(|x|^2, eps^2)): identical values to x/clip(norm, eps) but
        # with a ZERO (not NaN) vjp at x=0 — jnp.linalg.norm's backward is
        # x/|x| and the post-hoc clip can't repair it; torch's F.normalize
        # zero-grads this case, so a zero embedding row (maskable under the
        # top-k selection) must not poison the whole batch gradient.
        def _nrm(x):
            return x * jax.lax.rsqrt(
                jnp.maximum((x * x).sum(-1, keepdims=True), 1e-24))

        tn = _nrm(target_e)
        cand = jnp.concatenate([flat_emb[pos_idx], flat_emb[neg_idx]])
        cand_n = _nrm(cand)
        cos = cand_n @ tn
        lbl = jnp.concatenate([jnp.ones(K_pos), jnp.zeros(K_neg)])
        sel = jnp.concatenate([pos_sel, neg_sel])
        aux = ((jnp.abs(cos - lbl) ** 2) * sel).sum() / jnp.clip(sel.sum(), 1.0, None)

        return (jnp.where(use, ctt, 0.0), jnp.where(use, aux, 0.0),
                use.astype(jnp.float32))

    keys = jax.random.split(rng, N)
    ctt, aux, cnt = jax.vmap(per_instance)(jnp.arange(N), keys)
    return ctt.sum(), aux.sum(), cnt.sum()


# ---------------------------------------------------------------------------
# top-level criterion
# ---------------------------------------------------------------------------

def criterion_apply(cfg: CriterionCfg, outputs, targets, relpos_grid, rng,
                    amp: bool = False):
    """outputs: decoder training dict ('cls' (L,B,Q,K), 'boxes' (L,B,Q,T,4),
    'mask_coeff' (L,B,Q,M), 'proto' (BT,h,w,M), 'query_init' aux, 'query_coords').
    targets: padded batch dict (see prepare_targets). Returns (total, dict)."""
    L, B, Q, K = outputs["cls"].shape
    T = cfg.n_frames
    proto = outputs["proto"].reshape(B, T, *outputs["proto"].shape[1:])

    qi = outputs["query_init"]
    losses = _query_init_losses(cfg, qi["rpn_sem_cls"], qi["query_init_embed"],
                                qi["query_coords_grid"], targets, relpos_grid, rng)

    # remat each layer's losses: the (Q, THW) mask tensors (out_masks, softplus
    # and sigmoid intermediates) are ~0.5 GB per decoder layer at 512x800; stored
    # for backward across 7 layers they blow past HBM (measured 19 GB of XLA
    # temps -> spilling ~2.3x the whole train step). Recomputing them in the
    # backward costs ~0.1 s.
    ckpt_layer = jax.checkpoint(
        lambda c, b, m, pr: _hungarian_layer_losses(cfg, c, b, m, pr, targets,
                                                    amp),
        static_argnums=())
    for l in range(L):
        ld = ckpt_layer(outputs["cls"][l], outputs["boxes"][l],
                        outputs["mask_coeff"][l], proto)
        suffix = "" if l == L - 1 else f"_{l}"
        for k, v in ld.items():
            losses[k + suffix] = v

    weight_map = {
        "loss_sem_cls_query_init": cfg.sem_cls_weight,
        "loss_cls": cfg.cls_weight,
        "loss_bbox": cfg.box_weight,
        "loss_giou": cfg.box_weight,
        "loss_mask": cfg.mask_weight,
        "loss_dice": cfg.dice_weight,
    }
    weighted = {}
    total = 0.0
    for k, v in losses.items():
        base = k[:k.rfind("_")] if k[-1].isdigit() else k  # strip aux-layer suffix
        wgt = weight_map.get(k, weight_map.get(base, cfg.aux_weight))
        weighted[k] = wgt * v
        total = total + weighted[k]
    return total, weighted
