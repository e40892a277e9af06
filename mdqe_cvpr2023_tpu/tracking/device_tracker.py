"""Device-resident OverTracker: the per-clip association runs entirely on device.

Behavioral spec: /root/reference/mdqe/tracking/OverTracker.py:16-225 — identical
math to the host implementation in over_tracker.py (which is kept as the
behavioral oracle; see tests/test_device_tracker.py for the randomized
equivalence check).

Why: the host tracker costs one host<->device round trip per clip (sIoU down,
slot vector up). Through this environment's TPU tunnel a round trip is
~30-60 ms — 3-4x the whole clip's device compute — and on any hardware it
serializes the pipeline. With association on device, the full per-clip chain
(decode -> postprocess -> ctt/sIoU scoring -> Hungarian -> memory update) is
one async dispatch and the host syncs once per WINDOW (~30 clips).

Dynamic host quantities (instance count, per-row untracked ages, ring of
embedding rows) become fixed-shape masked arrays; scipy's Hungarian becomes the
exact JV assignment in ops/hungarian.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.hungarian import lsa_maximize
from .mask_memory import _finalize_from_avg, mem_average, mem_siou, mem_update


@dataclass(frozen=True)
class TrackerCfg:
    num_max_inst: int
    num_frames: int            # clip length T
    window_frames: int
    clip_stride: int
    num_classes: int
    embed_dim: int
    mask_hw: Tuple[int, int]
    apply_cls_thres: float
    siou_match_threshold: float = 0.1
    ctt_match_threshold: float = 0.5
    # repeat-detection suppression gates (reference OverTracker.py:170-181);
    # the crowded bench raises them to 2.0 to disable suppression
    suppress_siou: float = 0.4
    suppress_ctt: float = 0.6
    beta_siou: float = 1.0
    beta_ctt: float = 1.0

    @property
    def mem_length(self) -> int:
        return self.window_frames + self.num_frames

    @property
    def num_clip_mem_long(self) -> int:
        return 15 // self.clip_stride

    @property
    def num_clip_mem_short(self) -> int:
        return max(self.num_frames, 5) // self.clip_stride

    @property
    def ring(self) -> int:
        return max(3, (self.num_frames - 1) // self.clip_stride)

    @property
    def ema_window(self) -> int:
        # update-time EMA looks at most 3 ring rows back (reference :84-90)
        return min(3, self.ring)


@functools.partial(jax.jit, static_argnums=(0,))
def tracker_state_init(cfg: TrackerCfg):
    """All-device tracker state (allocated on device; see mem_init's rationale)."""
    M = cfg.num_max_inst
    H, W = cfg.mask_hw
    return {
        # mask memory (running sums; row M = dump row for unmatched detections)
        "logit_sum": jnp.zeros((M + 1, cfg.mem_length, H, W), jnp.float32),
        "valid_count": jnp.zeros((M + 1, cfg.mem_length), jnp.float32),
        "clip_count_mem": jnp.zeros((M + 1,), jnp.float32),
        # host-side-analog per-instance memory
        "embeds_mem": jnp.zeros((M, cfg.embed_dim), jnp.float32),
        "untracked": jnp.zeros((M,), jnp.float32),
        "ring_embeds": jnp.zeros((cfg.ring, M, cfg.embed_dim), jnp.float32),
        "ring_valid": jnp.zeros((cfg.ring, M), bool),
        "cls_sum": jnp.zeros((M, cfg.num_classes), jnp.float32),
        "clip_count": jnp.zeros((M,), jnp.float32),
        "num_inst": jnp.int32(0),
        "num_clip": jnp.int32(0),
    }


def _masked_softmax(f, mask, axis):
    neg = jnp.float32(-1e30)
    fm = jnp.where(mask, f, neg)
    m = jnp.max(fm, axis=axis, keepdims=True)
    e = jnp.exp(fm - m) * mask
    den = e.sum(axis=axis, keepdims=True)
    return jnp.where(den > 0, e / jnp.maximum(den, 1e-30), 0.0)


def _ctt_masked(f, rowmask, colmask):
    """Bi-directional softmax similarity over the (rowmask x colmask) submatrix
    (reference OverTracker.py:228-242), zero outside."""
    mask2d = rowmask[:, None] & colmask[None, :]
    d2t = _masked_softmax(f, mask2d, axis=0)
    t2d = _masked_softmax(f, mask2d, axis=1)
    ns = rowmask.sum()
    ni = colmask.sum()
    ws = (ns > 1).astype(jnp.float32)
    wi = (ni > 1).astype(jnp.float32)
    general = (ws * d2t + wi * t2d) / jnp.maximum(ws + wi, 1.0)
    single = 0.5 * (d2t + t2d)
    sim = jnp.where((ns == 1) & (ni == 1), single, general)
    return sim * mask2d


def tracker_step(state, cfg: TrackerCfg, scores, cls_probs, masks, embeds, valid,
                 f0, overlap):
    """One clip's association + memory update (pure jnp; call inside a jit).

    scores (K,), cls_probs (K, Kc), masks (K, T, h, w) logits, embeds (K, C),
    valid (K,) bool, f0 scalar int32 memory offset, overlap (T,) bool."""
    M = cfg.num_max_inst
    K = scores.shape[0]
    num_inst = state["num_inst"]
    rows = jnp.arange(M)
    row_lt = rows < num_inst

    # ---- ctt similarity with long/short memories (reference :123-134) ----
    f = state["embeds_mem"] @ embeds.T  # (M, K)
    long_rows = row_lt & (state["untracked"] < cfg.num_clip_mem_long)
    short_rows = row_lt & (state["untracked"] < cfg.num_clip_mem_short)
    sim_long = _ctt_masked(f, long_rows, valid)
    sim_short = _ctt_masked(f, short_rows, valid)
    scores_mem = jnp.where(short_rows[:, None] & valid[None, :],
                           0.5 * (sim_long + sim_short), sim_long)

    # ---- mask sIoU on overlapping frames (reference :92-113, 144-150) ----
    siou_full = mem_siou(state["logit_sum"], state["valid_count"],
                         state["clip_count_mem"], masks, f0, overlap)  # (M+1, K)
    siou_scores = siou_full[:M] * valid[None, :] * row_lt[:, None]

    # ---- gate + exact assignment (reference :152-168) ----
    score_mat = cfg.beta_siou * siou_scores + cfg.beta_ctt * scores_mem
    thres = (cfg.beta_siou * cfg.siou_match_threshold
             + cfg.beta_ctt * cfg.ctt_match_threshold)
    above = score_mat > thres
    gated = score_mat * above

    if M <= K:
        col4row = lsa_maximize(gated, gated.any(axis=1))    # (M,)
        m_ok = gated[rows, col4row] > 0
        matched_col = jnp.where(m_ok, col4row, -1)          # (M,)
    else:
        row4col = lsa_maximize(gated.T, gated.any(axis=0))  # (K,)
        cols = jnp.arange(K)
        c_ok = gated[row4col, cols] > 0
        matched_col = jnp.full((M,), -1, jnp.int32).at[
            jnp.where(c_ok, row4col, M)].set(cols.astype(jnp.int32),
                                             mode="drop")

    is_matched_row = matched_col >= 0
    safe_c = jnp.clip(matched_col, 0, K - 1)
    pair = jnp.zeros((M, K), bool).at[
        rows, safe_c].set(is_matched_row)                   # matched (r, c) pairs

    slots = jnp.full((K,), M, jnp.int32)
    slots = slots.at[jnp.where(is_matched_row, matched_col, K)].set(
        rows.astype(jnp.int32), mode="drop")
    col_matched = slots < M

    # ---- repeated-detection suppression (reference :170-181) ----
    siou_p = jnp.where(pair, -1.0, siou_scores)
    mem_p = jnp.where(pair, 0.0, scores_mem)
    repeated = (valid & ~col_matched
                & ((siou_p.max(axis=0) > cfg.suppress_siou)
                   | (mem_p.max(axis=0) > cfg.suppress_ctt)))

    # ---- new-ID registration (reference :180-193); on the very first clip all
    # valid detections register without the score threshold ----
    eligible = valid & ~col_matched & ~repeated
    eligible = eligible & jnp.where(num_inst == 0, True,
                                    scores > 2.0 * cfg.apply_cls_thres)
    new_rank = jnp.cumsum(eligible.astype(jnp.int32)) - 1
    new_id = num_inst + new_rank
    ok_new = eligible & (new_id < M)
    slots = jnp.where(ok_new, new_id.astype(jnp.int32), slots)
    n_new = ok_new.sum(dtype=jnp.int32)

    # ---- mask-memory update (one scatter-add; reference saved_logits write) ----
    logit_sum, valid_count, clip_count_mem = mem_update(
        state["logit_sum"], state["valid_count"], state["clip_count_mem"],
        masks, slots, f0)

    # ---- per-row host-analog memory (reference :78-90, update tail) ----
    row_det = jnp.full((M,), -1, jnp.int32).at[
        jnp.where(slots < M, slots, M)].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop")
    row_matched = row_det >= 0
    safe_d = jnp.clip(row_det, 0, K - 1)

    untracked = jnp.where(row_matched, 0.0, state["untracked"] + 1.0)
    clip_count = state["clip_count"] + row_matched.astype(jnp.float32)
    cls_sum = state["cls_sum"] + jnp.where(row_matched[:, None],
                                           cls_probs[safe_d], 0.0)

    embeds_row = jnp.where(row_matched[:, None], embeds[safe_d], 0.0)
    ring_embeds = jnp.concatenate([state["ring_embeds"][1:], embeds_row[None]])
    ring_valid = jnp.concatenate([state["ring_valid"][1:], row_matched[None]])

    # exponential-weighted embedding memory over the last nc ring rows
    # (reference :84-90): weights e^{0.25*i}, oldest of the window first
    RW = cfg.ema_window
    nc = jnp.minimum(state["num_clip"] + 1, RW)
    s = jnp.arange(RW, dtype=jnp.float32)
    start = jnp.float32(RW) - nc.astype(jnp.float32)
    w = jnp.exp(0.25 * (s - start)) * (s >= start)
    tail_e = ring_embeds[-RW:]
    # reference valid_mem is a NONZERO-embed test (OverTracker.py:85), which
    # differs from mask-validity only for the rolled window slot (whose embed
    # is zero exactly when the row had no recent match)
    tail_v = (tail_e != 0).any(-1).astype(jnp.float32)
    num = (tail_e * w[:, None, None]).sum(axis=0)            # (M, C)
    den = jnp.clip((tail_v * w[:, None]).sum(axis=0), 1.0, None)
    emb_new = num / den[:, None]
    embeds_mem = jnp.where(row_matched[:, None], emb_new, state["embeds_mem"])

    return {
        "logit_sum": logit_sum,
        "valid_count": valid_count,
        "clip_count_mem": clip_count_mem,
        "embeds_mem": embeds_mem,
        "untracked": untracked,
        "ring_embeds": ring_embeds,
        "ring_valid": ring_valid,
        "cls_sum": cls_sum,
        "clip_count": clip_count,
        "num_inst": num_inst + n_new,
        "num_clip": state["num_clip"] + 1,
    }


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
def tracker_window_average(state, cfg: TrackerCfg, is_last: bool):
    """Per-window output + rollover as ONE device call (reference get_result
    :195-225). Returns (out_cls (M, Kc), num_inst, avg logits (M+1, L, h, w),
    new_state); the host slices by num_inst after its (deferred) sync and
    finalizes masks lazily per live-instance chunk (finalize_avg_chunk)."""
    M = cfg.num_max_inst
    rows = jnp.arange(M)
    num_inst = state["num_inst"]
    row_lt = rows < num_inst

    out_cls = state["cls_sum"] / jnp.clip(state["clip_count"], 1.0, None)[:, None]

    # window-level weighted embedding (reference :281-285)
    R = cfg.ring
    nc = jnp.minimum(state["num_clip"], R)
    s = jnp.arange(R, dtype=jnp.float32)
    start = jnp.float32(R) - nc.astype(jnp.float32)
    w = jnp.exp(0.25 * (s - start)) * (s >= start)
    tv = state["ring_valid"].astype(jnp.float32)
    den = jnp.clip((tv * w[:, None]).sum(axis=0), 1.0, None)
    emb = (state["ring_embeds"] * w[:, None, None]).sum(axis=0) / den[:, None]

    avg = mem_average(state["logit_sum"], state["valid_count"])

    if is_last:
        return out_cls, num_inst, avg, state

    L = state["logit_sum"].shape[1]
    roll = L - cfg.window_frames
    new_ls = jnp.zeros_like(state["logit_sum"]).at[:, :roll].set(
        avg[:, cfg.window_frames:])
    new_vc = jnp.zeros_like(state["valid_count"]).at[:, :roll].set(
        (state["valid_count"][:, cfg.window_frames:] > 0).astype(jnp.float32))
    new_cc = (state["clip_count_mem"] > 0).astype(jnp.float32)

    # the rolled clip slot only counts for a row with valid RESIDUAL frames:
    # the reference's get_result weights slot 0 by saved_valid[0].any(-1)
    # (OverTracker.py:206-213), so a row whose masks ended before the window
    # boundary contributes NEITHER its class average NOR its embedding to the
    # next window (carrying them unconditionally skewed the next window's
    # 0.75*mean+0.25*max class merge by up to 1.6x for such rows)
    has_res = (state["valid_count"][:M, cfg.window_frames:] > 0).any(-1)
    gate = row_lt & has_res

    ring_embeds = jnp.zeros_like(state["ring_embeds"]).at[-1].set(
        jnp.where(row_lt[:, None], emb, 0.0))
    ring_valid = jnp.zeros_like(state["ring_valid"]).at[-1].set(gate)

    new_state = {
        "logit_sum": new_ls,
        "valid_count": new_vc,
        "clip_count_mem": new_cc,
        # reference _init_memory leaves the long-term embed memory untouched
        # at window boundaries (it only updates on matches, :81-90)
        "embeds_mem": state["embeds_mem"],
        "untracked": state["untracked"],
        "ring_embeds": ring_embeds,
        "ring_valid": ring_valid,
        "cls_sum": jnp.where(gate[:, None], out_cls, 0.0),
        "clip_count": gate.astype(jnp.float32),
        "num_inst": num_inst,
        "num_clip": jnp.int32(1),
    }
    return out_cls, num_inst, avg, new_state


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def finalize_avg_chunk(avg_chunk, match_stride: int, image_size, ori_size):
    """Upsample+binarize+bit-pack ONE chunk of averaged logits
    (chunk, L, h4, w4) -> (chunk, L, oh, ceil(ow/8)) uint8. Called only for
    ceil(num_inst / chunk) chunks: finalizing all M+1 rows per window cost
    ~350 ms of device time for typically <16 live instances."""
    return _finalize_from_avg(avg_chunk, match_stride, tuple(image_size),
                              tuple(ori_size), inst_chunk=avg_chunk.shape[0])


def tracker_window_output(state, cfg: TrackerCfg, match_stride: int,
                          image_size, ori_size, is_last: bool):
    """Back-compat wrapper: average + full finalize in one call (used by tests;
    inference_vis uses the lazy per-chunk path)."""
    from .mask_memory import mem_finalize_masks
    out_cls, num_inst, avg, new_state = tracker_window_average(state, cfg,
                                                               is_last)
    packed = mem_finalize_masks(avg, match_stride, tuple(image_size),
                                tuple(ori_size))
    return out_cls, num_inst, packed, new_state
