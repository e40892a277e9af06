"""Memory-based clip-by-clip tracker for near-online VIS.

Behavioral spec: /root/reference/mdqe/tracking/OverTracker.py:10-257. Match score =
mask soft-IoU on overlapping frames + bi-directional-softmax embedding similarity with
long(15-clip)/short memories; Hungarian assignment with thresholds; repeated-detection
suppression; new-ID registration; exponentially-weighted embedding memory; windowed
results with residual-frame rollover.

TPU redesign:
  - The reference stores per-clip mask logits (num_clips x max_inst x mem_length x
    HxW ~ 7.5 GB at 360p) and averages at the end. Every reduction it performs is a
    clip-sum, so we keep *running sums and counts* — numerically identical, 32x less
    memory — and keep them ON DEVICE (tracking/mask_memory.py): the host receives
    only (M x K) similarity matrices per clip and bit-packed binary masks per window.
  - Embeddings/classes/scores and the Hungarian assignment are tiny and stay host-side
    numpy (as in the reference, which also runs scipy on host).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from .mask_memory import (mem_average, mem_init, mem_rollover, mem_siou,
                          mem_update, mem_window_output)


def ctt_similarity(saved_embeds: np.ndarray, input_embeds: np.ndarray) -> np.ndarray:
    """Bi-directional softmax similarity (reference OverTracker.py:228-242)."""
    feats = saved_embeds @ input_embeds.T  # (Ns, Ni)
    Ns, Ni = feats.shape
    ws = 1 if Ns > 1 else 0
    wi = 1 if Ni > 1 else 0
    d2t = _softmax(feats, axis=0)
    t2d = _softmax(feats, axis=1)
    if Ns == 1 and Ni == 1:
        return 0.5 * (d2t + t2d)
    return (ws * d2t + wi * t2d) / max(ws + wi, 1)


def _softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


@dataclass
class ClipResults:
    """One clip's outputs. Host metadata is numpy with a fixed detection capacity K;
    mask_logits stays a device array (K, T, H, W) at stride 4 (jnp on TPU; numpy is
    accepted and converted)."""
    frame_idx: List[int]          # real frames covered (may be < T for last clip)
    scores: np.ndarray            # (K,)
    classes: np.ndarray           # (K,)
    cls_probs: np.ndarray         # (K, Kcls)
    mask_logits: "jnp.ndarray"    # (K, T, H, W)
    query_embeds: np.ndarray      # (K, C)
    valid: np.ndarray             # (K,) bool

    @property
    def num_instance(self) -> int:
        return int(self.valid.sum())


class OverTracker:
    def __init__(self, num_max_inst, num_frames, window_frames, clip_stride,
                 num_classes, embed_dim, mask_size, apply_cls_thres):
        self.num_frames = num_frames
        self.window_frames = window_frames
        self.clip_stride = clip_stride
        self.num_classes = num_classes
        self.embed_dim = embed_dim
        self.mask_size = tuple(mask_size)
        self.apply_cls_thres = apply_cls_thres

        self.num_max_inst = num_max_inst
        self.num_inst = 0
        self.mem_length = window_frames + num_frames
        self.saved_idx_set: set = set()
        self.start_frame = 0

        # matching hyper-parameters (reference :36-44)
        self.siou_match_threshold = 0.1
        self.ctt_match_threshold = 0.5
        self.beta_siou = 1.0
        self.beta_ctt = 1.0
        self.num_clip_mem_long = 15 // clip_stride
        self.num_clip_mem_short = max(num_frames, 5) // clip_stride
        self.ring = max(3, (num_frames - 1) // clip_stride)
        self.weights_mem = np.exp(np.arange(self.num_clip_mem_long) * 0.25)

        self.untracked_clips = np.zeros(num_max_inst, np.float64)
        self.embeds_mem = np.zeros((num_max_inst, embed_dim), np.float32)
        self._dev_scalar_cache = {}
        self._init_host_memory(is_first=True)
        self._init_device_memory()

    # ------------------------------------------------------------------
    def _init_device_memory(self):
        M1 = self.num_max_inst + 1  # extra dump row for unmatched detections
        H, W = self.mask_size
        self.logit_sum, self.valid_count, self.clip_count_dev = mem_init(
            M1, self.mem_length, H, W)

    def _init_host_memory(self, is_first: bool):
        M = self.num_max_inst
        self.num_clip = 0 if is_first else 1
        if not is_first:
            self.start_frame += self.window_frames
        self.saved_idx_set = set(f for f in self.saved_idx_set
                                 if f >= self.start_frame)
        self.clip_count = np.zeros((M,), np.float32)
        self.cls_sum = np.zeros((M, self.num_classes), np.float32)
        self.ring_embeds = np.zeros((self.ring, M, self.embed_dim), np.float32)
        self.ring_valid = np.zeros((self.ring, M), bool)
        self.saved_frame_idx = list(range(self.start_frame,
                                          self.start_frame + self.mem_length))

    def _push_ring(self, embeds_row, valid_row):
        self.ring_embeds = np.roll(self.ring_embeds, -1, axis=0)
        self.ring_valid = np.roll(self.ring_valid, -1, axis=0)
        self.ring_embeds[-1] = embeds_row
        self.ring_valid[-1] = valid_row

    # ------------------------------------------------------------------
    def clip_offsets(self, frame_idx: List[int]):
        """(f0, overlap) for a clip about to be processed: memory offset of its first
        frame and which clip frames are already present in memory."""
        f0 = max(min(frame_idx) - self.start_frame, 0)
        overlap = np.array([f in self.saved_idx_set and f >= self.start_frame
                            for f in frame_idx], bool)
        return f0, overlap

    def update(self, clip: ClipResults, siou_full: Optional[np.ndarray] = None):
        """siou_full: optional precomputed (M+1, K) sIoU matrix (from the fused
        device call); computed on demand otherwise."""
        K = clip.valid.shape[0]
        det_idx = np.nonzero(clip.valid)[0]
        n_in = len(det_idx)
        f0 = max(min(clip.frame_idx) - self.start_frame, 0)
        real_T = len(clip.frame_idx)
        T = clip.mask_logits.shape[1]

        siou_scores = np.zeros((max(self.num_inst, 1), K), np.float32)
        scores_mem = np.zeros((max(self.num_inst, 1), K), np.float32)

        if self.num_inst == 0:
            matched_ID = list(range(n_in))[:self.num_max_inst]
            matched_det = det_idx.tolist()[:self.num_max_inst]
            self.num_inst = len(matched_ID)
            new_assign: List[int] = []
        else:
            emb_mem = self.embeds_mem[:self.num_inst]
            long_ok = np.nonzero(self.untracked_clips[:self.num_inst]
                                 < self.num_clip_mem_long)[0]
            short_ok = np.nonzero(self.untracked_clips[:self.num_inst]
                                  < self.num_clip_mem_short)[0]
            scores_mem = np.zeros((self.num_inst, K), np.float32)
            if n_in > 0:
                emb_in = clip.query_embeds[det_idx]
                if len(long_ok) > 0:
                    scores_mem[np.ix_(long_ok, det_idx)] = ctt_similarity(
                        emb_mem[long_ok], emb_in)
                if len(short_ok) > 0:
                    short = ctt_similarity(emb_mem[short_ok], emb_in)
                    scores_mem[np.ix_(short_ok, det_idx)] = \
                        0.5 * (scores_mem[np.ix_(short_ok, det_idx)] + short)

            overlap = np.zeros((T,), bool)
            for o_i, f_i in enumerate(clip.frame_idx):
                if f_i in self.saved_idx_set and f_i >= self.start_frame:
                    overlap[o_i] = True
            siou_scores = np.zeros((self.num_inst, K), np.float32)
            if overlap.any() and n_in > 0 and self.beta_siou > 0:
                if siou_full is None:
                    siou_full = np.asarray(mem_siou(
                        self.logit_sum, self.valid_count, self.clip_count_dev,
                        clip.mask_logits, f0, jnp.asarray(overlap)))
                siou_scores = siou_full[:self.num_inst] * clip.valid[None]

            scores = self.beta_siou * siou_scores + self.beta_ctt * scores_mem
            thres = (self.beta_siou * self.siou_match_threshold
                     + self.beta_ctt * self.ctt_match_threshold)
            above = scores > thres
            scores = scores * above

            row_idx, col_idx = linear_sum_assignment(scores[:, det_idx],
                                                     maximize=True)
            matched_ID, matched_det = [], []
            for r, c in zip(row_idx, col_idx):
                d = det_idx[c]
                if not above[r, d]:
                    continue
                matched_ID.append(int(r))
                matched_det.append(int(d))
                siou_scores[r, d] = -1.0
                scores_mem[r, d] = 0.0

            # repeated-detection suppression (reference :170-181)
            repeated = []
            for d in det_idx:
                if d in matched_det:
                    continue
                if siou_scores[:, d].max() > 0.4 or scores_mem[:, d].max() > 0.6:
                    repeated.append(d)

            unmatched = [d for d in det_idx
                         if d not in matched_det and d not in repeated
                         and clip.scores[d] > 2 * self.apply_cls_thres]
            unmatched = unmatched[:self.num_max_inst - self.num_inst]
            new_assign = list(range(self.num_inst, self.num_inst + len(unmatched)))
            matched_ID = matched_ID + new_assign
            matched_det = matched_det + unmatched

        # ---- device mask-memory update (one small upload: the slot vector) ----
        slots = np.full((K,), self.num_max_inst, np.int32)  # dump row
        for inst, d in zip(matched_ID, matched_det):
            slots[d] = inst
        if f0 not in self._dev_scalar_cache:
            self._dev_scalar_cache[f0] = jnp.asarray(np.int32(f0))
        self.logit_sum, self.valid_count, self.clip_count_dev = mem_update(
            self.logit_sum, self.valid_count, self.clip_count_dev,
            clip.mask_logits, jnp.asarray(slots), self._dev_scalar_cache[f0])

        # ---- host memory update (embeds / cls / counters, reference :78-90) ----
        embeds_row = np.zeros((self.num_max_inst, self.embed_dim), np.float32)
        valid_row = np.zeros(self.num_max_inst, bool)
        self.untracked_clips += 1
        if matched_ID:
            r = np.asarray(matched_ID)
            c = np.asarray(matched_det)
            self.clip_count[r] += 1.0
            self.cls_sum[r] += clip.cls_probs[c]
            embeds_row[r] = clip.query_embeds[c]
            valid_row[r] = True
            self.untracked_clips[r] = 0
        self._push_ring(embeds_row, valid_row)
        if matched_ID:
            nc = min(self.num_clip + 1, 3, self.ring)
            emb = self.ring_embeds[-nc:][:, r]
            # reference valid_mem is a NONZERO-embed test (OverTracker.py:85):
            # differs from mask-validity only for the rolled window slot
            vw = (emb != 0).any(-1, keepdims=True).astype(np.float32)
            w = self.weights_mem[:nc].reshape(-1, 1, 1)
            denom = np.clip((vw * w).sum(0), 1.0, None)
            self.embeds_mem[r] = (emb * w).sum(0) / denom

        self.saved_idx_set.update(clip.frame_idx)
        self.num_clip += 1
        self.num_inst += len(new_assign)

    # ------------------------------------------------------------------
    def get_result(self, is_last_clip=False, finalize_args=None):
        """Returns (out_cls (N, Kcls) numpy, masks device, len_frames) and rolls
        residual frames. With finalize_args=(match_stride, image_size, ori_size)
        the device work runs as ONE fused call (average + finalize + rollover,
        donated) and `masks` are bit-packed binary masks at original size over
        the full memory length — slice [:num_inst, :len_frames]. Without it,
        `masks` are averaged logits (M1, L, H, W) (separate rollover call)."""
        n = self.num_inst
        n_frames_valid = max(self.saved_idx_set) - self.start_frame + 1
        len_frames = self.window_frames if not is_last_clip else int(n_frames_valid)

        if finalize_args is not None:
            match_stride, image_size, ori_size = finalize_args
            masks, self.logit_sum, self.valid_count, self.clip_count_dev = \
                mem_window_output(self.logit_sum, self.valid_count,
                                  self.clip_count_dev, self.window_frames,
                                  match_stride, tuple(image_size),
                                  tuple(ori_size), rollover=not is_last_clip)
        else:
            masks = mem_average(self.logit_sum, self.valid_count)
            if not is_last_clip:
                self.logit_sum, self.valid_count, self.clip_count_dev = \
                    mem_rollover(self.logit_sum, self.valid_count,
                                 self.clip_count_dev, self.window_frames)

        out_cls = self.cls_sum[:n] / np.clip(self.clip_count[:n], 1.0, None)[:, None]

        nc = min(max(3, (self.num_frames - 1) // self.clip_stride), self.num_clip,
                 self.ring)
        qw = self.ring_valid[-nc:][:, :n, None] * self.weights_mem[:nc].reshape(-1, 1, 1)
        emb = (self.ring_embeds[-nc:][:, :n] * qw).sum(0) / np.clip(qw.sum(0), 1.0,
                                                                    None)

        if not is_last_clip:
            # the rolled slot counts for a row only if it has valid RESIDUAL
            # frames (reference weights slot 0 by saved_valid[0].any(-1),
            # OverTracker.py:206-213); valid_count was rolled above, so its
            # leading `roll` columns hold exactly that residual validity.
            # embeds_mem is NOT touched at window boundaries (reference only
            # updates it on matches, :81-90).
            roll = self.mem_length - self.window_frames
            has_res = np.asarray(
                (self.valid_count[:self.num_max_inst, :roll] > 0).any(axis=1))
            self._init_host_memory(is_first=False)
            self.clip_count[:n] = has_res[:n].astype(np.float32)
            self.cls_sum[:n] = out_cls * has_res[:n, None]
            self.ring_embeds[-1, :n] = emb
            self.ring_valid[-1, :n] = has_res[:n]

        return out_cls, masks, len_frames
