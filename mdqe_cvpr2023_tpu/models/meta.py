"""MDQE meta-architecture: preprocessing, windowed VIS inference, clip post-processing
and video-level merging.

Behavioral spec: /root/reference/mdqe/mdqe.py:61-556 (MDQE.forward, inference_vis,
inference_clip, inference_video, inference_image, preprocess_image).

TPU design:
  - All device work is split into three jitted fixed-shape stages, compiled once per
    (window/clip geometry): encode_window (backbone+encoder+mask head, frames chunked),
    decode_clip (decoder), postprocess_clip (masked NMS/rescoring/top-k on all Q
    queries, emitting a fixed top-K slab). The dynamic filtering of the reference
    (variable instance counts) becomes masked fixed-capacity arrays; the host slices
    valid rows before handing them to the (host-side) OverTracker.
  - The video loop (dynamic length) runs in Python on the host, exactly mirroring the
    reference's window/clip streaming (mdqe.py:291-366).
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.misc import aligned_bilinear, interpolate_bilinear, interpolate_nearest
from ..tracking import ClipResults, OverTracker
from .decoder import decoder_apply
from .detr import MDQEModelCfg, detr_encode, detr_mask_feats


@dataclass(frozen=True)
class InferenceCfg:
    clip_stride: int = 1
    n_frames_test: int = 4
    n_frames_window_test: int = 30
    max_num_instances: int = 120
    apply_cls_thres: float = 0.1
    detections_per_image: int = 15
    multi_cls_on: bool = True
    match_stride: int = 4
    clip_topk: int = 32            # fixed per-clip detection slab (device output)
    encode_chunk: int = 10         # frames per backbone/encoder launch
    num_classes: int = 25


# ---------------------------------------------------------------------------
# device-side fixed-shape clip post-processing (reference inference_clip :368-428)
# ---------------------------------------------------------------------------

def postprocess_clip(cls_probs, mask_coeff, query_embeds, mask_feats,
                     apply_cls_thres: float, topk: int):
    """cls_probs (Q,K) sigmoid, mask_coeff (Q,M), query_embeds (Q,C),
    mask_feats (T,H,W,M). Returns a fixed top-k slab:
    scores (k,), classes (k,), cls (k,K), masks (k,T,H,W), embeds (k,C), valid (k,)."""
    Q, K = cls_probs.shape
    T = mask_feats.shape[0]
    neg = jnp.float32(-1e9)

    # stage 1: score sort, keep >= min(thres, best)
    base_scores = cls_probs.max(axis=-1)  # (Q,)
    keep = base_scores >= jnp.minimum(apply_cls_thres, base_scores.max())

    # stage 2: query-similarity dedup (> 0.99 wrt any higher-scored kept query)
    emb_n = query_embeds / jnp.clip(
        jnp.linalg.norm(query_embeds, axis=-1, keepdims=True), 1e-12, None)
    sim = emb_n @ emb_n.T  # (Q,Q)
    order = jnp.argsort(-jnp.where(keep, base_scores, neg))
    rank = jnp.argsort(order)  # rank[i] = position of i in sorted order
    higher = (rank[None, :] < rank[:, None]) & keep[None, :]  # j strictly higher-ranked
    max_sim = jnp.max(jnp.where(higher, sim, neg), axis=1)
    keep = keep & (max_sim < 0.99)

    # masks for all queries: (Q,T,H,W)
    masks = jnp.einsum("qm,thwm->qthw", mask_coeff, mask_feats)

    # stage 3: drop blank masks
    nonblank = (masks > 0).reshape(Q, -1).sum(axis=1) > 0
    keep = keep & nonblank

    # stage 4: soft-mask-IoU NMS among kept, in score order
    m_nms = masks[:, ::2] if T >= 5 else masks
    soft = jax.nn.sigmoid(m_nms[:, :, ::2, ::2]).reshape(Q, -1)
    hard = (soft > 0.5).astype(soft.dtype)
    inter = soft @ hard.T
    denom = soft.sum(-1)[:, None] + hard.sum(-1)[None] - inter
    siou = inter / (denom + 1.0)
    higher = (rank[None, :] < rank[:, None]) & keep[None, :]
    max_iou = jnp.max(jnp.where(higher, siou.T, 0.0), axis=1)  # siou[j, i] j higher
    cls_probs = cls_probs * (1 - max_iou[:, None])
    keep = keep & (max_iou < 0.5)

    # stage 5: mask-aware rescoring
    soft_full = jax.nn.sigmoid(masks).reshape(Q, -1)
    hard_full = (soft_full > 0.5).astype(soft_full.dtype)
    mask_scores = (soft_full * hard_full).sum(1) / (hard_full.sum(1) + 1e-6)
    cls_probs = cls_probs * mask_scores[:, None]

    # stage 6: final top-k with validity (reference keeps #(> thres), at least 1)
    scores = jnp.where(keep, cls_probs.max(-1), neg)
    labels = cls_probs.argmax(-1)
    k_eff = min(topk, Q)
    top_scores, top_idx = jax.lax.top_k(scores, k_eff)
    if k_eff < topk:  # tiny-Q configs: pad the slab to the fixed capacity
        top_scores = jnp.pad(top_scores, (0, topk - k_eff), constant_values=neg)
        top_idx = jnp.pad(top_idx, (0, topk - k_eff))
    n_above = jnp.maximum((top_scores > apply_cls_thres).sum(), 1)
    valid = (jnp.arange(topk) < n_above) & (top_scores > neg / 2)

    return {
        "scores": top_scores,
        "classes": labels[top_idx],
        "cls_probs": cls_probs[top_idx],
        "masks": masks[top_idx],
        "query_embeds": query_embeds[top_idx],
        "valid": valid,
    }


# ---------------------------------------------------------------------------
# jitted stages
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model_cfg",))
def encode_frames(params, model_cfg: MDQEModelCfg, images, image_sizes):
    encoded, mask_flat, _ = detr_encode(params, model_cfg, images, image_sizes)
    return encoded, mask_flat


@functools.partial(jax.jit, static_argnames=("model_cfg", "spatial_shapes"))
def encode_window(params, model_cfg: MDQEModelCfg, frames_u8, image_sizes,
                  pixel_mean, pixel_std, spatial_shapes):
    """One launch for a whole window: uint8 frames are normalized on device (4x less
    host->device traffic), then backbone + encoder (bf16, fp32 islands inside the
    deform-attn core — mirrors the reference's fp16-autocast eval) + mask head (f32)."""
    images = ((frames_u8.astype(jnp.float32) - pixel_mean) / pixel_std
              ).astype(jnp.bfloat16)
    bf16_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        {k: params[k] for k in ("backbone", "input_proj", "transformer_enc")})
    p = dict(params, **bf16_params)
    encoded, mask_flat, _ = detr_encode(p, model_cfg, images, image_sizes)
    encoded = encoded.astype(jnp.float32)
    maskf = detr_mask_feats(params, model_cfg, encoded, spatial_shapes)
    return encoded, mask_flat, maskf


@functools.partial(jax.jit, static_argnames=("model_cfg", "spatial_shapes"))
def window_mask_feats(params, model_cfg: MDQEModelCfg, encoded, spatial_shapes):
    return detr_mask_feats(params, model_cfg, encoded, spatial_shapes)


@functools.partial(jax.jit,
                   static_argnames=("model_cfg", "spatial_shapes", "n_frames",
                                    "apply_cls_thres", "topk"))
def decode_and_postprocess_clip(params, model_cfg: MDQEModelCfg, encoded, mask_flat,
                                spatial_shapes, mask_feats, n_frames: int,
                                apply_cls_thres: float, topk: int):
    out = decoder_apply(params["transformer_dec"], model_cfg.decoder_cfg, encoded,
                        mask_flat, spatial_shapes, n_frames, training=False)
    return postprocess_clip(out["cls"][0], out["mask_coeff"][0], out["query_embed"][0],
                            mask_feats, apply_cls_thres, topk)


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _slice_clip(window_encoded, window_mask_flat, window_mask_feats_arr, clip_off,
                n_frames: int):
    """Tiny per-window-length jit: slice a fixed-shape clip out of the window
    arrays on device. Kept separate from the decode jit so the expensive decoder
    graph compiles ONCE per clip shape rather than once per window length (the
    tail window is shorter, and a fused slice+decode jit recompiled the whole
    decoder for it — several extra minutes of XLA time)."""
    enc = jax.lax.dynamic_slice_in_dim(window_encoded, clip_off, n_frames, 0)
    mfl = jax.lax.dynamic_slice_in_dim(window_mask_flat, clip_off, n_frames, 0)
    mfe = jax.lax.dynamic_slice_in_dim(window_mask_feats_arr, clip_off, n_frames, 0)
    return enc, mfl, mfe


def decode_clip_windowed(params, model_cfg: MDQEModelCfg, window_encoded,
                         window_mask_flat, spatial_shapes, window_mask_feats_arr,
                         clip_off, n_frames: int, apply_cls_thres: float,
                         topk: int):
    """Decoder + post-processing on a clip sliced out of the window arrays on
    device. Independent of tracker state, so clip k+1 can be dispatched before the
    host finishes clip k (the device pipeline hides host latency). Two async
    dispatches (slice, then fixed-shape decode) — both are enqueued without a
    host sync, so pipelining is preserved."""
    encoded, mask_flat, mask_feats = _slice_clip(
        window_encoded, window_mask_flat, window_mask_feats_arr, clip_off, n_frames)
    return decode_and_postprocess_clip(params, model_cfg, encoded, mask_flat,
                                       spatial_shapes, mask_feats, n_frames,
                                       apply_cls_thres, topk)


@jax.jit
def siou_and_pack(res, logit_sum, valid_count, clip_count, f0, overlap):
    """Tracker sIoU against the clip's detections + pack every host-needed scalar
    into a single f32 vector (one ~26 ms host round trip per clip)."""
    from ..tracking.mask_memory import mem_siou

    siou = mem_siou(logit_sum, valid_count, clip_count, res["masks"], f0, overlap)
    packed = jnp.concatenate([
        res["scores"].astype(jnp.float32).ravel(),
        res["classes"].astype(jnp.float32).ravel(),
        res["valid"].astype(jnp.float32).ravel(),
        res["cls_probs"].astype(jnp.float32).ravel(),
        res["query_embeds"].astype(jnp.float32).ravel(),
        siou.astype(jnp.float32).ravel(),
    ])
    return packed


def decode_clip_fused(params, model_cfg, window_encoded, window_mask_flat,
                      spatial_shapes, window_mask_feats_arr, clip_off, logit_sum,
                      valid_count, clip_count, f0, overlap, n_frames: int,
                      apply_cls_thres: float, topk: int):
    res = decode_clip_windowed(params, model_cfg, window_encoded, window_mask_flat,
                               spatial_shapes, window_mask_feats_arr, clip_off,
                               n_frames, apply_cls_thres, topk)
    packed = siou_and_pack(res, logit_sum, valid_count, clip_count, f0, overlap)
    return packed, res["masks"]


def unpack_clip_meta(packed: np.ndarray, topk: int, n_cls: int, emb_dim: int,
                     m1: int):
    """Inverse of decode_clip_fused's packing."""
    o = 0
    def take(n, shape):
        nonlocal o
        out = packed[o:o + n].reshape(shape)
        o += n
        return out
    scores = take(topk, (topk,))
    classes = take(topk, (topk,)).astype(np.int64)
    valid = take(topk, (topk,)) > 0.5
    cls_probs = take(topk * n_cls, (topk, n_cls))
    embeds = take(topk * emb_dim, (topk, emb_dim))
    siou = take(m1 * topk, (m1, topk))
    return scores, classes, valid, cls_probs, embeds, siou


def spatial_shapes_for(model_cfg: MDQEModelCfg, padded_hw) -> Tuple[Tuple[int, int], ...]:
    Hp, Wp = padded_hw
    shapes = []
    strides = [8, 16, 32, 64][:model_cfg.n_feature_levels]
    for s in strides:
        shapes.append((-(-Hp // s), -(-Wp // s)))
    return tuple(shapes)


# ---------------------------------------------------------------------------
# host-side windowed video inference (reference inference_vis :291-366)
# ---------------------------------------------------------------------------

# host-blocking time per pipeline stage, accumulated across inference_vis calls
# (reset + read by tools/profile_inference.py; perf_counter cost is negligible)
TIMERS: dict = {}


def _timed(name: str, fn, *args, **kw):
    import time as _time
    t0 = _time.perf_counter()
    out = fn(*args, **kw)
    TIMERS[name] = TIMERS.get(name, 0.0) + (_time.perf_counter() - t0)
    TIMERS[name + "_n"] = TIMERS.get(name + "_n", 0) + 1
    return out

def preprocess_frames(frames_u8, pixel_mean=None, pixel_std=None,
                      size_divisibility=32):
    """frames_u8: (T, H, W, 3) uint8 RGB. Returns zero-padded uint8 (T, Hp, Wp, 3)
    + per-frame sizes (T, 2). Normalization happens on device (encode_window)."""
    T, H, W, _ = frames_u8.shape
    Hp = -(-H // size_divisibility) * size_divisibility
    Wp = -(-W // size_divisibility) * size_divisibility
    out = np.zeros((T, Hp, Wp, 3), np.uint8)
    out[:, :H, :W] = frames_u8
    sizes = np.tile(np.asarray([[H, W]], np.int32), (T, 1))
    return out, sizes


def inference_vis(params, model_cfg: MDQEModelCfg, inf_cfg: InferenceCfg,
                  frames: np.ndarray, image_size: Tuple[int, int],
                  ori_size: Tuple[int, int],
                  pixel_mean=(123.675, 116.28, 103.53),
                  pixel_std=(58.395, 57.12, 57.375)):
    """Run near-online VIS on one video.

    frames: (T, Hp, Wp, 3) padded uint8 (host); normalization runs on device.
    image_size: true (h, w) before padding; ori_size: original video (h, w).
    Returns dict {image_size, pred_scores, pred_labels, pred_masks} like the reference.
    """
    T_clip = inf_cfg.n_frames_test
    real_len = frames.shape[0]
    if real_len < T_clip:  # pad very short videos by repeating the last frame
        frames = np.concatenate([frames] + [frames[-1:]] * (T_clip - real_len))
    video_len = frames.shape[0]
    W_win = inf_cfg.n_frames_window_test
    stride = inf_cfg.clip_stride
    shapes = spatial_shapes_for(model_cfg, frames.shape[1:3])
    mean_dev = jnp.asarray(pixel_mean, jnp.float32)
    std_dev = jnp.asarray(pixel_std, jnp.float32)

    mask_hw = (2 * shapes[0][0], 2 * shapes[0][1])  # mask-head output is stride 4
    tracker = OverTracker(inf_cfg.max_num_instances, T_clip, W_win, stride,
                          inf_cfg.num_classes, model_cfg.hidden_dim, mask_hw,
                          inf_cfg.apply_cls_thres)
    saved_clips = 0
    pred_cls_clips, pred_masks_clips = [], []
    sizes_all = np.tile(np.asarray([list(image_size)], np.int32), (video_len, 1))

    # ---- precompute the clip/window schedule (reference loop :308-332), so clip
    # k+1's decode can be dispatched before clip k's host sync (device pipeline
    # hides the ~26ms round trip + host matching behind decoder compute) ----
    schedule = []  # (start_idx, start_eff, window_start, window_end)
    wstart, wend = 0, 0
    for start_idx in range(0, video_len, stride):
        end_idx = min(start_idx + T_clip, video_len)
        if end_idx > wend:
            wstart = start_idx
            wend = min(start_idx + W_win, video_len)
        # fixed-shape clips: a tail clip that would be short is shifted back to the
        # last full T_clip window (covers the same frames; averages absorb it)
        start_eff = max(0, min(start_idx, video_len - T_clip))
        schedule.append((start_idx, start_eff, wstart, wend))
        if start_idx + T_clip >= video_len:
            break

    window_spans = sorted({(ws, we) for _, _, ws, we in schedule})
    windows, uploads = {}, {}
    chunk = max(int(inf_cfg.encode_chunk), 1)

    def enqueue_upload(ws, we):
        """Start the (async) host->device transfer of a window's frames in
        chunk-sized pieces. Issued one window ahead, so the ~0.3 s transfer of
        a 30-frame window overlaps earlier clips' processing; chunking also
        pipelines the first window's upload with its own encode and lets tail
        windows pad to a chunk multiple instead of the full window size."""
        if ws in uploads or ws in windows:
            return
        wf = frames[ws:we]
        sz = sizes_all[ws:we]
        wlen = -(-wf.shape[0] // chunk) * chunk
        if wf.shape[0] < wlen:
            pad = wlen - wf.shape[0]
            wf = np.concatenate([wf] + [wf[-1:]] * pad)
            sz = np.concatenate([sz] + [sz[-1:]] * pad)
        uploads[ws] = [
            (_timed("frame_upload", jnp.asarray, wf[c0:c0 + chunk]),
             jnp.asarray(sz[c0:c0 + chunk]))
            for c0 in range(0, wlen, chunk)]

    def get_window(ws, we):
        if ws not in windows:
            enqueue_upload(ws, we)
            parts = [_timed("encode_dispatch", encode_window, params, model_cfg,
                            f, s, mean_dev, std_dev, shapes)
                     for f, s in uploads.pop(ws)]
            if len(parts) == 1:
                windows[ws] = parts[0]
            else:
                windows[ws] = tuple(
                    jnp.concatenate([p[j] for p in parts], axis=0)
                    for j in range(3))
            for k in list(windows):  # keep only current + next window alive
                if k not in (ws, wstart):
                    del windows[k]
            for s2, e2 in window_spans:  # prefetch the next window's frames
                if s2 > ws:
                    enqueue_upload(s2, e2)
                    break
        return windows[ws]

    def dispatch_clip(i):
        _, start_eff, ws, we = schedule[i]
        enc, mflat, maskf = get_window(ws, we)
        return _timed("decode_dispatch", decode_clip_windowed, params, model_cfg,
                      enc, mflat, shapes, maskf, start_eff - ws, T_clip,
                      inf_cfg.apply_cls_thres, inf_cfg.clip_topk)

    # cached device constants (uploads cost ~ms each through the tunnel)
    _f0_cache, _ov_cache = {}, {}

    def dev_const(cache, val, arr):
        if val not in cache:
            cache[val] = jnp.asarray(arr)
        return cache[val]

    import time as _time
    res = dispatch_clip(0)
    for i, (start_idx, start_eff, wstart, wend) in enumerate(schedule):
        _it0 = _time.perf_counter()
        is_last_clip = i == len(schedule) - 1
        frame_idx = list(range(start_eff, start_eff + T_clip))
        f0, overlap = tracker.clip_offsets(frame_idx)
        f0_dev = dev_const(_f0_cache, f0, np.int32(f0))
        ov_dev = dev_const(_ov_cache, tuple(overlap), overlap)
        packed = _timed("siou_dispatch", siou_and_pack, res, tracker.logit_sum,
                        tracker.valid_count, tracker.clip_count_dev, f0_dev,
                        ov_dev)
        clip_masks = res["masks"]
        if not is_last_clip:
            res = dispatch_clip(i + 1)  # queue next decode before syncing this one
        packed_host = _timed("clip_sync", np.asarray, packed)
        scores, classes, valid, cls_probs, embeds, siou = unpack_clip_meta(
            packed_host, inf_cfg.clip_topk, inf_cfg.num_classes,
            model_cfg.hidden_dim, inf_cfg.max_num_instances + 1)
        clip_res = ClipResults(
            frame_idx=frame_idx,
            scores=scores, classes=classes, cls_probs=cls_probs,
            mask_logits=clip_masks, query_embeds=embeds, valid=valid,
        )
        _timed("tracker_update", tracker.update, clip_res, siou_full=siou)

        is_output = start_idx + stride >= W_win * (saved_clips + 1)
        if is_last_clip or is_output:
            # one fused device call: average + finalize (bit-packed original-size
            # masks) + rollover, with the big memory buffers donated
            out_cls, packed_dev, len_frames = _timed(
                "finalize_dispatch", tracker.get_result,
                is_last_clip=is_last_clip,
                finalize_args=(inf_cfg.match_stride, image_size, ori_size))
            n = out_cls.shape[0]
            if n > 0:
                sl = packed_dev[:n, :len_frames]  # (n, len, oh, ow/8) device
                try:  # start the d2h copy now; materialized at video end, so the
                    sl.copy_to_host_async()  # transfer hides behind later clips
                except Exception:
                    pass
                packed_np = sl
            else:
                packed_np = np.zeros((0, len_frames, ori_size[0],
                                      -(-ori_size[1] // 8)), np.uint8)
            pred_masks_clips.append(packed_np)
            pred_cls_clips.append(out_cls)
            saved_clips += 1

        _it_ms = 1e3 * (_time.perf_counter() - _it0)
        TIMERS["loop_iter"] = TIMERS.get("loop_iter", 0.0) + _it_ms / 1e3
        TIMERS["loop_iter_n"] = TIMERS.get("loop_iter_n", 0) + 1
        TIMERS.setdefault("clip_ms_series", []).append(round(_it_ms, 1))
        if is_last_clip:
            break

    pred_masks_clips = [_timed("finalize_sync", np.asarray, m)
                        for m in pred_masks_clips]
    out = _timed("merge_video", inference_video, inf_cfg, ori_size,
                 pred_cls_clips, pred_masks_clips)
    if real_len < video_len:  # drop the short-video padding frames
        out["pred_masks"] = [m[:real_len] for m in out["pred_masks"]]
    return out


def inference_video(inf_cfg: InferenceCfg, ori_size, pred_cls_clips,
                    pred_masks_clips):
    """Merge per-window results into final video predictions (reference :430-471).
    pred_masks_clips hold bit-packed binary masks at original size per window."""
    total = pred_cls_clips[-1].shape[0]
    padded_cls = []
    for cls in pred_cls_clips:
        miss = total - cls.shape[0]
        padded_cls.append(np.concatenate([cls, np.zeros((miss, cls.shape[1]),
                                                        cls.dtype)]))
    cls_stack = np.stack(padded_cls)  # (W, N, K)
    out_cls = 0.75 * cls_stack.mean(0) + 0.25 * cls_stack.max(0)

    K = out_cls.shape[1]
    labels = np.tile(np.arange(K), total)
    flat = out_cls.reshape(-1)
    num_topk = max(int((flat > 0.05).sum()), 10)
    top_idx = np.argsort(-flat)[:num_topk]
    out_scores = flat[top_idx].tolist()
    out_labels = labels[top_idx].tolist()
    inst_idx = top_idx // K

    ow = ori_size[1]
    out_masks = []
    for i in inst_idx:
        parts = []
        for m in pred_masks_clips:
            if i < m.shape[0]:
                unpacked = np.unpackbits(m[i], axis=-1)[..., :ow].astype(bool)
            else:
                unpacked = np.zeros((m.shape[1],) + tuple(ori_size), bool)
            parts.append(unpacked)
        out_masks.append(np.concatenate(parts, axis=0))  # (T_total, oh, ow) bool

    return {
        "image_size": ori_size,
        "pred_scores": out_scores,
        "pred_labels": out_labels,
        "pred_masks": out_masks,
    }


# ---------------------------------------------------------------------------
# COCO (single-image / clip) inference path (reference inference_image :486-556)
# ---------------------------------------------------------------------------

def inference_image(params, model_cfg: MDQEModelCfg, inf_cfg: InferenceCfg,
                    image: np.ndarray, image_size, ori_size,
                    pixel_mean=(123.675, 116.28, 103.53),
                    pixel_std=(58.395, 57.12, 57.375)):
    """COCO-style instance segmentation on one image (treated as a 1-frame clip):
    threshold, aligned-bilinear upsample, mask-quality rescoring, box-IoU soft-NMS,
    optional multi-class expansion, resize to the original size.

    image: (1, Hp, Wp, 3) padded uint8 (normalization happens on device).
    Returns dict with scores, classes, masks (n, oh, ow) bool."""
    from ..utils.boxes import box_iou, masks_to_boxes
    from .detr import detr_apply_backbone

    sizes = jnp.asarray([list(image_size)] * image.shape[0], jnp.int32)
    norm = ((jnp.asarray(image).astype(jnp.float32)
             - jnp.asarray(pixel_mean, jnp.float32))
            / jnp.asarray(pixel_std, jnp.float32))
    out = detr_apply_backbone(params, model_cfg, norm, sizes,
                              n_frames=image.shape[0], training=False, is_coco=True)
    cls = np.asarray(out["cls"][0])                      # (Q, K) sigmoid
    masks = np.asarray(out["masks"][0])                  # (Q, T, H4, W4)
    ct = (image.shape[0] - 1) // 2
    mask = masks[:, ct]                                  # (Q, H4, W4)

    score = cls.max(-1)
    keep = score >= min(inf_cfg.apply_cls_thres, score.max())
    idx = np.nonzero(keep)[0]
    cls = cls[idx]
    mask = mask[idx]

    m = jnp.asarray(mask)
    m = aligned_bilinear(m, inf_cfg.match_stride)
    m = np.asarray(m)[:, :image_size[0], :image_size[1]]

    soft = 1.0 / (1.0 + np.exp(-m))
    hard = soft > 0.5
    num = (soft * hard).reshape(len(idx), -1).sum(-1)
    den = hard.reshape(len(idx), -1).sum(-1)
    cls = cls * (num / (den + 1e-6))[:, None]

    if len(idx) > 0:
        order = np.argsort(-cls.max(-1))
        cls, m = cls[order], m[order]
        boxes = np.asarray(masks_to_boxes(jnp.asarray(m > 0)))
        norm = np.array([image_size[1], image_size[0]] * 2)
        biou = np.asarray(box_iou(jnp.asarray(boxes / norm),
                                  jnp.asarray(boxes / norm))[0])
        max_biou = np.triu(biou, k=1).max(0)
        cls = cls * (1 - max_biou)[:, None]

    if inf_cfg.multi_cls_on:
        qi, label = np.nonzero(cls > inf_cfg.apply_cls_thres)
        score = cls[qi, label]
        m = m[qi]
    else:
        score = cls.max(-1)
        label = cls.argmax(-1)

    final = interpolate_bilinear(jnp.asarray(m), ori_size)
    final_masks = np.asarray(final) > 0.0

    return {"scores": score.tolist(), "classes": label.tolist(),
            "masks": final_masks,
            "boxes": np.asarray(masks_to_boxes(jnp.asarray(final_masks)))}
