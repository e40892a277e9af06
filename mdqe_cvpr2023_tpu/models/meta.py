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

from ..utils.misc import aligned_bilinear
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
    bf16_encode: bool = True       # fp32 backbone+encoder when False (parity tests)
    coco_topk: int = 100           # fixed COCO per-image detection slab
    # reference thresholds, overridable for benchmarking (the crowded-tracker
    # bench disables dedup/suppression so random-weight detections survive and
    # the tracker actually fills): inference_clip's 0.99 query-sim dedup
    # (mdqe.py:389-395) and OverTracker's repeat suppression (:170-181)
    dedup_sim: float = 0.99
    suppress_siou: float = 0.4
    suppress_ctt: float = 0.6
    # HBM allowance for deferred per-window avg slabs ((M+1, W+T, h4, w4) f32);
    # within it, mask finalization waits for the final top-k so only selected
    # rows are upsampled/transferred. Past it, oldest windows finalize all
    # their live rows immediately (exact, slower). 2 GiB keeps ~7 windows of
    # 360p / ~2 of 720p live on a 16 GB chip.
    slab_hbm_budget: int = 2 << 30


# ---------------------------------------------------------------------------
# device-side fixed-shape clip post-processing (reference inference_clip :368-428)
# ---------------------------------------------------------------------------

def postprocess_clip(cls_probs, mask_coeff, query_embeds, mask_feats,
                     apply_cls_thres: float, topk: int,
                     dedup_sim: float = 0.99):
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
    keep = keep & (max_sim < dedup_sim)

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


def _encode_window_core(params, model_cfg: MDQEModelCfg, frames_u8, image_sizes,
                        pixel_mean, pixel_std, spatial_shapes, bf16: bool = True):
    """One launch for a whole window: uint8 frames are normalized on device (4x less
    host->device traffic), then backbone + encoder (bf16, fp32 islands inside the
    deform-attn core — mirrors the reference's fp16-autocast eval) + mask head (f32).
    bf16=False runs the backbone+encoder in f32 (reference-parity testing)."""
    images = (frames_u8.astype(jnp.float32) - pixel_mean) / pixel_std
    p = params
    if bf16:
        images = images.astype(jnp.bfloat16)
        bf16_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            {k: params[k] for k in ("backbone", "input_proj", "transformer_enc")})
        p = dict(params, **bf16_params)
    encoded, mask_flat, _ = detr_encode(p, model_cfg, images, image_sizes)
    encoded = encoded.astype(jnp.float32)
    maskf = detr_mask_feats(params, model_cfg, encoded, spatial_shapes)
    return encoded, mask_flat, maskf


_encode_window_jit = jax.jit(
    _encode_window_core, static_argnames=("model_cfg", "spatial_shapes", "bf16"))


@functools.lru_cache(maxsize=8)
def _encode_window_jit_sharded(mesh):
    """Frame-parallel window encode over a device mesh: every frame of the
    window is independent through backbone+encoder+mask-head (SURVEY §2.9 /
    reference models/mdqe.py:79-105 treats BT as batch), so the frame axis
    shards over 'data' and XLA all-gathers the three replicated outputs over
    ICI (~130 MB bf16 per 30-frame window) for the clip decoder/tracker."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    return jax.jit(_encode_window_core,
                   static_argnames=("model_cfg", "spatial_shapes", "bf16"),
                   out_shardings=(repl, repl, repl))


def encode_window(params, model_cfg: MDQEModelCfg, frames_u8, image_sizes,
                  pixel_mean, pixel_std, spatial_shapes, bf16: bool = True,
                  mesh=None):
    """Window encode; pass a 1-D Mesh(('data',)) to shard frames across chips
    (params must be replicated and frames placed with P('data') by the caller)."""
    if mesh is None or mesh.size == 1:
        return _encode_window_jit(params, model_cfg, frames_u8, image_sizes,
                                  pixel_mean, pixel_std, spatial_shapes, bf16)
    return _encode_window_jit_sharded(mesh)(
        params, model_cfg, frames_u8, image_sizes, pixel_mean, pixel_std,
        spatial_shapes, bf16)


@functools.partial(jax.jit, static_argnames=("model_cfg", "spatial_shapes"))
def window_mask_feats(params, model_cfg: MDQEModelCfg, encoded, spatial_shapes):
    return detr_mask_feats(params, model_cfg, encoded, spatial_shapes)


@functools.partial(jax.jit,
                   static_argnames=("model_cfg", "spatial_shapes", "n_frames",
                                    "apply_cls_thres", "topk", "dedup_sim"))
def decode_and_postprocess_clip(params, model_cfg: MDQEModelCfg, encoded, mask_flat,
                                spatial_shapes, mask_feats, n_frames: int,
                                apply_cls_thres: float, topk: int,
                                dedup_sim: float = 0.99):
    out = decoder_apply(params["transformer_dec"], model_cfg.decoder_cfg, encoded,
                        mask_flat, spatial_shapes, n_frames, training=False)
    return postprocess_clip(out["cls"][0], out["mask_coeff"][0], out["query_embed"][0],
                            mask_feats, apply_cls_thres, topk, dedup_sim)


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


@functools.partial(jax.jit, static_argnums=(1, 6, 7, 8, 9, 10))
def _decode_clips_batched(params, model_cfg: MDQEModelCfg, window_encoded,
                          window_mask_flat, window_mask_feats, offsets,
                          spatial_shapes, n_frames: int, apply_cls_thres: float,
                          topk: int, dedup_sim: float = 0.99):
    """Decode S clips of one window in a single launch (offsets (S,) int32 are
    each clip's first frame within the window). One-clip-per-dispatch decoding
    is launch-bound (~14 ms for ~2 ms of matmuls at B=1); batching the
    independent overlapping clips into BT=S*T fills the MXU and amortizes every
    launch. Returns a dict of (S, ...) fixed slabs (vmapped postprocess)."""
    def gather(a):
        return jax.vmap(
            lambda o: jax.lax.dynamic_slice_in_dim(a, o, n_frames, 0))(offsets)

    enc = gather(window_encoded)        # (S, T, N, C)
    mfl = gather(window_mask_flat)      # (S, T, N)
    mfe = gather(window_mask_feats)     # (S, T, h4, w4, M)
    S = offsets.shape[0]
    out = decoder_apply(params["transformer_dec"], model_cfg.decoder_cfg,
                        enc.reshape(S * n_frames, *enc.shape[2:]),
                        mfl.reshape(S * n_frames, -1),
                        spatial_shapes, n_frames, training=False)
    return jax.vmap(
        lambda c, m, q, f: postprocess_clip(c, m, q, f, apply_cls_thres, topk,
                                            dedup_sim)
    )(out["cls"], out["mask_coeff"], out["query_embed"], mfe)


def _tracker_step_jit():
    from ..tracking.device_tracker import tracker_step

    def step_at(state, tr_cfg, res, i, f0, overlap):
        take = jax.tree.map(lambda x: x[i], res)
        return tracker_step(state, tr_cfg, take["scores"], take["cls_probs"],
                            take["masks"], take["query_embeds"], take["valid"],
                            f0, overlap)

    return jax.jit(step_at, static_argnums=(1,), donate_argnums=(0,))


_TRACKER_STEP = None


def _clip_step(params, model_cfg: MDQEModelCfg, encoded, mask_flat, mask_feats,
               state, f0, overlap, spatial_shapes, n_frames: int,
               tr_cfg, apply_cls_thres: float, topk: int):
    """Per-clip device work: decoder -> fixed-slab post-processing -> on-device
    tracker association + memory update (tracker state donated). No host round
    trip anywhere in the per-clip loop — the host only enqueues and syncs once
    per window. (The host-tracker version paid a ~30-60 ms tunnel round trip per
    clip for the sIoU/slots exchange, 3-4x the clip's actual compute.)

    Deliberately TWO dispatches (decode jit + tracker jit), NOT one fused jit:
    merging the decoder graph with the tracker's Hungarian while_loops into a
    single XLA program makes it ~10x slower on this TPU (measured 387 ms vs
    34 ms — the scheduler handles the loop-heavy tail far worse inside the big
    program). Both dispatches are async, so the split costs no latency."""
    global _TRACKER_STEP
    if _TRACKER_STEP is None:
        _TRACKER_STEP = _tracker_step_jit()
    res = decode_and_postprocess_clip(params, model_cfg, encoded, mask_flat,
                                      spatial_shapes, mask_feats, n_frames,
                                      apply_cls_thres, topk)
    return _TRACKER_STEP(state, tr_cfg, res["scores"], res["cls_probs"],
                         res["masks"], res["query_embeds"], res["valid"],
                         f0, overlap)


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


def _finalize_window(window_out, inf_cfg: InferenceCfg, image_size, ori_size):
    """Sync one window's instance count and dispatch upsample/bit-pack of its
    live rows in fixed-size chunks. avg_dev has M+1 rows; a chunk whose start
    would run past the end is shifted back (dynamic_slice clamps the start
    index, so without the shift the rows returned would NOT begin at c0 and
    the tail instances of a near-full tracker got the wrong masks)."""
    from ..tracking.device_tracker import finalize_avg_chunk
    out_cls_dev, num_inst_dev, avg_dev, len_frames = window_out
    FCH = min(8, inf_cfg.max_num_instances + 1)
    rows = inf_cfg.max_num_instances + 1
    n = int(_timed("count_sync", np.asarray, num_inst_dev))
    chunks = []
    for c0 in range(0, n, FCH):
        start = min(c0, rows - FCH)
        ch = _timed("finalize_chunk_dispatch", finalize_avg_chunk,
                    jax.lax.dynamic_slice_in_dim(avg_dev, start, FCH, 0),
                    inf_cfg.match_stride, tuple(image_size), tuple(ori_size))
        ch = ch[c0 - start:c0 - start + min(FCH, n - c0), :len_frames]
        chunks.append(ch)
    # one device-side concat so the video-end host read is a SINGLE transfer
    # per window (reading each chunk separately costs a full tunnel round trip
    # apiece — 15 RTTs for a 120-instance evicted window; copy_to_host_async
    # is a no-op on axon so the loop serialized them)
    merged = jnp.concatenate(chunks) if len(chunks) > 1 else \
        (chunks[0] if chunks else None)
    if merged is not None:
        try:
            merged.copy_to_host_async()
        except Exception:
            pass
    return out_cls_dev, n, merged, len_frames


@functools.partial(jax.jit, donate_argnums=())
def _take_rows(a, idx):
    return jnp.take(a, idx, axis=0)


@jax.jit
def _pack_cls_counts(clss, nums):
    """Flatten per-window cls scores + instance counts into one f32 vector so
    the end-of-video host reads cost ONE device->host transfer total (counts
    are small ints, exact in f32). Layout: [cls_0.ravel(), ..., counts]."""
    parts = [c.reshape(-1).astype(jnp.float32) for c in clss]
    if nums:
        parts.append(jnp.stack([n.astype(jnp.float32).reshape(()) for n in nums]))
    return jnp.concatenate(parts)


def _finalize_selected(window_out, rows, inf_cfg: InferenceCfg, image_size,
                       ori_size):
    """Upsample + bit-pack ONLY the given live rows of a deferred window's avg
    slab. Returns {row: (len_frames, oh, ceil(ow/8)) uint8}. Rows are gathered
    on device in fixed-size chunks (padded with repeats) so the finalize jit
    compiles once."""
    from ..tracking.device_tracker import finalize_avg_chunk
    out_cls_dev, num_inst_dev, avg_dev, len_frames = window_out
    FCH = min(8, inf_cfg.max_num_instances + 1)
    pend = []
    for c0 in range(0, len(rows), FCH):
        blk = rows[c0:c0 + FCH]
        idx = np.asarray(blk + [blk[-1]] * (FCH - len(blk)), np.int32)
        sel = _take_rows(avg_dev, jnp.asarray(idx))
        ch = _timed("finalize_chunk_dispatch", finalize_avg_chunk, sel,
                    inf_cfg.match_stride, tuple(image_size), tuple(ori_size))
        ch = ch[:len(blk), :len_frames]
        pend.append((blk, ch))
    rowmap = {}
    if pend:
        # single device concat + single host read (per-chunk reads cost a
        # tunnel RTT each; async copies are no-ops on axon)
        merged = jnp.concatenate([ch for _, ch in pend]) if len(pend) > 1 \
            else pend[0][1]
        merged_np = _timed("finalize_sync", np.asarray, merged)
        at = 0
        for blk, _ in pend:
            for j, r in enumerate(blk):
                rowmap[r] = merged_np[at + j]
            at += len(blk)
    return rowmap


def inference_vis(params, model_cfg: MDQEModelCfg, inf_cfg: InferenceCfg,
                  frames: np.ndarray, image_size: Tuple[int, int],
                  ori_size: Tuple[int, int],
                  pixel_mean=(123.675, 116.28, 103.53),
                  pixel_std=(58.395, 57.12, 57.375), mesh=None):
    """Run near-online VIS on one video.

    frames: (T, Hp, Wp, 3) padded uint8 (host); normalization runs on device.
    image_size: true (h, w) before padding; ori_size: original video (h, w).
    mesh: optional 1-D jax.sharding.Mesh(('data',)) — window frames shard
    across its devices for the encode (the dominant cost); decode/tracker run
    replicated, so results are identical to single-chip.
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

    repl = shard_frames = None
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        shard_frames = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, repl)
    else:
        mesh = None

    def _put_frames(a):
        return (jax.device_put(a, shard_frames) if shard_frames is not None
                else jnp.asarray(a))

    def _put_repl(a):
        return jax.device_put(a, repl) if repl is not None else jnp.asarray(a)

    mean_dev = _put_repl(np.asarray(pixel_mean, np.float32))
    std_dev = _put_repl(np.asarray(pixel_std, np.float32))

    from ..tracking.device_tracker import (TrackerCfg, finalize_avg_chunk,
                                           tracker_state_init,
                                           tracker_window_average)

    mask_hw = (2 * shapes[0][0], 2 * shapes[0][1])  # mask-head output is stride 4
    tr_cfg = TrackerCfg(num_max_inst=inf_cfg.max_num_instances,
                        num_frames=T_clip, window_frames=W_win,
                        clip_stride=stride, num_classes=inf_cfg.num_classes,
                        embed_dim=model_cfg.hidden_dim, mask_hw=mask_hw,
                        apply_cls_thres=inf_cfg.apply_cls_thres,
                        suppress_siou=inf_cfg.suppress_siou,
                        suppress_ctt=inf_cfg.suppress_ctt)
    state = tracker_state_init(tr_cfg)
    if repl is not None:
        state = jax.device_put(state, repl)
    slab_bytes = 4 * (inf_cfg.max_num_instances + 1) * tr_cfg.mem_length \
        * mask_hw[0] * mask_hw[1]
    keep_slabs = max(2, int(inf_cfg.slab_hbm_budget) // slab_bytes)
    # host shadow of the frame bookkeeping (reference clip_offsets semantics)
    start_frame = 0
    saved_idx: set = set()
    saved_clips = 0
    window_outputs = []  # pending (out_cls_dev, num_inst_dev, avg_dev, len)
    finalized = []       # windows already through _finalize_window
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
    if mesh is not None:  # even frame sharding needs chunk % mesh.size == 0
        chunk = -(-chunk // mesh.size) * mesh.size

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
            (_timed("frame_upload", _put_frames, wf[c0:c0 + chunk]),
             _put_frames(sz[c0:c0 + chunk]))
            for c0 in range(0, wlen, chunk)]

    def get_window(ws, we):
        if ws not in windows:
            enqueue_upload(ws, we)
            parts = [_timed("encode_dispatch",
                            functools.partial(encode_window,
                                              bf16=inf_cfg.bf16_encode,
                                              mesh=mesh),
                            params, model_cfg, f, s, mean_dev, std_dev, shapes)
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

    # cached device constants (uploads cost ~ms each through the tunnel)
    _f0_cache, _ov_cache = {}, {}

    def dev_const(cache, val, arr):
        if val not in cache:
            cache[val] = _put_repl(arr)
        return cache[val]

    # group consecutive clips that share an encode window into fixed-size decode
    # batches (padded with repeats; padded entries simply aren't tracker-stepped)
    S_BATCH = 8
    groups = []  # (window_key, [schedule indices])
    for i, (_, _, ws, we) in enumerate(schedule):
        if groups and groups[-1][0] == (ws, we) and len(groups[-1][1]) < S_BATCH:
            groups[-1][1].append(i)
        else:
            groups.append(((ws, we), [i]))
    batch_of_clip = {}
    for g, (wk, idxs) in enumerate(groups):
        for j, i in enumerate(idxs):
            batch_of_clip[i] = (g, j)
    batch_res = {}

    global _TRACKER_STEP
    if _TRACKER_STEP is None:
        _TRACKER_STEP = _tracker_step_jit()

    import time as _time
    for i, (start_idx, start_eff, wstart, wend) in enumerate(schedule):
        _it0 = _time.perf_counter()
        is_last_clip = i == len(schedule) - 1
        frame_idx = list(range(start_eff, start_eff + T_clip))
        f0 = max(frame_idx[0] - start_frame, 0)
        overlap = np.array([f in saved_idx and f >= start_frame
                            for f in frame_idx], bool)
        f0_dev = dev_const(_f0_cache, f0, np.int32(f0))
        ov_dev = dev_const(_ov_cache, tuple(overlap), overlap)

        g, j = batch_of_clip[i]
        if g not in batch_res:
            (ws, we), idxs = groups[g]
            enc, mflat, maskf = get_window(ws, we)
            offs = [schedule[k][1] - ws for k in idxs]
            offs = tuple(offs + [offs[-1]] * (S_BATCH - len(offs)))
            offs_dev = dev_const(_f0_cache, offs, np.asarray(offs, np.int32))
            res = _timed("decode_dispatch", _decode_clips_batched, params,
                         model_cfg, enc, mflat, maskf, offs_dev, shapes,
                         T_clip, inf_cfg.apply_cls_thres, inf_cfg.clip_topk,
                         inf_cfg.dedup_sim)
            batch_res = {g: res}  # keep only the current batch alive
        state = _timed("clip_dispatch", _TRACKER_STEP, state, tr_cfg,
                       batch_res[g], j, f0_dev, ov_dev)
        saved_idx.update(frame_idx)

        is_output = start_idx + stride >= W_win * (saved_clips + 1)
        if is_last_clip or is_output:
            n_valid = max(saved_idx) - start_frame + 1
            len_frames = W_win if not is_last_clip else int(n_valid)
            out_cls_dev, num_inst_dev, avg_dev, state = _timed(
                "finalize_dispatch", tracker_window_average, state, tr_cfg,
                is_last_clip)
            for a in (out_cls_dev, num_inst_dev):
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
            window_outputs.append((out_cls_dev, num_inst_dev, avg_dev,
                                   len_frames))
            # Defer mask finalization to video end when HBM allows: the final
            # top-k selection needs only the (tiny) cls scores, so deferred
            # windows upsample + transfer ONLY the selected rows instead of all
            # live ones (at 120 live instances the all-rows path costs ~6 s per
            # 36-frame video in upsample + d2h). Slabs are ~(M+1, W+T, h4, w4)
            # fp32; beyond the budget the OLDEST window falls back to the
            # all-live-rows path (exact, just slower). Eviction only when >=2
            # newer windows exist, so the evicted window's count sync has
            # landed (FIFO queue) and never blocks the pipeline.
            if len(window_outputs) > keep_slabs:
                finalized.append(_finalize_window(window_outputs.pop(0),
                                                  inf_cfg, image_size, ori_size))
            saved_clips += 1
            if not is_last_clip:  # host shadow of the rollover (reference :216)
                start_frame += W_win
                saved_idx = {f for f in saved_idx if f >= start_frame}

        _it_ms = 1e3 * (_time.perf_counter() - _it0)
        TIMERS["loop_iter"] = TIMERS.get("loop_iter", 0.0) + _it_ms / 1e3
        TIMERS["loop_iter_n"] = TIMERS.get("loop_iter_n", 0) + 1
        TIMERS.setdefault("clip_ms_series", []).append(round(_it_ms, 1))
        if is_last_clip:
            break

    # ---- video end: select FIRST, materialize masks second ----
    # The final top-k (reference inference_video :430-471) depends only on the
    # per-window cls scores, which are tiny and already on their way to the
    # host. So: merge cls -> top-k -> upsample/bit-pack/transfer masks only for
    # the SELECTED instances of still-deferred windows. Output-identical to the
    # reference order (which materializes every live instance's full-res mask
    # per window) and turns the dominant crowded-video cost from O(live
    # instances) into O(top-k). Budget-evicted windows already transferred all
    # their live rows (exact either way).
    # One packed fetch for every remaining tiny read: through the tunnel each
    # np.asarray is a full round trip (copy_to_host_async is a no-op on axon),
    # and the old per-window count/cls reads serialized 2 RTTs per pending
    # window — the driver-geometry stage budget showed those two count_syncs
    # alone costing 2.2 s of a 3.4 s video in a slow window. Packing all
    # pending windows' (cls, count) into one device concat costs one dispatch
    # + ONE sync regardless of window count.
    pend_cls = [fin[0] for fin in finalized] + [wo[0] for wo in window_outputs]
    pend_num = [wo[1] for wo in window_outputs]
    if pend_cls:
        packed = _timed("count_sync", lambda: np.asarray(
            _pack_cls_counts(pend_cls, pend_num)))
    else:
        packed = np.zeros(0, np.float32)
    cls_sz = [int(np.prod(c.shape)) for c in pend_cls]
    offs = np.concatenate([[0], np.cumsum(cls_sz)])
    counts = packed[offs[-1]:]

    win_cls, win_len, win_src = [], [], []
    for k, (out_cls_dev, n, chunks, len_frames) in enumerate(finalized):
        cls_np = packed[offs[k]:offs[k + 1]].reshape(out_cls_dev.shape)
        win_cls.append(cls_np[:n])
        win_len.append(len_frames)
        win_src.append(("full", n, chunks))
    for k, wo in enumerate(window_outputs):
        out_cls_dev, num_inst_dev, _, len_frames = wo
        kk = len(finalized) + k
        n = int(counts[k])
        win_cls.append(packed[offs[kk]:offs[kk + 1]]
                       .reshape(out_cls_dev.shape)[:n])
        win_len.append(len_frames)
        win_src.append(("slab", n, wo))

    out_scores, out_labels, inst_idx, total = inference_video(inf_cfg, win_cls)

    # materialize masks: full windows fetch their (already-transferring)
    # chunks; deferred windows finalize only the selected rows
    sel_rows = sorted({int(i) for i in inst_idx})
    pw = -(-ori_size[1] // 8)
    win_masks = []  # per window: ndarray (n, L, oh, pw) OR (n, dict row->mask)
    for (kind, n, src), len_frames in zip(win_src, win_len):
        if kind == "full":
            if n > 0:
                win_masks.append(_timed("finalize_sync", np.asarray, src))
            else:
                win_masks.append(np.zeros((0, len_frames, ori_size[0], pw),
                                          np.uint8))
        else:
            rows = [r for r in sel_rows if r < n]
            win_masks.append((n, _finalize_selected(src, rows, inf_cfg,
                                                    image_size, ori_size)))

    def _assemble():
        ow = ori_size[1]
        out_masks = []
        for i in inst_idx:
            parts = []
            for wm, len_frames in zip(win_masks, win_len):
                if isinstance(wm, tuple):
                    n, rowmap = wm
                    m = rowmap.get(int(i)) if i < n else None
                else:
                    m = wm[i] if i < wm.shape[0] else None
                if m is None:
                    parts.append(np.zeros((len_frames,) + tuple(ori_size), bool))
                else:
                    # unpackbits yields 0/1 uint8 -> view(bool) is copy-free
                    parts.append(
                        np.unpackbits(m, axis=-1)[..., :ow].view(bool))
            out_masks.append(np.concatenate(parts, axis=0))  # (T, oh, ow)
        return out_masks

    out = {
        "image_size": ori_size,
        "pred_scores": out_scores,
        "pred_labels": out_labels,
        "pred_masks": _timed("merge_video", _assemble),
        # tracker occupancy at the final window (diagnostic; the crowded bench
        # reports it to prove the occupancy-dependent costs were exercised)
        "num_tracks": int(total),
    }
    if real_len < video_len:  # drop the short-video padding frames
        out["pred_masks"] = [m[:real_len] for m in out["pred_masks"]]
    return out


def inference_video(inf_cfg: InferenceCfg, pred_cls_clips):
    """Final score merge + top-k selection (reference inference_video
    :430-471, minus mask materialization which inference_vis now does lazily
    for the selected instances only). pred_cls_clips: per-window (n_w, K) cls
    scores. Returns (scores, labels, instance row indices, total rows)."""
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
    return (flat[top_idx].tolist(), labels[top_idx].tolist(),
            top_idx // K if total else top_idx, int(total))


# ---------------------------------------------------------------------------
# COCO (single-image / clip) inference path (reference inference_image :486-556)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model_cfg", "inf_cfg"))
def _coco_device_stage(params, model_cfg: MDQEModelCfg, inf_cfg: InferenceCfg,
                       image_u8, sizes, pixel_mean, pixel_std):
    """ALL device work of COCO single-image inference as ONE fixed-slab jitted
    stage (reference inference_image mdqe.py:486-556, masked fixed-shape like
    postprocess_clip): normalize, full forward, aligned-bilinear upsample,
    padding masked out, mask-quality rescoring, box-IoU score decay in score
    order, multi-class expansion into a fixed top-D slab of (score, label,
    query) with bit-packed binary masks. The previous implementation ran the
    forward eagerly and hopped host<->device per stage — seconds per image
    through a remote-TPU tunnel; this is a single async dispatch."""
    from ..tracking.mask_memory import _packbits
    from ..utils.boxes import box_iou, masks_to_boxes
    from .detr import detr_apply_backbone

    T = image_u8.shape[0]
    norm = ((image_u8.astype(jnp.float32) - pixel_mean) / pixel_std)
    out = detr_apply_backbone(params, model_cfg, norm, sizes, n_frames=T,
                              training=False, is_coco=True)
    cls = out["cls"][0].astype(jnp.float32)     # (Q, K) sigmoid
    ct = (T - 1) // 2
    m4 = out["masks"][0][:, ct]                 # (Q, H4, W4) logits
    Q, K = cls.shape
    neg = jnp.float32(-1e9)

    up = aligned_bilinear(m4, inf_cfg.match_stride)          # (Q, H, W)
    H, W = up.shape[-2], up.shape[-1]
    h, w = sizes[0, 0], sizes[0, 1]
    valid2d = (jnp.arange(H)[:, None] < h) & (jnp.arange(W)[None, :] < w)
    up = jnp.where(valid2d[None], up, neg)      # padding == the reference crop

    score0 = cls.max(-1)
    keep = score0 >= jnp.minimum(inf_cfg.apply_cls_thres, score0.max())

    soft = jax.nn.sigmoid(up).reshape(Q, -1)
    hard_f = (soft > 0.5).astype(jnp.float32)
    num = (soft * hard_f).sum(-1)
    den = hard_f.sum(-1)
    cls = cls * (num / (den + 1e-6))[:, None]

    # box-IoU score decay among kept queries in rescored-score order
    # (reference resorts then triu(biou, 1).max(0), mdqe.py:520-532)
    hard2 = up > 0.0                                         # (Q, H, W)
    boxes = masks_to_boxes(hard2)
    biou = box_iou(boxes, boxes)[0]
    s_rank = jnp.where(keep, cls.max(-1), neg)
    order = jnp.argsort(-s_rank)
    rank = jnp.argsort(order)
    higher = (rank[None, :] < rank[:, None]) & keep[None, :]
    max_biou = jnp.max(jnp.where(higher, biou, 0.0), axis=1)
    cls = cls * (1 - max_biou)[:, None]

    D = min(inf_cfg.coco_topk, Q * K)
    if inf_cfg.multi_cls_on:
        flat = jnp.where(keep[:, None] & (cls > inf_cfg.apply_cls_thres),
                         cls, neg).reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, D)
        qi = top_i // K
        labels = top_i % K
    else:
        per_q = jnp.where(keep, cls.max(-1), neg)
        top_s, qi = jax.lax.top_k(per_q, min(D, Q))
        labels = cls.argmax(-1)[qi]
    valid = top_s > neg / 2
    packed = _packbits(hard2[qi])               # (D, H, ceil(W/8))
    return top_s, labels, valid, packed


def inference_image(params, model_cfg: MDQEModelCfg, inf_cfg: InferenceCfg,
                    image: np.ndarray, image_size, ori_size,
                    pixel_mean=(123.675, 116.28, 103.53),
                    pixel_std=(58.395, 57.12, 57.375)):
    """COCO-style instance segmentation on one image (treated as a 1-frame clip):
    threshold, aligned-bilinear upsample, mask-quality rescoring, box-IoU soft-NMS,
    optional multi-class expansion, resize to the original size.

    image: (T, Hp, Wp, 3) padded uint8 (normalization happens on device).
    Returns dict with scores, classes, masks (n, oh, ow) bool, boxes.

    Deliberate deviation (like the VIS path): masks are binarized at model
    resolution on device and nearest-resized to the original size on the host,
    instead of the reference's bilinear-resize-then-threshold on logits
    (mdqe.py:546-548) — differs only on sub-pixel boundary rounding."""
    sizes = jnp.asarray([list(image_size)] * image.shape[0], jnp.int32)
    top_s, labels, valid, packed = _coco_device_stage(
        params, model_cfg, inf_cfg, jnp.asarray(image), sizes,
        jnp.asarray(pixel_mean, jnp.float32), jnp.asarray(pixel_std, jnp.float32))
    valid = np.asarray(valid)
    n = int(valid.sum())
    scores = np.asarray(top_s)[:n]
    labels = np.asarray(labels)[:n]
    W = image.shape[2]
    masks = np.unpackbits(np.asarray(packed)[:n], axis=-1)[..., :W].astype(bool)
    masks = masks[:, :image_size[0], :image_size[1]]

    oh, ow = int(ori_size[0]), int(ori_size[1])
    iy = np.floor(np.arange(oh) * (image_size[0] / oh)).astype(np.int64)
    ix = np.floor(np.arange(ow) * (image_size[1] / ow)).astype(np.int64)
    final_masks = masks[:, iy][:, :, ix] if n else np.zeros((0, oh, ow), bool)

    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(final_masks[i])
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]

    return {"scores": scores.tolist(), "classes": labels.tolist(),
            "masks": final_masks, "boxes": boxes}
