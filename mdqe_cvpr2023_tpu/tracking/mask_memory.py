"""Device-resident tracker mask memory.

The OverTracker's mask state (running logit sums at stride 4) stays in HBM; the host
only ever receives tiny similarity matrices and, once per window, bit-packed binary
masks. This matters because host<->device bandwidth can be the bottleneck (measured
~50 MB/s through the axon tunnel): shipping the 8 MB per-clip mask slab would cost
~150 ms/clip, ~100x the matching math itself.

All functions are jitted with static (M, T, H, W) shapes; dynamic window offsets are
scalars. Binarization uses logit > 0 (== sigmoid > 0.5), and thresholding commutes
with the final nearest-resize, so masks can be binarized and bit-packed on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.misc import aligned_bilinear, interpolate_nearest


@functools.partial(jax.jit, static_argnames=("m1", "mem_length", "h", "w"))
def mem_init(m1: int, mem_length: int, h: int, w: int):
    """Allocate the mask memory ON DEVICE. (A host-side jnp.zeros of the ~250 MB
    logit_sum ships literal zeros through the host->device tunnel — measured
    ~0.8 s per video on axon; a jitted init materializes device-side for free.)"""
    return (jnp.zeros((m1, mem_length, h, w), jnp.float32),
            jnp.zeros((m1, mem_length), jnp.float32),
            jnp.zeros((m1,), jnp.float32))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def mem_update(logit_sum, valid_count, clip_count, masks, slots, f0):
    """logit_sum (M1, L, H, W), valid_count (M1, L), clip_count (M1,);
    masks (K, T, H, W) logits; slots (K,) int32 in [0, M1-1] (last row = dump);
    f0 scalar memory offset of the clip's first frame. A detection is active iff its
    slot is a real instance row; all T clip frames are real (fixed-shape clips)."""
    M1 = logit_sum.shape[0]
    T = masks.shape[1]
    active = (slots < M1 - 1)
    t_idx = f0 + jnp.arange(T)
    contrib = masks * active[:, None, None, None]
    logit_sum = logit_sum.at[slots[:, None], t_idx[None, :]].add(contrib)
    valid_count = valid_count.at[slots[:, None], t_idx[None, :]].add(
        jnp.broadcast_to(active[:, None], (slots.shape[0], T)
                         ).astype(logit_sum.dtype))
    clip_count = clip_count.at[slots].add(active.astype(clip_count.dtype))
    return logit_sum, valid_count, clip_count


@jax.jit
def mem_siou(logit_sum, valid_count, clip_count, masks, f0, overlap):
    """Soft-IoU (binarized) between saved averaged masks and clip masks on
    overlapping frames (reference OverTracker.py:92-113, 144-150).

    clip_count (M1,) clips-matched count per instance; overlap (T,) bool marks clip
    frames already present in memory. Returns (M1, K)."""
    T = masks.shape[1]
    f32 = logit_sum.dtype
    avg = jax.lax.dynamic_slice_in_dim(logit_sum, f0, T, axis=1)
    vc = jax.lax.dynamic_slice_in_dim(valid_count, f0, T, axis=1)
    denom = jnp.clip(clip_count, 1.0, None)[:, None, None, None]
    sm = ((avg / denom > 0) & (vc > 0)[:, :, None, None]
          & overlap[None, :, None, None]).astype(f32)
    im = ((masks > 0) & overlap[None, :, None, None]).astype(f32)

    M1 = sm.shape[0]
    K = im.shape[0]
    smf = sm.reshape(M1, -1)
    imf = im.reshape(K, -1)
    inter = smf @ imf.T
    union = smf.sum(-1)[:, None] + imf.sum(-1)[None] - inter
    valid = (smf.any(-1)[:, None]) & (imf.any(-1)[None])
    return jnp.where(valid, inter / (union + 1e-6), 0.0)


@jax.jit
def mem_average(logit_sum, valid_count):
    """(M1, L, H, W) running sums -> per-frame averaged logits."""
    return logit_sum / jnp.clip(valid_count, 1.0, None)[:, :, None, None]


@functools.partial(jax.jit, static_argnums=(3,))
def mem_rollover(logit_sum, valid_count, clip_count, window_frames: int):
    """Shift residual frames (beyond the window) to the front for the next window;
    residual entries re-enter with count 1 (they hold averaged logits), and every
    existing instance restarts at clip_count 1 (reference :216-223)."""
    avg = mem_average(logit_sum, valid_count)
    L = logit_sum.shape[1]
    roll = L - window_frames
    new_ls = jnp.zeros_like(logit_sum)
    new_vc = jnp.zeros_like(valid_count)
    new_ls = new_ls.at[:, :roll].set(avg[:, window_frames:])
    new_vc = new_vc.at[:, :roll].set(
        (valid_count[:, window_frames:] > 0).astype(valid_count.dtype))
    new_cc = (clip_count > 0).astype(clip_count.dtype)
    return new_ls, new_vc, new_cc


def _nearest_matmul(x, size):
    """Nearest-neighbor resize of the trailing two dims via one-hot selection
    matmuls (MXU) — XLA gather runs at ~5-10 GB/s on this TPU, ~100x below HBM.
    Exact: each output element is a sum with exactly one nonzero term."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    R = (jax.lax.broadcasted_iota(jnp.int32, (oh, h), 1) == iy[:, None]
         ).astype(x.dtype)
    C = (jax.lax.broadcasted_iota(jnp.int32, (w, ow), 0) == ix[None, :]
         ).astype(x.dtype)
    lead = x.shape[:-2]
    xb = x.reshape(-1, h, w)
    y = jnp.einsum("oh,bhw->bow", R, xb, preferred_element_type=x.dtype)
    z = jnp.einsum("bow,wq->boq", y, C, preferred_element_type=x.dtype)
    return z.reshape(*lead, oh, ow)


def _packbits(x_bool):
    """(..., W) bool -> (..., ceil(W/8)) uint8, big-endian bit order."""
    W = x_bool.shape[-1]
    pad = (-W) % 8
    if pad:
        x_bool = jnp.pad(x_bool, [(0, 0)] * (x_bool.ndim - 1) + [(0, pad)])
    x = x_bool.reshape(*x_bool.shape[:-1], -1, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (x * weights).sum(-1).astype(jnp.uint8)


def _finalize_from_avg(avg_logits, match_stride: int, image_size, ori_size,
                       inst_chunk: int):
    """avg_logits (M1, F, h4, w4) -> bit-packed binary masks at original size
    (M1, F, oh, ceil(ow/8)) uint8. Upsample stride-4 logits (aligned bilinear),
    crop padding, threshold at logit 0, nearest-resize to ori (all commuting with
    the reference's sigmoid->resize->0.5 chain), pack bits. Chunked over instances
    to bound the full-resolution intermediate."""
    M1, F, h4, w4 = avg_logits.shape
    pad_m = (-M1) % inst_chunk
    x = jnp.pad(avg_logits, ((0, pad_m), (0, 0), (0, 0), (0, 0)))
    x = x.reshape(-1, inst_chunk, F, h4, w4)

    def chunk(c):
        up = aligned_bilinear(c, match_stride)          # (chunk, F, 4h, 4w)
        up = up[:, :, :image_size[0], :image_size[1]]
        binm = (up > 0).astype(jnp.bfloat16)            # 0/1 exact in bf16
        binm = _nearest_matmul(binm, ori_size) > 0.5    # (chunk, F, oh, ow)
        return _packbits(binm)

    packed = jax.lax.map(chunk, x)
    return packed.reshape(M1 + pad_m, F, ori_size[0], -1)[:M1]


@functools.partial(jax.jit, static_argnames=("match_stride", "image_size",
                                             "ori_size", "inst_chunk"))
def mem_finalize_masks(avg_logits, match_stride: int, image_size, ori_size,
                       inst_chunk: int = 8):
    return _finalize_from_avg(avg_logits, match_stride, image_size, ori_size,
                              inst_chunk)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("window_frames", "match_stride",
                                    "image_size", "ori_size", "rollover",
                                    "inst_chunk"))
def mem_window_output(logit_sum, valid_count, clip_count, window_frames: int,
                      match_stride: int, image_size, ori_size, rollover: bool,
                      inst_chunk: int = 8):
    """One fused per-window device call (average + finalize + rollover): the
    separate calls each re-touched the ~250 MB memory and stalled one clip's
    sync at every window boundary. Donated, so the rolled memory reuses the
    old buffers. Returns (packed_masks over the FULL mem length, new memory)."""
    avg = mem_average(logit_sum, valid_count)
    packed = _finalize_from_avg(avg, match_stride, image_size, ori_size,
                                inst_chunk)
    if rollover:
        L = logit_sum.shape[1]
        roll = L - window_frames
        new_ls = jnp.zeros_like(logit_sum).at[:, :roll].set(
            avg[:, window_frames:])
        new_vc = jnp.zeros_like(valid_count).at[:, :roll].set(
            (valid_count[:, window_frames:] > 0).astype(valid_count.dtype))
        new_cc = (clip_count > 0).astype(clip_count.dtype)
        return packed, new_ls, new_vc, new_cc
    return packed, logit_sum, valid_count, clip_count
