"""Core tensor utilities (TPU-first JAX implementations).

Behavioral parity targets in the reference repo (not copied, re-derived):
  - aligned_bilinear:      /root/reference/mdqe/util/misc.py:485-507
  - inverse_sigmoid:       /root/reference/mdqe/util/misc.py:478-482
  - make_reference_points: /root/reference/mdqe/models/misc.py:21-29
  - grid_sample semantics: torch.nn.functional.grid_sample (align_corners=False)

TPU notes: `aligned_bilinear` is expressed as two small dense matmuls (MXU-friendly)
instead of a pad+resize+pad chain; `grid_sample` is a vectorized batched row-gather
that XLA lowers to an efficient TPU gather.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


@functools.lru_cache(maxsize=None)
def aligned_bilinear_matrix(size: int, factor: int) -> np.ndarray:
    """Dense (factor*size, size) interpolation matrix equivalent to the reference's
    replicate-pad + align_corners=True resize + half-stride shift upsampling.

    The reference computes, along each spatial axis:
      pad right by 1 (replicate) -> resize size+1 -> factor*size+1 (align_corners=True)
      -> pad left by factor//2 (replicate) -> crop to factor*size.
    With align_corners=True the source coordinate of resized index i is exactly i/factor,
    so the whole chain collapses to one sparse matrix M with out[o] = sum_s M[o,s]*in[s].
    """
    assert factor >= 1 and int(factor) == factor
    out = factor * size
    shift = factor // 2
    M = np.zeros((out, size + 1), dtype=np.float32)
    for o in range(out):
        # position in the resized (factor*size+1)-length signal, after left pad+crop
        i = max(o - shift, 0)
        s = i / factor
        s0 = int(np.floor(s))
        frac = s - s0
        M[o, s0] += 1.0 - frac
        if frac > 0:
            M[o, s0 + 1] += frac
    # fold the replicate pad (index `size` duplicates index `size-1`)
    M[:, size - 1] += M[:, size]
    return np.ascontiguousarray(M[:, :size])


def aligned_bilinear(x: jax.Array, factor: int) -> jax.Array:
    """Upsample the trailing two dims (..., H, W) by `factor` with the reference's
    aligned-bilinear semantics. Runs as two matmuls (MXU)."""
    if factor == 1:
        return x
    h, w = x.shape[-2], x.shape[-1]
    My = jnp.asarray(aligned_bilinear_matrix(h, factor), dtype=x.dtype)
    Mx = jnp.asarray(aligned_bilinear_matrix(w, factor), dtype=x.dtype)
    x = jnp.einsum("oh,...hw->...ow", My, x)
    x = jnp.einsum("pw,...hw->...hp", Mx, x)
    return x


def make_reference_points(spatial_shape) -> jax.Array:
    """Normalized per-pixel center reference points for a (H, W) feature map -> (H*W, 2) xy."""
    H, W = int(spatial_shape[0]), int(spatial_shape[1])
    ref_y = (jnp.arange(H, dtype=jnp.float32) + 0.5) / max(H, 1)
    ref_x = (jnp.arange(W, dtype=jnp.float32) + 0.5) / max(W, 1)
    yy, xx = jnp.meshgrid(ref_y, ref_x, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def grid_sample(img: jax.Array, grid: jax.Array, padding_mode: str = "zeros",
                mode: str = "bilinear") -> jax.Array:
    """torch.nn.functional.grid_sample equivalent, align_corners=False.

    img:  (B, H, W, C)   (NHWC — TPU-native layout)
    grid: (B, Hg, Wg, 2) in [-1, 1], last dim (x, y)
    returns (B, Hg, Wg, C)
    """
    B, H, W, C = img.shape
    gx = (grid[..., 0] + 1.0) * (W * 0.5) - 0.5
    gy = (grid[..., 1] + 1.0) * (H * 0.5) - 0.5

    if mode == "nearest":
        # torch rounds via floor(x + 0.5)? torch 'nearest' grid_sample uses round-to-nearest
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        if padding_mode == "border":
            ix = jnp.clip(ix, 0, W - 1)
            iy = jnp.clip(iy, 0, H - 1)
            valid = None
        else:
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            ix = jnp.clip(ix, 0, W - 1)
            iy = jnp.clip(iy, 0, H - 1)
        lin = iy * W + ix
        flat = img.reshape(B, H * W, C)
        out = jnp.take_along_axis(flat, lin.reshape(B, -1, 1), axis=1)
        out = out.reshape(B, *grid.shape[1:3], C)
        if valid is not None:
            out = out * valid[..., None].astype(out.dtype)
        return out

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    flat = img.reshape(B, H * W, C)

    def corner(ix, iy, w):
        if padding_mode == "border":
            cx = jnp.clip(ix, 0, W - 1)
            cy = jnp.clip(iy, 0, H - 1)
            mask = jnp.ones_like(w)
        else:  # zeros
            mask = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)).astype(img.dtype)
            cx = jnp.clip(ix, 0, W - 1)
            cy = jnp.clip(iy, 0, H - 1)
        lin = (cy * W + cx).reshape(B, -1, 1)
        vals = jnp.take_along_axis(flat, lin, axis=1).reshape(B, *grid.shape[1:3], C)
        return vals * (w * mask)[..., None]

    out = (corner(x0, y0, (1 - fx) * (1 - fy))
           + corner(x0 + 1, y0, fx * (1 - fy))
           + corner(x0, y0 + 1, (1 - fx) * fy)
           + corner(x0 + 1, y0 + 1, fx * fy))
    return out


def interpolate_bilinear(x: jax.Array, size) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) on trailing two dims."""
    out_shape = x.shape[:-2] + (int(size[0]), int(size[1]))
    # antialias=False matches torch's default (no AA on downsample)
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def interpolate_nearest(x: jax.Array, size) -> jax.Array:
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out) on trailing two dims."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(size[0]), int(size[1])
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    x = jnp.take(x, iy, axis=-2)
    x = jnp.take(x, ix, axis=-1)
    return x
