"""Probe: do the primitives the banded hat-matmul kernel needs work in Mosaic?

1. dynamic sublane-dim ds on a VMEM ref (y-band)
2. dynamic LANE-dim ds with a 128-aligned runtime offset (x-band)
3. lax.cond between two bodies whose matmuls have different static shapes
   (band path vs full-extent fallback)
4. in-kernel scalar reductions (min/max over a block) feeding the ds offsets
5. hx hats built directly in position-major layout via iota // D

Computes out[q, d] = sum_{y,x} hy[q,y] hx[q,x] V[y, x*D+d] — one level of the
position-major hat-matmul, band path exact because out-of-band hats are zero.

Run on TPU: python tools/probe_band_primitives.py
Run on CPU (interpret): python tools/probe_band_primitives.py --interpret
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

D = 32
H, W = 48, 80      # position-major V: (h, w*D)
WD = W * D
BY, BX = 32, 32    # band
BXD = BX * D
Qt = 256


def kernel(g_ref, v_ref, o_ref):
    gy = g_ref[0, :, 0:1]
    gx = g_ref[0, :, 1:2]
    # 4: in-kernel scalar reductions -> ds offsets (clamp coords to the valid
    # hat support [-1, size] first: samples outside contribute nothing)
    gy_c = jnp.clip(gy, -1.0, float(H))
    gx_c = jnp.clip(gx, -1.0, float(W))
    # sublane-dim dynamic offsets must be provably multiples of 8 (f32 tiling),
    # lane-dim offsets multiples of 128 (xlo mult 4 -> xlo*D mult 128)
    ymin = jnp.floor(jnp.min(gy_c)).astype(jnp.int32)
    ylo = pl.multiple_of(
        jnp.clip((ymin // 8) * 8, 0, H - BY), 8)
    yext = jnp.floor(jnp.max(gy_c)).astype(jnp.int32) + 1 - ylo + 1
    xmin = jnp.floor(jnp.min(gx_c)).astype(jnp.int32)
    xlo = pl.multiple_of(jnp.clip((xmin // 4) * 4, 0, W - BX), 4)
    xext = jnp.floor(jnp.max(gx_c)).astype(jnp.int32) + 1 - xlo + 1
    use_band = jnp.logical_and(yext <= BY, xext <= BX)

    def comb(n):  # (n*D, D) 0/1: sums x positions per channel d = lane % D
        return (jax.lax.broadcasted_iota(jnp.int32, (n * D, D), 0) % D
                == jax.lax.broadcasted_iota(jnp.int32, (n * D, D), 1)
                ).astype(jnp.bfloat16)

    def hats(ylo_f, xlo_f, by, bx):
        iy = (jax.lax.broadcasted_iota(jnp.int32, (Qt, by), 1)
              .astype(jnp.float32) + ylo_f)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - gy))
        # 5: hx directly in position-major lane layout, x = lane // D
        ix = (jax.lax.broadcasted_iota(jnp.int32, (Qt, bx * D), 1) // D
              ).astype(jnp.float32) + xlo_f
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(ix - gx))
        return hy, hx

    def band_path(_):
        patch = v_ref[pl.ds(ylo, BY),
                      pl.ds(pl.multiple_of(xlo * D, 128), BXD)]   # 1 + 2
        hy, hx = hats(ylo.astype(jnp.float32), xlo.astype(jnp.float32),
                      BY, BX)
        s = jnp.dot(hy.astype(jnp.bfloat16), patch.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        t = s.astype(jnp.bfloat16) * hx.astype(jnp.bfloat16)
        return jnp.dot(t, comb(BX), preferred_element_type=jnp.float32)

    def full_path(_):
        hy, hx = hats(0.0, 0.0, H, W)
        s = jnp.dot(hy.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        t = s.astype(jnp.bfloat16) * hx.astype(jnp.bfloat16)
        return jnp.dot(t, comb(W), preferred_element_type=jnp.float32)

    o_ref[0] = jax.lax.cond(use_band, band_path, full_path, None)  # 3


def run(g, v):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g.shape[0], Qt, D), jnp.float32),
        grid=(g.shape[0],),
        in_specs=[pl.BlockSpec((1, Qt, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, WD), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Qt, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(g, v)


def oracle(g, v):
    v3 = v.reshape(H, W, D).astype(np.float64)
    out = np.zeros((g.shape[0], Qt, D))
    for b in range(g.shape[0]):
        gy, gx = g[b, :, 0], g[b, :, 1]
        hy = np.maximum(0.0, 1.0 - np.abs(
            np.arange(H)[None].astype(np.float64) - gy[:, None]))
        hx = np.maximum(0.0, 1.0 - np.abs(
            np.arange(W)[None].astype(np.float64) - gx[:, None]))
        out[b] = np.einsum("qy,qx,yxd->qd", hy, hx, v3)
    return out


rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((H, WD)).astype(np.float32))
g_tight = rng.uniform(10.0, 28.0, (2, Qt, 2)).astype(np.float32)
g_wide = rng.uniform(-2.0, 78.0, (2, Qt, 2)).astype(np.float32)
g_wide[:, :, 0] = rng.uniform(-2.0, 46.0, (2, Qt))
for name, g in [("tight(band)", g_tight), ("wide(fallback)", g_wide)]:
    gj = jnp.asarray(g)
    t0 = time.perf_counter()
    out = np.asarray(run(gj, v))
    dt = time.perf_counter() - t0
    ref = oracle(g, np.asarray(v))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"{name}: compiled+ran in {dt:.1f}s  rel_err={err:.2e}  "
          f"{'OK' if err < 2e-2 else 'MISMATCH'}", flush=True)
print("probe done")
