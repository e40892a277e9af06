"""Probe: MXU throughput vs contraction depth K for the banded-kernel shapes.

The banded hat-matmul's stage 1 is (P*Qt=1024, K) @ (K, N) with K = the band
height. If the MXU pads K to 128 (bf16 systolic depth), shrinking K below 128
buys nothing and the band design should only shrink N (the minor axis). This
times the marginal cost of stage-1-shaped matmuls chained inside one jit
(per the verify-skill gotcha: standalone Pallas ops pay ~60ms one-time glue).

Run: python tools/probe_mxu_kdepth.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1024
REPS = 48  # matmuls chained inside the kernel per grid cell


def make_kernel(K, N):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for i in range(REPS):
            # rotate the lhs a little so the compiler can't CSE the chain
            a = a_ref[:] + jnp.float32(i)
            acc += jnp.dot(a.astype(jnp.bfloat16), b_ref[:],
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc
    return kernel


def run(K, N, grid=8):
    a = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((K, 128)).astype(np.float32))
    a = jnp.tile(a[:, :1], (1, M)).T[:, :K] * 0.01  # (M, K) cheap to build
    b = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((K, N)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    f = pl.pallas_call(
        make_kernel(K, N),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((M, K), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    np.asarray(fj(a, b).ravel()[:1])  # compile
    t0 = time.perf_counter()
    n_iter = 3
    for i in range(n_iter):
        np.asarray(fj(a + 0.001 * i, b).ravel()[:1])
    dt = (time.perf_counter() - t0) / n_iter
    flops = 2.0 * M * K * N * REPS * grid
    print(f"K={K:4d} N={N:5d}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.2f} TF/s  "
          f"({flops/dt/1e12/197*100:4.1f}% peak)  "
          f"per-matmul {dt/REPS/grid*1e6:6.1f} us", flush=True)


for N in (1024, 1536):
    for K in (16, 32, 48, 64, 80, 128, 256):
        run(K, N)
print("kdepth probe done")
