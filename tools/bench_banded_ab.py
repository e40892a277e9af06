"""A/B bench: banded vs legacy hat-matmul deform-attn kernels on real TPU.

Encoder scale = the flagship driver geometry (R50 f4 360p): levels
(48,80)/(24,40)/(12,20)/(6,10), Q = N = 5100, B=4 frames, H=8 heads, D=32,
P=4 points. Locations are encoder-like (per-pixel reference point + small
learned-offset-scale jitter), matching what measure_sampling_extent.py found
on the real model. Reports fwd and fwd+bwd wall time and the speedup.

Run: python tools/bench_banded_ab.py [--scatter 0.08] [--iters 20]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mdqe_cvpr2023_tpu.ops.deform_attn_pallas import Q_TILE, ms_deform_attn_pallas

SHAPES = ((48, 80), (24, 40), (12, 20), (6, 10))
# training geometry (R50_ovis_360 largest bucket, 512x800): B = clips*frames
TRAIN_SHAPES = ((64, 100), (32, 50), (16, 25), (8, 13))


def encoder_inputs(shapes, B=4, H=8, D=32, P=4, scatter=0.08, seed=0):
    rng = np.random.default_rng(seed)
    L = len(shapes)
    n = sum(h * w for h, w in shapes)
    value = rng.standard_normal((B, n, H, D)).astype(np.float32)
    refs = []
    for (h, w) in shapes:
        yy, xx = np.mgrid[0:h, 0:w]
        refs.append(np.stack([(xx.ravel() + 0.5) / w,
                              (yy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs)
    loc = (ref[None, :, None, None, None, :]
           + rng.uniform(-scatter, scatter, (B, n, H, L, P, 2))
           ).astype(np.float32)
    attw = rng.dirichlet(np.ones(L * P), (B, n, H)).reshape(
        B, n, H, L, P).astype(np.float32)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attw)


def sync(out):
    """Force completion via a device->host read (block_until_ready does not
    actually wait through the axon tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, args, iters, warmup=3):
    """The axon client caches execution results for identical (fn, args) —
    cycle through distinct value buffers so every call really executes."""
    value, loc, attw = args
    variants = [value + jnp.float32(i) * jnp.float32(1e-6)
                for i in range(warmup + iters)]
    sync(variants[-1])
    for k in range(warmup):
        sync(fn(variants[k], loc, attw))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[warmup + i], loc, attw)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scatter", type=float, default=0.08)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train-geom", action="store_true",
                    help="512x800 training levels, B=8 frames (2 clips x f4)")
    args = ap.parse_args()

    shapes = TRAIN_SHAPES if args.train_geom else SHAPES
    value, loc, attw = encoder_inputs(shapes, B=8 if args.train_geom else 4,
                                      scatter=args.scatter)
    res = {"geom": "train_512x800" if args.train_geom else "eval_360p"}
    for banded in (False, True):
        tag = "banded" if banded else "legacy"

        @jax.jit
        def fwd(v, l, a, banded=banded):
            return ms_deform_attn_pallas(v, shapes, l, a, Q_TILE,
                                         "bfloat16", banded)

        @jax.jit
        def fwdbwd(v, l, a, banded=banded):
            def loss(v, l, a):
                return (ms_deform_attn_pallas(v, shapes, l, a, Q_TILE,
                                              "bfloat16", banded) ** 2).sum()
            return jax.grad(loss, argnums=(0, 1, 2))(v, l, a)

        res[f"fwd_{tag}_ms"] = timed(fwd, (value, loc, attw),
                                     args.iters) * 1e3
        res[f"fwdbwd_{tag}_ms"] = timed(fwdbwd, (value, loc, attw),
                                        args.iters) * 1e3
        print(f"{tag}: fwd {res[f'fwd_{tag}_ms']:.2f} ms   "
              f"fwd+bwd {res[f'fwdbwd_{tag}_ms']:.2f} ms", flush=True)

    res["fwd_speedup"] = res["fwd_legacy_ms"] / res["fwd_banded_ms"]
    res["fwdbwd_speedup"] = res["fwdbwd_legacy_ms"] / res["fwdbwd_banded_ms"]
    res["bwd_speedup"] = ((res["fwdbwd_legacy_ms"] - res["fwd_legacy_ms"])
                          / (res["fwdbwd_banded_ms"] - res["fwd_banded_ms"]))
    res["scatter"] = args.scatter
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
