#!/usr/bin/env python
"""Model analysis: parameter counts and FLOPs via jax cost analysis
(reference tools/analyze_model.py rebuilt on XLA's own cost model).

Usage: python tools/analyze_model.py --config-file configs/R50_ovis_360.yaml
       [--tasks parameter flop structure] [--size 384 640]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_params(tree, prefix=""):
    import jax
    total = 0
    rows = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            n, r = count_params(v, f"{prefix}.{k}" if prefix else k)
            total += n
            rows += r
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            n, r = count_params(v, f"{prefix}.{i}")
            total += n
            rows += r
    elif hasattr(tree, "size"):
        total = int(np.prod(tree.shape))
        rows = [(prefix, tuple(tree.shape), total)]
    return total, rows


def main():
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # sitecustomize may have pinned another platform (see train_net.py)
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.build import build_model_cfg
    from mdqe_cvpr2023_tpu.models.detr import detr_init, detr_apply_backbone

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--tasks", nargs="+", default=["parameter", "flop"],
                   choices=["parameter", "flop", "structure"])
    p.add_argument("--size", nargs=2, type=int, default=[384, 640])
    args = p.parse_args()

    cfg = load_config(args.config_file)
    mcfg = build_model_cfg(cfg)
    params = detr_init(jax.random.PRNGKey(0), mcfg)

    if "parameter" in args.tasks or "structure" in args.tasks:
        total, rows = count_params(params)
        if "structure" in args.tasks:
            for name, shape, n in rows:
                print(f"{name:70s} {str(shape):24s} {n:>12,}")
        by_top = {}
        for name, _, n in rows:
            by_top[name.split(".")[0]] = by_top.get(name.split(".")[0], 0) + n
        for k, v in sorted(by_top.items(), key=lambda x: -x[1]):
            print(f"{k:20s} {v / 1e6:8.2f}M")
        print(f"total parameters: {total / 1e6:.2f}M")

    if "flop" in args.tasks:
        T = mcfg.n_frames
        H, W = args.size
        images = jnp.zeros((T, H, W, 3), jnp.float32)
        sizes = jnp.asarray([[H, W]] * T, jnp.int32)

        def fwd(params, images, sizes):
            out = detr_apply_backbone(params, mcfg, images, sizes, n_frames=T,
                                      training=False)
            return out["cls"]

        lowered = jax.jit(fwd).lower(params, images, sizes)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", float("nan"))
        print(f"forward FLOPs @ {T}x{H}x{W}: {flops / 1e9:.1f} GFLOP "
              f"({flops / T / 1e9:.1f} GFLOP/frame)")


if __name__ == "__main__":
    main()
