#!/usr/bin/env python
"""Training / evaluation CLI (reference train_net.py rebuilt TPU-native).

Usage:
  python train_net.py --config-file configs/R50_ovis_360.yaml [--eval-only]
      [--datasets-root DIR] [--max-iter N] [KEY VALUE ...]

Distributed execution: instead of the reference's `launch` multi-process DDP, the
trainer jits one global-batch step over Mesh(jax.devices(), ('data',)); on multi-host
TPU slices run one process per host (jax.distributed.initialize is called when the
environment indicates multiple processes).
"""
import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="MDQE TPU training")
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--datasets-root", default=None)
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("--max-videos", type=int, default=None,
                   help="cap eval videos (smoke tests)")
    p.add_argument("--profile-at", type=int, default=None,
                   help="capture a jax.profiler trace at this iteration")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="config overrides: KEY VALUE pairs")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    # honor an explicit JAX_PLATFORMS even when the interpreter's sitecustomize
    # imported jax first and pinned another platform (env alone is then too
    # late — it must be re-applied via jax.config before any array exists)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    if int(os.environ.get("JAX_PROCESS_COUNT", "1")) > 1:
        jax.distributed.initialize()

    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    cfg = load_config(args.config_file, args.opts or None)
    trainer = Trainer(cfg, datasets_root=args.datasets_root)
    if args.resume:
        trainer.load_checkpoint(args.resume)

    if args.eval_only:
        trainer.test(max_videos=args.max_videos)
        return
    trainer.train(max_iter=args.max_iter, profile_at=args.profile_at)
    trainer.test(max_videos=args.max_videos)


if __name__ == "__main__":
    main()
