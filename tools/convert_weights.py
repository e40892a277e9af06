#!/usr/bin/env python
"""Weight conversion CLI (reference convert_inflated_weights.py).

1. inflate: temporal inflation of temp_attn_inst/temp_embed weights f_pretrain ->
   f_target (writes a new .pth; also applied automatically by the Trainer when
   PRETRAIN_FRAME_NUM != SAMPLING_FRAME_NUM).
2. to-d2: prefix a raw Swin checkpoint's keys with detr.backbone.0.backbone.
3. to-jax: convert a .pth into an orbax checkpoint of the JAX param tree.

Usage:
  python tools/convert_weights.py inflate --source model.pth --num-frames 4 \
      [--pretrain-frames 1]
  python tools/convert_weights.py to-d2 --source swin.pth
  python tools/convert_weights.py to-jax --source model.pth --out ckpt_dir
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    i = sub.add_parser("inflate")
    i.add_argument("--source", required=True)
    i.add_argument("--num-frames", type=int, required=True)
    i.add_argument("--pretrain-frames", type=int, default=1)
    d = sub.add_parser("to-d2")
    d.add_argument("--source", required=True)
    j = sub.add_parser("to-jax")
    j.add_argument("--source", required=True)
    j.add_argument("--out", required=True)
    args = p.parse_args()

    import numpy as np
    import torch

    if args.cmd == "inflate":
        from mdqe_cvpr2023_tpu.engine.checkpoint import inflate_temporal_weights
        ckpt = torch.load(args.source, map_location="cpu", weights_only=False)
        state = ckpt.get("model", ckpt)
        state = {k: np.asarray(v) for k, v in state.items()}
        out = inflate_temporal_weights(state, args.pretrain_frames, args.num_frames)
        path = args.source[:-4] + f"_inflated_to_f{args.num_frames}.pth"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in out.items()}, path)
        print("wrote", path)
    elif args.cmd == "to-d2":
        ckpt = torch.load(args.source, map_location="cpu", weights_only=False)
        state = ckpt.get("model", ckpt)
        out = {"detr.backbone.0.backbone." + k: v for k, v in state.items()}
        path = args.source[:-4] + "_d2.pth"
        torch.save(out, path)
        print("wrote", path)
    else:
        import orbax.checkpoint as ocp
        from mdqe_cvpr2023_tpu.engine.checkpoint import load_torch_checkpoint
        params = load_torch_checkpoint(args.source)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.out), {"params": params}, force=True)
        ckptr.wait_until_finished()
        print("wrote", args.out)


if __name__ == "__main__":
    main()
