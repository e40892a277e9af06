#!/usr/bin/env python
"""Clip demo: COCO-style instance segmentation on single images, each repeated
as a pseudo-clip with clip-consistent augmentations (reference demo/clip/demo.py
+ demo/clip/predictor.py:67-118 rebuilt for the TPU pipeline).

Usage:
  python demo/clip_demo.py --config-file configs/R50_coco.yaml \
      --input img1.jpg img2.jpg --output out/ [--weights ckpt.pth]
      [--confidence-threshold 0.3] [--no-aug]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", nargs="+", required=True, help="image files")
    p.add_argument("--output", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--confidence-threshold", type=float, default=0.3)
    p.add_argument("--no-aug", action="store_true",
                   help="run the plain center clip without random augmentation")
    p.add_argument("opts", nargs="*", default=[],
                   help="config overrides: KEY VALUE [KEY VALUE ...]")
    return p.parse_args()


def color_for(i):
    rng = np.random.default_rng(i * 7 + 3)
    return rng.integers(60, 255, 3).astype(np.uint8)


def main():
    import cv2
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # sitecustomize may have pinned another platform (see train_net.py)
        jax.config.update("jax_platforms", plat)
    from mdqe_cvpr2023_tpu.data.augmentation import (AugmentationPipeline,
                                                     apply_transforms)
    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer
    from mdqe_cvpr2023_tpu.models.meta import inference_image

    args = parse_args()
    cfg = load_config(args.config_file, args.opts)
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights
    trainer = Trainer(cfg)
    os.makedirs(args.output, exist_ok=True)

    n_frames = cfg.INPUT.SAMPLING_FRAME_NUM
    rng = np.random.default_rng(0)
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)

    # the reference predictor augments the SAME image n_frames times with the
    # train-time clip augmentation (predictor.py:80-84, 96-117); --no-aug uses
    # the test-time resize only
    pipe = AugmentationPipeline(
        min_sizes=[cfg.INPUT.MIN_SIZE_TEST] if args.no_aug
        else list(cfg.INPUT.MIN_SIZE_TRAIN),
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        crop_enabled=not args.no_aug and cfg.INPUT.CROP.ENABLED,
        crop_type=cfg.INPUT.CROP.TYPE,
        crop_size=tuple(cfg.INPUT.CROP.SIZE),
        is_train=not args.no_aug,
    )

    for path in args.input:
        img = cv2.imread(path)
        if img is None:
            print(f"unreadable image: {path}")
            continue
        img = img[:, :, ::-1]  # BGR -> RGB
        H, W = img.shape[:2]

        # one transform list per CLIP, reused across frames (reference
        # predictor.py:80-84): per-frame independent draws produce frames of
        # different sizes, and the zero padding of the smaller frames would be
        # fed to the model as valid image content
        tfms = pipe.sample(rng, (H, W), n_frames=n_frames)
        frames = []
        for t in range(n_frames):
            f, _, _ = apply_transforms(
                tfms, img, np.zeros((0, 4)), np.zeros((0, H, W), bool), t)
            frames.append(f)
        fh = max(f.shape[0] for f in frames)
        fw = max(f.shape[1] for f in frames)
        Hp, Wp = -(-fh // 32) * 32, -(-fw // 32) * 32
        batch = np.zeros((n_frames, Hp, Wp, 3), np.uint8)
        for t, f in enumerate(frames):
            batch[t, :f.shape[0], :f.shape[1]] = f

        out = inference_image(trainer.params, trainer.model_cfg,
                              trainer.inf_cfg, batch, image_size=(fh, fw),
                              ori_size=(H, W), pixel_mean=mean, pixel_std=std)

        vis = img.copy()
        kept = 0
        for i, s in enumerate(out["scores"]):
            if s < args.confidence_threshold:
                continue
            m = out["masks"][i]
            col = color_for(i)
            vis[m] = (0.5 * vis[m] + 0.5 * col).astype(np.uint8)
            x0, y0, x1, y1 = out["boxes"][i].astype(int)
            cv2.rectangle(vis, (x0, y0), (x1, y1), tuple(int(c) for c in col), 2)
            cv2.putText(vis, f"{out['classes'][i]}:{s:.2f}", (x0, max(y0 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        tuple(int(c) for c in col), 1)
            kept += 1
        name = os.path.splitext(os.path.basename(path))[0]
        cv2.imwrite(os.path.join(args.output, f"{name}_vis.jpg"),
                    vis[:, :, ::-1])
        print(f"{name}: {kept} instances above {args.confidence_threshold}")


if __name__ == "__main__":
    main()
