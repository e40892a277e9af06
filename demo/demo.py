#!/usr/bin/env python
"""Video demo: run VIS inference on directories of frames and write visualized
videos (reference demo/demo.py + demo/predictor.py rebuilt for the TPU pipeline).

Usage:
  python demo/demo.py --config-file configs/R50_ovis_360.yaml \
      --input datasets/ovis/valid/<video_dir> [...] --output out/ \
      [--weights ckpt.pth] [--confidence-threshold 0.3]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", nargs="+", required=True,
                   help="video frame directories (or single video files with cv2)")
    p.add_argument("--output", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--confidence-threshold", type=float, default=0.3)
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="config overrides: KEY VALUE [KEY VALUE ...]")
    return p.parse_args()


def build_metadata(dataset_names):
    """thing_classes/thing_colors for the configured dataset family (the
    reference demo pulls these from the D2 MetadataCatalog)."""
    from mdqe_cvpr2023_tpu.data.categories import (OVIS_CATEGORIES,
                                                   YTVIS_CATEGORIES_2019,
                                                   YTVIS_CATEGORIES_2021)
    name = (dataset_names or [""])[0]
    cats = (OVIS_CATEGORIES if "ovis" in name else
            YTVIS_CATEGORIES_2019 if "2019" in name else YTVIS_CATEGORIES_2021)
    cats = sorted(cats, key=lambda c: c["id"])
    return {"thing_classes": [c["name"] for c in cats],
            "thing_colors": [c.get("color", (130, 130, 130)) for c in cats]}


def read_frames(vid_path):
    import cv2
    if os.path.isdir(vid_path):
        files = sorted(glob.glob(os.path.join(vid_path, "*.jpg"))
                       + glob.glob(os.path.join(vid_path, "*.png")))
        return [cv2.imread(f)[:, :, ::-1] for f in files]
    cap = cv2.VideoCapture(vid_path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])
    return frames


def main():
    import cv2
    import jax
    # honor an explicit JAX_PLATFORMS even when sitecustomize pinned another
    # platform at import time (same fix as train_net.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    from predictor import AsyncPredictor
    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer
    from mdqe_cvpr2023_tpu.models.meta import inference_vis, preprocess_frames

    args = parse_args()
    cfg = load_config(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights
    trainer = Trainer(cfg)
    os.makedirs(args.output, exist_ok=True)

    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    min_test = cfg.INPUT.MIN_SIZE_TEST
    max_test = cfg.INPUT.get("MAX_SIZE_TEST", 1333)

    def predict(frames):
        """Full-video inference on in-memory RGB frames."""
        H, W = frames[0].shape[:2]
        scale = min_test / min(H, W)
        if max(H, W) * scale > max_test:
            scale = max_test / max(H, W)
        th, tw = int(round(H * scale)), int(round(W * scale))
        resized = np.stack([cv2.resize(f, (tw, th)) for f in frames])
        proc, _ = preprocess_frames(resized, mean, std)
        return inference_vis(trainer.params, trainer.model_cfg, trainer.inf_cfg,
                             proc, image_size=(th, tw), ori_size=(H, W))

    from visualizer import TrackVisualizer
    viz = TrackVisualizer(metadata=build_metadata(cfg.DATASETS.TEST))

    def render(vid_path, frames, out):
        H, W = frames[0].shape[:2]
        n = sum(1 for s in out["pred_scores"] if s > args.confidence_threshold)
        name = os.path.splitext(os.path.basename(vid_path.rstrip("/")))[0]
        writer = cv2.VideoWriter(os.path.join(args.output, f"{name}.mp4"),
                                 cv2.VideoWriter_fourcc(*"mp4v"), args.fps, (W, H))
        for vis in viz.draw_video(frames, out["pred_masks"], out["pred_labels"],
                                  out["pred_scores"],
                                  score_threshold=args.confidence_threshold):
            writer.write(vis[:, :, ::-1])
        writer.release()
        print(f"wrote {name}.mp4 with {n} instances")

    # inference of video k+1 overlaps rendering of video k (the reference's
    # AsyncPredictor purpose, demo/predictor.py:123-128, thread-based here);
    # at most 2 videos are held in memory at once
    predictor = AsyncPredictor(predict)
    pending = []
    for vid_path in args.input:
        frames = read_frames(vid_path)
        if not frames:
            print(f"no frames in {vid_path}")
            continue
        predictor.put(frames)
        pending.append((vid_path, frames))
        if len(pending) > 1:
            path, frm = pending.pop(0)
            render(path, frm, predictor.get())
    while pending:
        path, frm = pending.pop(0)
        render(path, frm, predictor.get())
    predictor.shutdown()


if __name__ == "__main__":
    main()
