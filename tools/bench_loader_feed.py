#!/usr/bin/env python
"""Drive >=50 REAL training iterations on the chip with the actual threaded
loader (jpeg decode -> clip-consistent augment -> collate) feeding it, and
report the measured data_wait fraction (trainer.py metrics) — evidence that the
input pipeline keeps the TPU busy, not a synthetic-batch estimate.

A synthetic OVIS-style dataset (jpgs on disk) is generated at ~512p so clips
land in the single 512x800 bucket (one train-step compile, shared with
tools/bench_train_step.py's geometry).

Usage: python tools/bench_loader_feed.py [iters]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n_videos=8, T=8, H=512, W=910):
    from mdqe_cvpr2023_tpu.data import rle as rle_util
    try:
        import cv2
        write = lambda p, img: cv2.imwrite(str(p), img[:, :, ::-1])
    except Exception:
        from PIL import Image
        write = lambda p, img: Image.fromarray(img).save(str(p))

    rng = np.random.default_rng(0)
    videos, annotations = [], []
    os.makedirs(os.path.join(root, "ovis"), exist_ok=True)
    aid = 0
    for vid in range(1, n_videos + 1):
        vdir = os.path.join(root, "ovis", "train", f"v{vid}")
        os.makedirs(vdir, exist_ok=True)
        fnames = []
        base = rng.integers(0, 120, (H, W, 3)).astype(np.uint8)
        insts = [(rng.integers(0, H - 120), rng.integers(0, W - 120),
                  rng.integers(3, 9), rng.integers(120, 255, 3))
                 for _ in range(6)]
        per_inst = [[] for _ in insts]
        for t in range(T):
            img = base.copy()
            for i, (y0, x0, v, col) in enumerate(insts):
                y = int((y0 + v * t) % (H - 110))
                x = int((x0 + 2 * v * t) % (W - 110))
                img[y:y + 100, x:x + 100] = col
                m = np.zeros((H, W), bool)
                m[y:y + 100, x:x + 100] = True
                per_inst[i].append((rle_util.encode(m),
                                    [float(x), float(y), 100.0, 100.0],
                                    int(m.sum())))
            write(os.path.join(vdir, f"f{t}.jpg"), img)
            fnames.append(f"v{vid}/f{t}.jpg")
        videos.append({"id": vid, "file_names": fnames, "height": H,
                       "width": W, "length": T})
        for i in range(len(insts)):
            aid += 1
            annotations.append({
                "id": aid, "video_id": vid, "category_id": 1 + i % 3,
                "segmentations": [s for s, _, _ in per_inst[i]],
                "bboxes": [b for _, b, _ in per_inst[i]],
                "areas": [a for _, _, a in per_inst[i]], "iscrowd": 0})
    gt = {"videos": videos, "annotations": annotations,
          "categories": [{"id": i, "name": f"c{i}"} for i in (1, 2, 3)]}
    with open(os.path.join(root, "ovis", "annotations_train.json"), "w") as f:
        json.dump(gt, f)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    root = "/tmp/mdqe_loader_bench_ds"
    if not os.path.exists(os.path.join(root, "ovis", "annotations_train.json")):
        make_dataset(root)

    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()

    out_dir = "/tmp/mdqe_loader_bench_out"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = load_config("configs/R50_ovis_360.yaml")
    cfg.merge_from_list([
        "DATASETS.TRAIN", "[ytvis_ovis_train]",
        "DATASETS.DATASET_RATIO", "[1.0]",
        "INPUT.MIN_SIZE_TRAIN", "[512]", "INPUT.MAX_SIZE_TRAIN", "800",
        "SOLVER.IMS_PER_BATCH", "2", "SOLVER.CHECKPOINT_PERIOD", "1000000",
        "TEST.EVAL_PERIOD", "0", "DATALOADER.NUM_WORKERS", "8",
        "OUTPUT_DIR", out_dir,
    ])
    trainer = Trainer(cfg, datasets_root=root)
    trainer.train(max_iter=iters, log_every=5)

    rows = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    steady = rows[1:]  # drop the first block (contains the compile)
    sec = float(np.median([r["sec_per_iter"] for r in steady]))
    wait = float(np.median([r["data_wait_frac"] for r in steady]))
    print(json.dumps({
        "metric": "train_real_loader_r50_f4_512x800_b2",
        "value": round(sec, 3), "unit": "s/iter",
        "data_wait_frac_median": round(wait, 4),
        "data_wait_frac_max": round(max(r["data_wait_frac"] for r in steady), 4),
        "iters": iters,
    }), flush=True)


if __name__ == "__main__":
    main()
