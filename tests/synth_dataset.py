"""Tiny on-disk OVIS-style synthetic dataset shared by the trainer e2e test and
the eval_parity-tool smoke test (and the verify skill's CLI recipe): 2 videos x
6 frames of a moving box, with RLE GT in the reference's annotation schema
(/root/reference/mdqe/data/datasets/ytvis.json layout)."""
import json
import os

import numpy as np


def build_mini_dataset(root):
    """Write the dataset under <root>/ovis/{train/, annotations_train.json,
    valid_sub.json} — the layout DATASET_SPLITS registers for ytvis_ovis_train
    and ytvis_ovis_dev. Returns root."""
    from mdqe_cvpr2023_tpu.data import rle as rle_util
    try:
        import cv2
        write = lambda p, img: cv2.imwrite(str(p), img[:, :, ::-1])
    except Exception:
        from PIL import Image
        write = lambda p, img: Image.fromarray(img).save(str(p))

    root = str(root)
    H, W, T = 64, 64, 6
    videos, annotations = [], []
    os.makedirs(os.path.join(root, "ovis"), exist_ok=True)
    for vid in range(1, 3):
        fnames = []
        os.makedirs(os.path.join(root, "ovis", "train", f"v{vid}"),
                    exist_ok=True)
        for t in range(T):
            img = np.full((H, W, 3), 30, np.uint8)
            y = 8 + 4 * t
            img[y:y + 18, 10 + vid * 8:28 + vid * 8] = [200, 60, 60]
            write(os.path.join(root, "ovis", "train", f"v{vid}", f"f{t}.jpg"),
                  img)
            fnames.append(f"v{vid}/f{t}.jpg")
        videos.append({"id": vid, "file_names": fnames, "height": H,
                       "width": W, "length": T})
        segs, bboxes, areas = [], [], []
        for t in range(T):
            m = np.zeros((H, W), bool)
            y = 8 + 4 * t
            m[y:y + 18, 10 + vid * 8:28 + vid * 8] = True
            segs.append(rle_util.encode(m))
            bboxes.append([10.0 + vid * 8, float(y), 18.0, 18.0])
            areas.append(int(m.sum()))
        annotations.append({"id": vid, "video_id": vid, "category_id": 1,
                            "segmentations": segs, "bboxes": bboxes,
                            "areas": areas, "iscrowd": 0})
    gt = {"videos": videos, "annotations": annotations,
          "categories": [{"id": 1, "name": "thing"}]}
    with open(os.path.join(root, "ovis", "annotations_train.json"), "w") as f:
        json.dump(gt, f)
    with open(os.path.join(root, "ovis", "valid_sub.json"), "w") as f:
        json.dump(gt, f)
    return root


# the tiny-model override list the CLI surfaces share (see also the verify
# skill recipe); keep as flat strings so both merge_from_list and a subprocess
# argv can consume it
TINY_OVERRIDES = [
    "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
    "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
    "MODEL.MDQE.NUM_OBJECT_QUERIES", "16", "MODEL.MDQE.QUERY_EMBED_DIM", "8",
    "MODEL.MDQE.NUM_CLASSES", "1", "MODEL.MDQE.MAX_NUM_INSTANCES", "6",
    "MODEL.MDQE.SAMPLING_FRAME_NUM_TEST", "2",
    "MODEL.MDQE.WINDOW_FRAME_NUM_TEST", "4",
    "INPUT.SAMPLING_FRAME_NUM", "2",
    "INPUT.MIN_SIZE_TRAIN", "[64]", "INPUT.MAX_SIZE_TRAIN", "64",
    "INPUT.MIN_SIZE_TEST", "64", "INPUT.CROP.ENABLED", "False",
    "DATASETS.TRAIN", "[ytvis_ovis_train]",
    "DATASETS.TEST", "[ytvis_ovis_dev]",
]
