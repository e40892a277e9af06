"""End-to-end COCO eval path: synthetic COCO instances json -> Trainer.test_coco ->
inference_image (reference mdqe/mdqe.py:486-556) -> finite AP dict.

Covers the is_coco decoder branch, aligned-bilinear upsample, mask-quality
rescoring, box-IoU soft-NMS and the multi-class expansion branch."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_ds")
    from mdqe_cvpr2023_tpu.data import rle as rle_util
    try:
        import cv2
        write = lambda p, img: cv2.imwrite(str(p), img[:, :, ::-1])
    except Exception:
        from PIL import Image
        write = lambda p, img: Image.fromarray(img).save(str(p))

    H, W = 64, 64
    os.makedirs(root / "imgs", exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for im_id in range(1, 3):
        img = np.full((H, W, 3), 40, np.uint8)
        y0, x0 = 8 * im_id, 10
        img[y0:y0 + 20, x0:x0 + 24] = [210, 70, 50]
        write(root / "imgs" / f"im{im_id}.jpg", img)
        images.append({"id": im_id, "file_name": f"im{im_id}.jpg",
                       "height": H, "width": W})
        m = np.zeros((H, W), bool)
        m[y0:y0 + 20, x0:x0 + 24] = True
        annotations.append({
            "id": ann_id, "image_id": im_id, "category_id": 1,
            "segmentation": rle_util.encode(m),
            "area": int(m.sum()), "iscrowd": 0,
            "bbox": [float(x0), float(y0), 24.0, 20.0],
        })
        ann_id += 1
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "thing"}]}
    with open(root / "instances_mini.json", "w") as f:
        json.dump(gt, f)
    return root


def _tiny_cfg(tmp_path):
    from mdqe_cvpr2023_tpu.engine import load_config
    cfg = load_config("configs/R50_coco.yaml")
    cfg.merge_from_list([
        "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
        "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
        "MODEL.MDQE.NUM_OBJECT_QUERIES", "16", "MODEL.MDQE.QUERY_EMBED_DIM", "8",
        "MODEL.MDQE.NUM_CLASSES", "1", "MODEL.MDQE.MAX_NUM_INSTANCES", "6",
        "INPUT.SAMPLING_FRAME_NUM", "1", "INPUT.MIN_SIZE_TEST", "64",
        "DATASETS.TEST", "[coco_mini_val]",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ])
    return cfg


@pytest.mark.slow
def test_coco_eval_end_to_end(mini_coco, tmp_path, monkeypatch):
    from mdqe_cvpr2023_tpu.data import builtin
    monkeypatch.setitem(builtin.DATASET_SPLITS, "coco_mini_val",
                        ("imgs", "instances_mini.json"))

    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    trainer = Trainer(_tiny_cfg(tmp_path), datasets_root=str(mini_coco))
    metrics, preds = trainer.test()  # routes to test_coco for coco* datasets
    assert metrics is not None and "AP" in metrics
    assert np.isfinite(metrics["AP"])
    assert isinstance(preds, list)
    for p in preds:
        assert set(p) >= {"video_id", "category_id", "score", "segmentations"}
        assert np.isfinite(p["score"])


@pytest.mark.slow
def test_inference_image_multi_cls_and_single_cls(mini_coco, tmp_path):
    """Direct inference_image coverage for both classification branches."""
    import dataclasses
    import jax
    from mdqe_cvpr2023_tpu.engine.build import (build_inference_cfg,
                                                build_model_cfg)
    from mdqe_cvpr2023_tpu.models.detr import detr_init
    from mdqe_cvpr2023_tpu.models.meta import inference_image, preprocess_frames

    cfg = _tiny_cfg(tmp_path)
    model_cfg = build_model_cfg(cfg)
    inf_cfg = build_inference_cfg(cfg)
    params = detr_init(jax.random.PRNGKey(0), model_cfg)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    proc, _ = preprocess_frames(img)
    for multi in (True, False):
        icfg = dataclasses.replace(inf_cfg, multi_cls_on=multi)
        out = inference_image(params, model_cfg, icfg, proc, (64, 64), (96, 96))
        n = len(out["scores"])
        assert len(out["classes"]) == n
        assert out["masks"].shape[1:] == (96, 96)  # resized to ori_size
        assert out["masks"].dtype == bool
        if n:
            assert out["boxes"].shape == (n, 4)
