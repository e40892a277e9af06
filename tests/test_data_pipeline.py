"""Data pipeline tests on a synthetic mini YTVIS dataset written to tmp."""
import json
import os

import numpy as np
import pytest

from mdqe_cvpr2023_tpu.data import (AugmentationPipeline, ClipMapper,
                                    CombinedClipLoader, collate_clips,
                                    load_ytvis_json)
from mdqe_cvpr2023_tpu.data import rle as rle_util


@pytest.fixture(scope="module")
def mini_ytvis(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytvis")
    try:
        import cv2
        write = lambda p, img: cv2.imwrite(str(p), img[:, :, ::-1])
    except Exception:
        from PIL import Image
        write = lambda p, img: Image.fromarray(img).save(str(p))

    rng = np.random.default_rng(0)
    H, W, T = 60, 80, 5
    videos, annotations = [], []
    for vid in range(1, 3):
        fnames = []
        for t in range(T):
            img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
            name = f"v{vid}/f{t}.jpg"
            os.makedirs(root / f"v{vid}", exist_ok=True)
            write(root / name, img)
            fnames.append(name)
        videos.append({"id": vid, "file_names": fnames, "height": H, "width": W,
                       "length": T})
        for inst in range(2):
            segs, bboxes, areas = [], [], []
            for t in range(T):
                m = np.zeros((H, W), bool)
                y0 = 5 + 5 * inst + t
                m[y0:y0 + 20, 10 + inst * 30:30 + inst * 30] = True
                segs.append(rle_util.encode(m))
                ys, xs = np.nonzero(m)
                bboxes.append([float(xs.min()), float(ys.min()),
                               float(xs.max() - xs.min() + 1),
                               float(ys.max() - ys.min() + 1)])
                areas.append(int(m.sum()))
            annotations.append({"id": vid * 10 + inst, "video_id": vid,
                                "category_id": inst + 1, "segmentations": segs,
                                "bboxes": bboxes, "areas": areas, "iscrowd": 0})
    gt = {"videos": videos, "annotations": annotations,
          "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    with open(root / "train.json", "w") as f:
        json.dump(gt, f)
    return root


def test_load_and_map(mini_ytvis):
    records = load_ytvis_json(str(mini_ytvis / "train.json"), str(mini_ytvis))
    assert len(records) == 2
    assert records[0]["length"] == 5

    aug = AugmentationPipeline(min_sizes=[48, 56], max_size=96, crop_enabled=True,
                               crop_type="relative_range", crop_size=(0.8, 0.8))
    mapper = ClipMapper(aug, n_frames=3, frame_range=2)
    rng = np.random.default_rng(1)
    s = mapper(records[0], rng)
    T = 3
    assert s["images"].shape[0] == T
    assert s["labels"].shape[0] == s["ids"].shape[0] == s["masks"].shape[0]
    assert s["masks"].shape[1] == T
    assert (s["labels"] >= 0).any()
    # a present instance's mask is nonempty and box is consistent
    for n in range(s["labels"].shape[0]):
        for t in range(T):
            if s["ids"][n, t] >= 0:
                assert s["masks"][n, t].sum() > 0


def test_combined_loader_batches(mini_ytvis):
    records = load_ytvis_json(str(mini_ytvis / "train.json"), str(mini_ytvis))
    aug = AugmentationPipeline(min_sizes=[48], max_size=96)
    mapper = ClipMapper(aug, n_frames=2, frame_range=2)
    loader = CombinedClipLoader([(records, mapper)], [1.0], batch_size=2,
                                max_instances=4, seed=0)
    batch = next(iter(loader))
    BT = batch["images"].shape[0]
    assert BT == 4  # B=2, T=2
    assert batch["images"].shape[1] % 32 == 0 and batch["images"].shape[2] % 32 == 0
    assert batch["labels"].shape == (2, 4)
    assert batch["boxes"].shape == (2, 4, 2, 4)
    assert batch["masks"].shape[:3] == (2, 4, 2)
    assert batch["valid"].any()
    # boxes normalized
    assert batch["boxes"].min() >= 0 and batch["boxes"].max() <= 1


def test_moving_crop_consistency():
    """RandomCrop interpolates the anchor across frames; image/box/mask must
    agree per frame (reference RandomCropClip camera-motion semantics)."""
    from mdqe_cvpr2023_tpu.data.augmentation import RandomCrop
    rng = np.random.default_rng(0)
    H, W, T = 60, 80, 4
    crop = RandomCrop(rng, (H, W), "relative_range", (0.5, 0.5), n_frames=T)
    img = np.arange(H * W * 3, dtype=np.uint8).reshape(H, W, 3)
    mask = np.zeros((1, H, W), bool)
    mask[0, 10:30, 20:50] = True
    anchors = set()
    for t in range(T):
        out = crop.apply_image(img, t)
        assert out.shape == (crop.ch, crop.cw, 3)
        m = crop.apply_mask(mask, t)
        assert m.shape == (1, crop.ch, crop.cw)
        # the image crop and mask crop come from the same window
        y0, x0 = crop._yx(t)
        np.testing.assert_array_equal(out, img[y0:y0+crop.ch, x0:x0+crop.cw])
        anchors.add((y0, x0))
    assert len(anchors) >= 1  # moving (usually >1, can collapse on tiny draws)


def test_lsj_pipeline_fixed_output():
    """LSJ mode: flip -> ResizeScale -> FixedSizeCrop produces the fixed target
    size for any input geometry (reference augmentation.py:435-461)."""
    from mdqe_cvpr2023_tpu.data.augmentation import (AugmentationPipeline,
                                                     apply_transforms)
    rng = np.random.default_rng(1)
    pipe = AugmentationPipeline(min_sizes=[320], max_size=800,
                                lsj_enabled=True, lsj_image_size=96,
                                lsj_min_scale=0.5, lsj_max_scale=1.5)
    for (H, W) in [(40, 60), (120, 100), (96, 96)]:
        tfms = pipe.sample(rng, (H, W), n_frames=2)
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        boxes = np.array([[5.0, 5.0, 30.0, 20.0]])
        masks = np.zeros((1, H, W), bool)
        masks[0, 5:20, 5:30] = True
        out, b, m = apply_transforms(tfms, img, boxes, masks, 0)
        assert out.shape == (96, 96, 3)
        assert m.shape == (1, 96, 96)
        assert b.min() >= 0 and b[:, 0::2].max() <= 96 and b[:, 1::2].max() <= 96


def test_resize_scale_aspect():
    from mdqe_cvpr2023_tpu.data.augmentation import ResizeScale
    rng = np.random.default_rng(2)
    rs = ResizeScale(rng, (100, 200), 1.0, 1.0, 50, 50)
    # scale 1: fit (100,200) into (50,50) -> (25, 50)
    assert rs.out_hw == (25, 50)
