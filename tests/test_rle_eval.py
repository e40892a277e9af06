"""RLE codec and VIS evaluation tests."""
import numpy as np
import pytest

from mdqe_cvpr2023_tpu.data import rle as rle_util
from mdqe_cvpr2023_tpu.data.ytvis_eval import YTVISEvaluator


def random_mask(rng, h, w, blobs=3):
    m = np.zeros((h, w), bool)
    for _ in range(blobs):
        y, x = rng.integers(0, h), rng.integers(0, w)
        hh, ww = rng.integers(1, h // 2 + 1), rng.integers(1, w // 2 + 1)
        m[y:y + hh, x:x + ww] = True
    return m


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = random_mask(rng, rng.integers(2, 60), rng.integers(2, 60))
        r = rle_util.encode(m)
        assert isinstance(r["counts"], str)
        back = rle_util.decode(r)
        np.testing.assert_array_equal(back.astype(bool), m)


def test_rle_string_codec_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        counts = rng.integers(0, 10000, rng.integers(1, 50)).astype(np.int64)
        s = rle_util.counts_to_string(counts)
        back = rle_util.string_to_counts(s)
        np.testing.assert_array_equal(back, counts)


def test_native_matches_python_codec():
    """The C++ fast path and the pure-Python codec must agree byte-for-byte."""
    if not rle_util._load_native():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(2)
    for _ in range(10):
        counts = rng.integers(0, 100000, rng.integers(1, 80)).astype(np.int64)
        lib = rle_util._LIB
        try:
            rle_util._LIB = False
            s_py = rle_util.counts_to_string(counts)
            c_py = rle_util.string_to_counts(s_py)
        finally:
            rle_util._LIB = lib
        s_c = rle_util.counts_to_string(counts)
        assert s_c == s_py
        np.testing.assert_array_equal(rle_util.string_to_counts(s_c), c_py)


def test_area_and_iou():
    rng = np.random.default_rng(3)
    for _ in range(10):
        m1 = random_mask(rng, 40, 50)
        m2 = random_mask(rng, 40, 50)
        r1, r2 = rle_util.encode(m1), rle_util.encode(m2)
        assert rle_util.area(r1) == m1.sum()
        inter = (m1 & m2).sum()
        union = (m1 | m2).sum()
        expected = inter / union if union else 0.0
        assert abs(rle_util.iou(r1, r2) - expected) < 1e-9
        assert rle_util.intersection_area(r1, r2) == inter


def test_video_iou():
    rng = np.random.default_rng(4)
    d = [rle_util.encode(random_mask(rng, 30, 30)) for _ in range(3)]
    g = [rle_util.encode(random_mask(rng, 30, 30)) for _ in range(3)]
    i = sum((rle_util.decode(a).astype(bool) & rle_util.decode(b).astype(bool)).sum()
            for a, b in zip(d, g))
    u = sum((rle_util.decode(a).astype(bool) | rle_util.decode(b).astype(bool)).sum()
            for a, b in zip(d, g))
    assert abs(rle_util.video_iou(d, g) - i / u) < 1e-9


def _make_gt_and_perfect_preds():
    rng = np.random.default_rng(5)
    videos = [{"id": 1, "height": 40, "width": 40, "length": 2}]
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    anns, preds = [], []
    for k, cat in enumerate([1, 2]):
        masks = [random_mask(rng, 40, 40, blobs=1) for _ in range(2)]
        segs = [rle_util.encode(m) for m in masks]
        anns.append({"id": k + 1, "video_id": 1, "category_id": cat,
                     "segmentations": segs, "iscrowd": 0,
                     "areas": [int(m.sum()) for m in masks]})
        preds.append({"video_id": 1, "category_id": cat, "score": 0.9,
                      "segmentations": segs})
    gt = {"videos": videos, "annotations": anns, "categories": cats}
    return gt, preds


def test_eval_perfect_predictions():
    gt, preds = _make_gt_and_perfect_preds()
    ev = YTVISEvaluator(gt)
    m = ev.evaluate(preds)
    assert abs(m["AP"] - 100.0) < 1e-6
    assert abs(m["AP50"] - 100.0) < 1e-6
    assert abs(m["AR100"] - 100.0) < 1e-6


def test_eval_missing_prediction_halves_recall():
    gt, preds = _make_gt_and_perfect_preds()
    ev = YTVISEvaluator(gt)
    m = ev.evaluate(preds[:1])  # only category 1 predicted
    assert m["AP"] == pytest.approx(50.0, abs=1e-6)


def test_eval_wrong_masks_zero_ap():
    gt, preds = _make_gt_and_perfect_preds()
    shifted = []
    for p in preds:
        masks = [np.zeros((40, 40), bool) for _ in p["segmentations"]]
        for m in masks:
            m[:2, :2] = True
        shifted.append({**p, "segmentations": [rle_util.encode(m) for m in masks]})
    ev = YTVISEvaluator(gt)
    m = ev.evaluate(shifted)
    assert m["AP"] < 5.0
