"""Utility-op parity tests against torch oracles (aligned_bilinear, grid_sample,
interpolate, box ops)."""
import numpy as np
import pytest
import jax.numpy as jnp

from mdqe_cvpr2023_tpu.utils import (aligned_bilinear, grid_sample, inverse_sigmoid,
                                     interpolate_bilinear, interpolate_nearest,
                                     make_reference_points)
from mdqe_cvpr2023_tpu.utils import boxes as box_ops

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("h,w,factor", [(5, 7, 4), (3, 3, 2), (8, 6, 4), (4, 4, 1)])
def test_aligned_bilinear_matches_reference_chain(h, w, factor):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)

    # torch re-implementation of the reference chain (util/misc.py:485-507)
    t = torch.from_numpy(x)
    if factor > 1:
        t = F.pad(t, (0, 1, 0, 1), mode="replicate")
        t = F.interpolate(t, size=(factor * h + 1, factor * w + 1), mode="bilinear",
                          align_corners=True)
        t = F.pad(t, (factor // 2, 0, factor // 2, 0), mode="replicate")
        t = t[:, :, :factor * h, :factor * w]
    expected = t.numpy()

    out = np.asarray(aligned_bilinear(jnp.asarray(x), factor))
    np.testing.assert_allclose(out, expected, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_bilinear(padding):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 6, 9, 4)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, (2, 5, 3, 2)).astype(np.float32)

    expected = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                             torch.from_numpy(grid), mode="bilinear",
                             padding_mode=padding, align_corners=False)
    expected = expected.permute(0, 2, 3, 1).numpy()

    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode=padding))
    np.testing.assert_allclose(out, expected, atol=1e-5, rtol=1e-5)


def test_grid_sample_nearest_border():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (1, 4, 4, 2)).astype(np.float32)
    expected = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                             torch.from_numpy(grid), mode="nearest",
                             padding_mode="border", align_corners=False)
    expected = expected.permute(0, 2, 3, 1).numpy()
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode="border", mode="nearest"))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_interpolate_bilinear_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 7, 9)).astype(np.float32)
    expected = F.interpolate(torch.from_numpy(x), size=(13, 5), mode="bilinear",
                             align_corners=False).numpy()
    out = np.asarray(interpolate_bilinear(jnp.asarray(x), (13, 5)))
    np.testing.assert_allclose(out, expected, atol=1e-5, rtol=1e-5)


def test_interpolate_nearest_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 7, 9)).astype(np.float32)
    expected = F.interpolate(torch.from_numpy(x), size=(20, 31), mode="nearest").numpy()
    out = np.asarray(interpolate_nearest(jnp.asarray(x), (20, 31)))
    np.testing.assert_allclose(out, expected, atol=0)


def test_inverse_sigmoid():
    x = jnp.asarray([0.0, 0.3, 0.999, 1.0, -0.2])
    t = torch.tensor([0.0, 0.3, 0.999, 1.0, -0.2]).clamp(0, 1)
    expected = torch.log(t.clamp(min=1e-5) / (1 - t).clamp(min=1e-5)).numpy()
    np.testing.assert_allclose(np.asarray(inverse_sigmoid(x)), expected, atol=2e-5)


def test_make_reference_points():
    pts = np.asarray(make_reference_points((3, 4)))
    assert pts.shape == (12, 2)
    np.testing.assert_allclose(pts[0], [0.5 / 4, 0.5 / 3], atol=1e-6)
    np.testing.assert_allclose(pts[-1], [3.5 / 4, 2.5 / 3], atol=1e-6)


def test_video_giou_and_l1():
    rng = np.random.default_rng(5)
    N, M, T = 4, 3, 2
    # sorting the (2,2) pairs elementwise yields [x0,y0,x1,y1] with x0<=x1, y0<=y1
    b1 = np.sort(rng.uniform(0, 1, (N, T, 2, 2)), axis=2).reshape(N, T, 4)
    b2 = np.sort(rng.uniform(0, 1, (M, T, 2, 2)), axis=2).reshape(M, T, 4)
    valid = np.array([[True, True], [True, False], [False, False]])
    g = np.asarray(box_ops.video_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2),
                                                     jnp.asarray(valid)))
    assert g.shape == (N, M)
    assert np.all(g <= 1.0) and np.all(g >= -1.0)
    # a box against itself has GIoU 1 on valid frames
    gs = np.asarray(box_ops.video_generalized_box_iou(jnp.asarray(b2), jnp.asarray(b2),
                                                      jnp.asarray(valid)))
    np.testing.assert_allclose(np.diag(gs)[:2], [1.0, 1.0], atol=1e-5)

    l1 = np.asarray(box_ops.video_box_l1(jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(valid)))
    assert l1.shape == (N, M)
    expected00 = np.abs(b1[0] - b2[0]).sum() / 2
    np.testing.assert_allclose(l1[0, 0], expected00, rtol=1e-5)


def test_masks_to_boxes():
    m = np.zeros((2, 6, 8), bool)
    m[0, 2:5, 3:7] = True
    out = np.asarray(box_ops.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(out[0], [3, 2, 7, 5])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])


def test_box_frames_to_clip():
    boxes = jnp.asarray([[[0.1, 0.1, 0.4, 0.5], [0.2, 0.0, 0.5, 0.4]],
                         [[0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]]])
    out = np.asarray(box_ops.box_frames_to_clip(boxes))
    np.testing.assert_allclose(out[0], [0.1, 0.0, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0, 0.0], atol=1e-6)
