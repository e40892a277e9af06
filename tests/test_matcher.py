"""Unit tests for the fixed-shape dynamic-k matcher and clip-peak matcher."""
import numpy as np
import jax.numpy as jnp

from mdqe_cvpr2023_tpu.losses.matcher import (clip_peak_match, dynamic_k_matching,
                                              get_in_boxes_info)
from mdqe_cvpr2023_tpu.utils.misc import make_reference_points


def test_dynamic_k_invariants():
    rng = np.random.default_rng(0)
    Q, N = 32, 5
    cost = rng.uniform(0, 10, (Q, N)).astype(np.float32)
    ious = rng.uniform(0, 1, (Q, N)).astype(np.float32)
    valid = np.array([True, True, True, False, False])
    A = np.asarray(dynamic_k_matching(jnp.asarray(cost), jnp.asarray(ious),
                                      jnp.asarray(valid)))
    # each query matched to at most one gt
    assert (A.sum(1) <= 1).all()
    # every valid gt gets at least one query; invalid gts get none
    assert (A[:, :3].sum(0) >= 1).all()
    assert A[:, 3:].sum() == 0
    # dynamic k respects the top-10 iou sum (k >= 2)
    for g in range(3):
        k = max(int(np.sort(ious[:, g])[-10:].sum()), 2)
        assert A[:, g].sum() <= k


def test_dynamic_k_prefers_low_cost():
    Q, N = 8, 1
    cost = np.full((Q, N), 100.0, np.float32)
    cost[3, 0] = 0.1
    cost[5, 0] = 0.2
    ious = np.zeros((Q, N), np.float32)  # k clamps to 2
    A = np.asarray(dynamic_k_matching(jnp.asarray(cost), jnp.asarray(ious),
                                      jnp.asarray([True])))
    assert A[3, 0] == 1 and A[5, 0] == 1
    assert A.sum() == 2


def test_clip_peak_match_assignment():
    """Two instances; the smaller is assigned first and blocks its pixels' weights."""
    N, T, H, W = 2, 1, 8, 8
    K = 3
    masks = np.zeros((N, T, H, W), bool)
    masks[0, 0, 2:4, 2:4] = True           # small instance (area 4)
    masks[1, 0, 1:7, 1:7] = True           # large instance overlapping it
    boxes = np.array([[[2 / 8, 2 / 8, 4 / 8, 4 / 8]],
                      [[1 / 8, 1 / 8, 7 / 8, 7 / 8]]], np.float32)
    labels = np.array([0, 1])
    ids = np.array([[0], [1]])
    valid = np.array([True, True])
    ref = make_reference_points((H, W))
    lab, w, gid = clip_peak_match(jnp.asarray(labels), jnp.asarray(boxes),
                                  jnp.asarray(ids), jnp.asarray(masks.reshape(N, T, -1)),
                                  jnp.asarray(valid), ref, num_classes=K)
    lab = np.asarray(lab).reshape(T, H, W)
    gid = np.asarray(gid).reshape(T, H, W)
    w = np.asarray(w).reshape(T, H, W, K)
    # large instance overwrites labels on overlapping pixels (reference behavior)...
    assert lab[0, 2, 2] == 1 and gid[0, 2, 2] == 1
    # ...but the small instance's pixels got dist weight for class 0 first, and the
    # large instance's weight there is 0 (dist was blocked to 1e9)
    assert w[0, 2, 2, 0] > 0
    assert w[0, 2, 2, 1] == 0
    # non-overlapping large-instance pixels belong to it with positive weight
    assert lab[0, 5, 5] == 1 and w[0, 5, 5, 1] > 0
    # background pixels untouched
    assert lab[0, 0, 0] == -1 and gid[0, 0, 0] == -1


def test_in_boxes_info():
    Q, T = 4, 1
    boxes = np.array([[[0.4, 0.4, 0.6, 0.6]],
                      [[0.0, 0.0, 0.05, 0.05]],
                      [[0.9, 0.9, 1.0, 1.0]],
                      [[0.45, 0.45, 0.55, 0.55]]], np.float32)
    gt = np.array([[[0.3, 0.3, 0.7, 0.7]]], np.float32)
    ok = np.asarray(get_in_boxes_info(jnp.asarray(boxes), jnp.asarray(gt)))
    assert ok.shape == (Q, T)
    assert ok[0, 0] and ok[3, 0]
    assert not ok[2, 0]
