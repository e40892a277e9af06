"""TrackVisualizer structural fidelity (reference demo/visualizer.py:46-123):
track-stable colors across frames, per-track distinct colors via the id jitter,
labeled drawing, and mask boundaries."""
import numpy as np
import pytest

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demo"))

cv2 = pytest.importorskip("cv2")

from visualizer import TrackVisualizer  # noqa: E402

META = {"thing_classes": ["cat", "dog", "bird"],
        "thing_colors": [[220, 20, 60], [0, 82, 0], [119, 11, 32]]}


def _masks(t):
    """Two moving square masks for frame t."""
    m0 = np.zeros((64, 96), bool)
    m0[10:30, 10 + 2 * t:30 + 2 * t] = True
    m1 = np.zeros((64, 96), bool)
    m1[40:60, 50 - t:70 - t] = True
    return [m0, m1]


def test_track_colors_stable_across_frames_and_distinct():
    viz = TrackVisualizer(metadata=META)
    c0 = viz.track_color(0, 0)
    c1 = viz.track_color(1, 0)  # same class, different track -> jitter differs
    assert not np.array_equal(c0, c1)
    # deterministic: same (track, class) always the same color
    assert np.array_equal(c0, viz.track_color(0, 0))


def test_overlay_color_matches_track_color_every_frame():
    viz = TrackVisualizer(metadata=META, draw_labels=False,
                          draw_boundaries=False)
    frame = np.full((64, 96, 3), 100, np.uint8)
    for t in range(3):
        masks = _masks(t)
        out = viz.draw_frame(frame, masks, classes=[0, 1], scores=[0.9, 0.8],
                             track_ids=[0, 1])
        for tid, m in enumerate(masks):
            col = viz.track_color(tid, tid)
            expected = (0.5 * 100 + 0.5 * col.astype(np.float32)).astype(np.uint8)
            # interior pixels (boundary drawing off) blend exactly alpha 0.5
            inner = np.zeros_like(m)
            inner[1:-1, 1:-1] = m[1:-1, 1:-1]
            got = out[inner]
            assert np.all(np.abs(got.astype(int) - expected[None].astype(int))
                          <= 1), f"track {tid} frame {t}"


def test_labels_and_boundaries_drawn():
    viz_plain = TrackVisualizer(metadata=META, draw_labels=False,
                                draw_boundaries=False)
    viz_full = TrackVisualizer(metadata=META)
    frame = np.full((64, 96, 3), 100, np.uint8)
    masks = _masks(0)
    a = viz_plain.draw_frame(frame, masks, [0, 1], [0.9, 0.8])
    b = viz_full.draw_frame(frame, masks, [0, 1], [0.9, 0.8])
    assert (a != b).any(), "labels/boundaries must change pixels"
    # text anchored at the mask median must create non-blend pixels there
    ys, xs = np.nonzero(masks[0])
    cy, cx = int(np.median(ys)), int(np.median(xs))
    region = b[max(cy - 8, 0):cy + 2, max(cx - 4, 0):cx + 40]
    assert (region == 0).any(), "dark text outline expected near the anchor"


def test_draw_video_keeps_track_count_and_threshold():
    viz = TrackVisualizer(metadata=META)
    frames = [np.full((64, 96, 3), 60, np.uint8) for _ in range(3)]
    pred_masks = [np.stack([_masks(t)[i] for t in range(3)]) for i in range(2)]
    outs = list(viz.draw_video(frames, pred_masks, [0, 1], [0.9, 0.1],
                               score_threshold=0.3))
    assert len(outs) == 3
    # only track 0 passes the threshold: track 1's region stays background
    for t, out in enumerate(outs):
        m1 = _masks(t)[1]
        inner = np.zeros_like(m1)
        inner[1:-1, 1:-1] = m1[1:-1, 1:-1]
        assert np.all(out[inner] == 60)
