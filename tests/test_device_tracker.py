"""Device tracker (tracking/device_tracker.py) vs the host OverTracker oracle.

The host implementation mirrors the reference
(/root/reference/mdqe/tracking/OverTracker.py) and is the behavioral spec; the
device version must produce identical association decisions and memory state
on the same clip stream (float32 tolerance)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mdqe_cvpr2023_tpu.tracking import ClipResults, OverTracker
from mdqe_cvpr2023_tpu.tracking.device_tracker import (TrackerCfg,
                                                       tracker_state_init,
                                                       tracker_step,
                                                       tracker_window_output)

M, K, T, WIN, KC, C = 8, 6, 2, 4, 3, 8
H = W = 16


def _make_clip(rng, pool_masks, pool_embeds, frame_idx):
    """A clip containing a random subset of the instance pool + noise."""
    n = rng.integers(1, K)
    take = rng.choice(len(pool_masks), size=n, replace=False)
    masks = np.zeros((K, T, H, W), np.float32) - 8.0
    embeds = np.zeros((K, C), np.float32)
    for i, p in enumerate(take):
        masks[i] = pool_masks[p] + rng.standard_normal((T, H, W)) * 0.2
        embeds[i] = pool_embeds[p] + rng.standard_normal(C) * 0.05
    scores = np.sort(rng.random(K).astype(np.float32))[::-1].copy()
    valid = np.arange(K) < n
    cls_probs = np.abs(rng.standard_normal((K, KC))).astype(np.float32)
    return ClipResults(frame_idx=frame_idx, scores=scores,
                       classes=np.zeros(K, np.int64), cls_probs=cls_probs,
                       mask_logits=jnp.asarray(masks), query_embeds=embeds,
                       valid=valid)


@pytest.mark.parametrize("seed", [
    0,
    pytest.param(1, marks=pytest.mark.slow),
    pytest.param(2, marks=pytest.mark.slow),
])
def test_device_tracker_matches_host(seed):
    rng = np.random.default_rng(seed)
    # instance pool: separated box masks + distinct embeddings
    pool_masks, pool_embeds = [], []
    for p in range(5):
        m = np.full((T, H, W), -8.0, np.float32)
        y, x = (p % 3) * 5, (p // 3) * 7
        m[:, y:y + 4, x:x + 5] = 8.0
        pool_masks.append(m)
        e = np.zeros(C, np.float32)
        e[p] = 6.0
        pool_embeds.append(e)

    host = OverTracker(num_max_inst=M, num_frames=T, window_frames=WIN,
                       clip_stride=1, num_classes=KC, embed_dim=C,
                       mask_size=(H, W), apply_cls_thres=0.05)
    cfg = TrackerCfg(num_max_inst=M, num_frames=T, window_frames=WIN,
                     clip_stride=1, num_classes=KC, embed_dim=C,
                     mask_hw=(H, W), apply_cls_thres=0.05)
    dev = tracker_state_init(cfg)

    n_clips = 9
    for ci in range(n_clips):
        start = ci  # stride 1
        frame_idx = [start, start + 1]
        clip = _make_clip(rng, pool_masks, pool_embeds, frame_idx)
        f0, overlap = host.clip_offsets(frame_idx)

        dev = tracker_step(dev, cfg, jnp.asarray(clip.scores),
                           jnp.asarray(clip.cls_probs), clip.mask_logits,
                           jnp.asarray(clip.query_embeds),
                           jnp.asarray(clip.valid), jnp.int32(f0),
                           jnp.asarray(overlap))
        host.update(clip)

        assert int(dev["num_inst"]) == host.num_inst, f"clip {ci}"
        np.testing.assert_allclose(np.asarray(dev["untracked"]),
                                   host.untracked_clips, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev["clip_count"]),
                                   host.clip_count, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev["cls_sum"]), host.cls_sum,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev["embeds_mem"]),
                                   host.embeds_mem, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(dev["ring_valid"]),
                                      host.ring_valid)
        np.testing.assert_allclose(np.asarray(dev["logit_sum"]),
                                   np.asarray(host.logit_sum), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(dev["valid_count"]),
                                   np.asarray(host.valid_count), atol=1e-5)

        # window boundary: host emits results + rolls over at clip 3 (start=3,
        # stride 1: start+1 >= WIN*(saved+1))
        if start + 1 >= WIN and (start + 1 - WIN) % WIN == 0:
            out_cls_h, _, _ = host.get_result(
                is_last_clip=False, finalize_args=(4, (H, W), (H, W)))
            out_cls_d, n_d, _, dev = tracker_window_output(
                dev, cfg, 4, (H, W), (H, W), False)
            n_d = int(n_d)
            assert n_d == out_cls_h.shape[0]
            np.testing.assert_allclose(np.asarray(out_cls_d)[:n_d], out_cls_h,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(dev["clip_count"]),
                                       host.clip_count, atol=1e-5)
            np.testing.assert_allclose(np.asarray(dev["embeds_mem"]),
                                       host.embeds_mem, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(dev["logit_sum"]),
                                       np.asarray(host.logit_sum), rtol=1e-4,
                                       atol=1e-4)
            assert int(dev["num_clip"]) == host.num_clip
