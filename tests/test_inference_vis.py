"""End-to-end windowed VIS inference smoke test on a tiny synthetic video (random
weights): exercises window encoding, clip decoding, fixed-shape post-processing,
the OverTracker, and video-level merging."""
import numpy as np
import jax
import pytest

from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
from mdqe_cvpr2023_tpu.models.meta import (InferenceCfg, inference_vis,
                                           preprocess_frames)

TINY = MDQEModelCfg(backbone="resnet50", num_classes=5, hidden_dim=64, n_heads=4,
                    enc_layers=1, dec_layers=1, n_frames=2, n_query=16,
                    query_embed_dim=8, dec_temporal=True)
INF = InferenceCfg(clip_stride=2, n_frames_test=2, n_frames_window_test=4,
                   max_num_instances=20, apply_cls_thres=0.05, clip_topk=8,
                   encode_chunk=2, num_classes=5)


@pytest.mark.slow
def test_inference_vis_end_to_end():
    params = detr_init(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (9, 60, 62, 3)).astype(np.uint8)  # 9 frames
    frames, sizes = preprocess_frames(video, np.array([123.675, 116.28, 103.53]),
                                      np.array([58.395, 57.12, 57.375]))
    assert frames.shape == (9, 64, 64, 3)

    out = inference_vis(params, TINY, INF, frames, image_size=(60, 62),
                        ori_size=(120, 124))
    assert out["image_size"] == (120, 124)
    n = len(out["pred_scores"])
    assert n >= 1  # at least one (track, class) pair survives
    assert len(out["pred_labels"]) == n
    assert len(out["pred_masks"]) == n
    for m in out["pred_masks"]:
        assert m.shape == (9, 120, 124)
        assert m.dtype == bool


def _clip(frame_idx, masks, emb, cls, scores, K=4):
    """Build a fixed-capacity ClipResults from n valid detections."""
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.tracking import ClipResults
    n, T, H, W = masks.shape
    pad = K - n
    return ClipResults(
        frame_idx=frame_idx,
        scores=np.concatenate([scores, np.zeros(pad)]),
        classes=np.concatenate([np.arange(n), np.zeros(pad, np.int64)]),
        cls_probs=np.concatenate([cls, np.zeros((pad, cls.shape[1]), np.float32)]),
        mask_logits=jnp.asarray(np.concatenate(
            [masks, np.zeros((pad, T, H, W), np.float32)])),
        query_embeds=np.concatenate([emb, np.zeros((pad, emb.shape[1]), np.float32)]),
        valid=np.arange(K) < n,
    )


def test_tracker_association_identity():
    """Two identical clips must associate to the same instance IDs."""
    from mdqe_cvpr2023_tpu.tracking import OverTracker
    rng = np.random.default_rng(1)
    H, W = 16, 16
    tr = OverTracker(num_max_inst=10, num_frames=2, window_frames=4, clip_stride=1,
                     num_classes=3, embed_dim=8, mask_size=(H, W), apply_cls_thres=0.05)
    masks = rng.standard_normal((2, 2, H, W)).astype(np.float32) * 5
    emb = rng.standard_normal((2, 8)).astype(np.float32)
    cls = np.abs(rng.standard_normal((2, 3))).astype(np.float32)
    tr.update(_clip([0, 1], masks, emb, cls, np.array([0.9, 0.8])))
    assert tr.num_inst == 2
    tr.update(_clip([1, 2], masks, emb, cls, np.array([0.9, 0.8])))
    assert tr.num_inst == 2  # same instances re-identified, no new IDs

    out_cls, avg, len_frames = tr.get_result(is_last_clip=True)
    assert out_cls.shape == (2, 3)
    assert np.asarray(avg).shape[0] == 11  # M+1 rows incl. dump
    assert len_frames == 3


def test_tracker_new_instance_registration():
    from mdqe_cvpr2023_tpu.tracking import OverTracker
    rng = np.random.default_rng(2)
    H, W = 16, 16
    tr = OverTracker(num_max_inst=10, num_frames=2, window_frames=4, clip_stride=1,
                     num_classes=3, embed_dim=8, mask_size=(H, W), apply_cls_thres=0.05)
    # two saved instances (bi-softmax needs >1 saved row to discriminate)
    m0 = np.full((2, 2, H, W), -10.0, np.float32)
    m0[0, :, :4, :4] = 10.0
    m0[1, :, 6:9, 6:9] = 10.0
    e0 = np.zeros((2, 8), np.float32)
    e0[0, 0] = 10.0
    e0[1, 1] = 10.0
    tr.update(_clip([0, 1], m0, e0,
                    np.array([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]], np.float32),
                    np.array([0.9, 0.9])))
    # a disjoint mask with an orthogonal embedding and high score -> new ID
    m1 = np.full((1, 2, H, W), -10.0, np.float32)
    m1[:, :, 10:, 10:] = 10.0
    e1 = np.zeros((1, 8), np.float32)
    e1[0, 2] = 10.0
    tr.update(_clip([1, 2], m1, e1, np.array([[0.1, 0.1, 0.9]], np.float32),
                    np.array([0.9])))
    assert tr.num_inst == 3


def test_finalize_window_near_full_tracker():
    """Regression: with num_inst close to max_num_instances the final finalize
    chunk starts past rows-FCH, where dynamic_slice clamps the start index; the
    unshifted slice silently returned the WRONG rows for the tail instances
    (e.g. rows 5..8 instead of 8..11 at M=12, FCH=8)."""
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.meta import _finalize_window
    from mdqe_cvpr2023_tpu.tracking.mask_memory import mem_finalize_masks

    M, L = 12, 4  # rows = M+1 = 13, FCH = 8 -> second chunk would clamp
    h4 = w4 = 4
    # encode the row identity in the per-frame mask pattern: frame f of row i
    # is all-on iff bit f of i is set (distinguishes every row pair)
    i_idx = np.arange(M + 1)[:, None, None, None]
    f_idx = np.arange(L)[None, :, None, None]
    avg = np.where((i_idx >> f_idx) & 1, 1.0, -1.0).astype(np.float32)
    avg = np.broadcast_to(avg, (M + 1, L, h4, w4)).copy()

    inf_cfg = InferenceCfg(max_num_instances=M, match_stride=4, num_classes=3)
    n = 12
    out_cls = jnp.zeros((M, 3))
    got = _finalize_window((out_cls, jnp.int32(n), jnp.asarray(avg), L),
                           inf_cfg, (16, 16), (16, 16))
    assert got[1] == n
    packed = np.asarray(got[2])  # chunks are merged on device (single read)
    expected = np.asarray(mem_finalize_masks(jnp.asarray(avg), 4, (16, 16),
                                             (16, 16)))[:n]
    np.testing.assert_array_equal(packed, expected)


@pytest.mark.slow
def test_batched_decode_matches_single():
    """_decode_clips_batched must reproduce per-clip decode_and_postprocess
    results exactly (clips are independent through the decoder)."""
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.meta import (_decode_clips_batched,
                                               _slice_clip,
                                               decode_and_postprocess_clip,
                                               encode_frames,
                                               spatial_shapes_for)
    from mdqe_cvpr2023_tpu.models.detr import detr_mask_feats

    params = detr_init(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(3)
    T_win, T_clip = 6, 2
    Hp = Wp = 64
    imgs = jnp.asarray(rng.standard_normal((T_win, Hp, Wp, 3)), jnp.float32)
    sizes = jnp.asarray([[60, 62]] * T_win, jnp.int32)
    shapes = spatial_shapes_for(TINY, (Hp, Wp))
    enc, mflat = encode_frames(params, TINY, imgs, sizes)
    maskf = detr_mask_feats(params, TINY, enc, shapes)

    offsets = jnp.asarray([0, 2, 3, 3], jnp.int32)  # incl. a padded repeat
    batched = _decode_clips_batched(params, TINY, enc, mflat, maskf, offsets,
                                    shapes, T_clip, 0.05, 8)
    for j, off in enumerate([0, 2, 3]):
        c = _slice_clip(enc, mflat, maskf, off, T_clip)
        single = decode_and_postprocess_clip(params, TINY, c[0], c[1], shapes,
                                             c[2], T_clip, 0.05, 8)
        for k in ("scores", "classes", "cls_probs", "masks", "query_embeds",
                  "valid"):
            np.testing.assert_allclose(np.asarray(batched[k][j]),
                                       np.asarray(single[k]), rtol=2e-4,
                                       atol=2e-4, err_msg=f"{k} clip {j}")


@pytest.mark.slow
def test_inference_vis_mesh_equivalence():
    """Frame-parallel multi-chip inference (window encode sharded over an
    8-device mesh) must produce the same tracks as the single-device path."""
    from jax.sharding import Mesh
    params = detr_init(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(1)
    video = rng.integers(0, 255, (9, 60, 62, 3)).astype(np.uint8)
    frames, _ = preprocess_frames(video)

    base = inference_vis(params, TINY, INF, frames, image_size=(60, 62),
                         ori_size=(60, 62))
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    assert mesh.size == 8
    sharded = inference_vis(params, TINY, INF, frames, image_size=(60, 62),
                            ori_size=(60, 62), mesh=mesh)

    assert len(sharded["pred_scores"]) == len(base["pred_scores"])
    order_b = np.argsort(base["pred_scores"])
    order_s = np.argsort(sharded["pred_scores"])
    np.testing.assert_allclose(np.sort(sharded["pred_scores"]),
                               np.sort(base["pred_scores"]), rtol=1e-4, atol=1e-5)
    for ib, is_ in zip(order_b, order_s):
        assert base["pred_labels"][ib] == sharded["pred_labels"][is_]
        # sharded encode reassociates float reductions, so random-weight mask
        # logits sitting exactly on the binarization threshold may flip; demand
        # IoU >= 0.99 per matched track (same bar as the reference-pipeline
        # parity test) rather than bit equality
        mb = base["pred_masks"][ib]
        ms = sharded["pred_masks"][is_]
        inter = np.logical_and(mb, ms).sum()
        union = np.logical_or(mb, ms).sum()
        assert union == 0 or inter / union >= 0.99, (inter, union)


@pytest.mark.slow
def test_slab_budget_eviction_equivalence():
    """A tiny slab_hbm_budget forces keep_slabs FIFO eviction mid-video
    (meta.py keep_slabs / window_outputs.pop(0)): evicted windows take the
    eager all-live-rows finalize path instead of the deferred selected-rows
    path. Both paths are exact, so outputs must be bit-identical to the
    unconstrained run (reference materializes every window eagerly,
    /root/reference/mdqe/mdqe.py:351-366 — equivalence is the spec)."""
    import dataclasses
    params = detr_init(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(7)
    video = rng.integers(0, 255, (18, 60, 62, 3)).astype(np.uint8)
    frames, _ = preprocess_frames(video, np.array([123.675, 116.28, 103.53]),
                                  np.array([58.395, 57.12, 57.375]))

    # 18 frames / W_win=4 -> 5 window outputs; budget=1 byte -> keep_slabs=2
    # (the max(2, ...) floor), so 3 windows are FIFO-evicted mid-video
    inf_small = dataclasses.replace(INF, slab_hbm_budget=1)
    out_ref = inference_vis(params, TINY, INF, frames, image_size=(60, 62),
                            ori_size=(120, 124))
    out_evict = inference_vis(params, TINY, inf_small, frames,
                              image_size=(60, 62), ori_size=(120, 124))

    np.testing.assert_array_equal(np.asarray(out_ref["pred_scores"]),
                                  np.asarray(out_evict["pred_scores"]))
    np.testing.assert_array_equal(np.asarray(out_ref["pred_labels"]),
                                  np.asarray(out_evict["pred_labels"]))
    assert len(out_ref["pred_masks"]) == len(out_evict["pred_masks"])
    for a, b in zip(out_ref["pred_masks"], out_evict["pred_masks"]):
        np.testing.assert_array_equal(a, b)
