"""Deterministic data stream, prefetching, resolution buckets, full-state
checkpoint resume, and per-clip detection capacity.

Reference contracts: D2 resume_or_load (train_net.py:243,257), NUM_WORKERS
loader (mdqe/data/build.py:147-191), 10*DETECTIONS_PER_IMAGE per-clip candidate
capacity (mdqe/mdqe.py:380)."""
import json
import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def _mini_source(tmp_path, n_videos=3, H=64, W=96, T=4):
    from mdqe_cvpr2023_tpu.data import rle as rle_util
    try:
        import cv2
        write = lambda p, img: cv2.imwrite(str(p), img[:, :, ::-1])
    except Exception:
        from PIL import Image
        write = lambda p, img: Image.fromarray(img).save(str(p))
    records = []
    for vid in range(1, n_videos + 1):
        d = tmp_path / f"v{vid}"
        os.makedirs(d, exist_ok=True)
        fnames, anns = [], []
        for t in range(T):
            img = np.full((H, W, 3), 30, np.uint8)
            img[10:30, 10 + 4 * t:40 + 4 * t] = [200, 60, 60]
            write(d / f"f{t}.jpg", img)
            fnames.append(str(d / f"f{t}.jpg"))
            m = np.zeros((H, W), bool)
            m[10:30, 10 + 4 * t:40 + 4 * t] = True
            anns.append([{"id": vid, "category_id": 1,
                          "segmentation": rle_util.encode(m),
                          "bbox": [10.0 + 4 * t, 10.0, 30.0, 20.0]}])
        records.append({"video_id": vid, "length": T, "height": H, "width": W,
                        "file_names": fnames, "annotations": anns})
    return records


def _make_loader(tmp_path, num_workers=0, size_buckets=None, min_sizes=(48, 96)):
    from mdqe_cvpr2023_tpu.data.augmentation import AugmentationPipeline
    from mdqe_cvpr2023_tpu.data.dataset import ClipMapper, CombinedClipLoader
    aug = AugmentationPipeline(min_sizes=list(min_sizes), max_size=160)
    mapper = ClipMapper(aug, n_frames=2, frame_range=3)
    records = _mini_source(tmp_path)
    return CombinedClipLoader([(records, mapper)], [1.0], batch_size=2,
                              max_instances=4, seed=7, num_workers=num_workers,
                              size_buckets=size_buckets)


def test_batch_stream_is_pure_function_of_index(tmp_path):
    l1 = _make_loader(tmp_path / "a")
    l2 = _make_loader(tmp_path / "a")
    for k in (0, 3, 11):
        b1, b2 = l1.batch_at(k), l2.batch_at(k)
        for key in b1:
            np.testing.assert_array_equal(b1[key], b2[key])
    # iter_from(k) yields batch_at(k), batch_at(k+1), ...
    it = l1.iter_from(2)
    np.testing.assert_array_equal(next(it)["images"], l2.batch_at(2)["images"])
    np.testing.assert_array_equal(next(it)["images"], l2.batch_at(3)["images"])


def test_prefetch_workers_match_sync_stream(tmp_path):
    sync = _make_loader(tmp_path / "b", num_workers=0)
    pre = _make_loader(tmp_path / "b", num_workers=3)
    it_s, it_p = sync.iter_from(0), pre.iter_from(0)
    for _ in range(6):
        bs, bp = next(it_s), next(it_p)
        for key in bs:
            np.testing.assert_array_equal(bs[key], bp[key])


def test_resolution_buckets(tmp_path):
    buckets = [(64, 96), (96, 160)]
    loader = _make_loader(tmp_path / "c", size_buckets=buckets)
    seen = set()
    it = loader.iter_from(0)
    for _ in range(12):
        b = next(it)
        hw = tuple(b["images"].shape[1:3])
        assert hw in buckets
        seen.add(hw)
    assert len(seen) == 2, "both short-side draws should map to distinct buckets"
    # a batch larger than every bucket falls back to exact /32 padding
    assert loader._bucket_for(100, 200) == (128, 224)


# ---------------------------------------------------------------------------
# full-state resume
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def resume_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_ds")
    from mdqe_cvpr2023_tpu.data import rle as rle_util
    try:
        import cv2
        write = lambda p, img: cv2.imwrite(str(p), img[:, :, ::-1])
    except Exception:
        from PIL import Image
        write = lambda p, img: Image.fromarray(img).save(str(p))
    H = W = 64
    T = 4
    videos, annotations = [], []
    for vid in range(1, 3):
        fnames = []
        os.makedirs(root / "ovis" / "train" / f"v{vid}", exist_ok=True)
        segs, bboxes, areas = [], [], []
        for t in range(T):
            img = np.full((H, W, 3), 30, np.uint8)
            img[8 + 2 * t:28 + 2 * t, 10:40] = [200, 60, 60]
            write(root / "ovis" / "train" / f"v{vid}/f{t}.jpg", img)
            fnames.append(f"v{vid}/f{t}.jpg")
            m = np.zeros((H, W), bool)
            m[8 + 2 * t:28 + 2 * t, 10:40] = True
            segs.append(rle_util.encode(m))
            bboxes.append([10.0, 8.0 + 2 * t, 30.0, 20.0])
            areas.append(int(m.sum()))
        videos.append({"id": vid, "file_names": fnames, "height": H, "width": W,
                       "length": T})
        annotations.append({"id": vid, "video_id": vid, "category_id": 1,
                            "segmentations": segs, "bboxes": bboxes,
                            "areas": areas, "iscrowd": 0})
    gt = {"videos": videos, "annotations": annotations,
          "categories": [{"id": 1, "name": "thing"}]}
    with open(root / "ovis" / "annotations_train.json", "w") as f:
        json.dump(gt, f)
    return root


def _resume_cfg(out_dir):
    from mdqe_cvpr2023_tpu.engine import load_config
    cfg = load_config("configs/R50_ovis_360.yaml")
    cfg.merge_from_list([
        "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
        "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
        "MODEL.MDQE.NUM_OBJECT_QUERIES", "16", "MODEL.MDQE.QUERY_EMBED_DIM", "8",
        "MODEL.MDQE.NUM_CLASSES", "1", "MODEL.MDQE.MAX_NUM_INSTANCES", "6",
        "INPUT.SAMPLING_FRAME_NUM", "2",
        "INPUT.MIN_SIZE_TRAIN", "[64]", "INPUT.MAX_SIZE_TRAIN", "64",
        "INPUT.CROP.ENABLED", "False",
        "DATASETS.TRAIN", "[ytvis_ovis_train]",
        "SOLVER.IMS_PER_BATCH", "8", "SOLVER.CHECKPOINT_PERIOD", "2",
        "TEST.EVAL_PERIOD", "0", "DATALOADER.NUM_WORKERS", "0",
        "OUTPUT_DIR", str(out_dir),
    ])
    return cfg


@pytest.mark.slow
def test_resume_matches_unbroken_run(resume_env, tmp_path, monkeypatch):
    """2 iters + checkpoint + resume for 2 more == 4 unbroken iters, bit-exact
    (requires optimizer state + step + data-stream position in the checkpoint)."""
    import jax
    from mdqe_cvpr2023_tpu.data import builtin
    monkeypatch.setitem(builtin.DATASET_SPLITS, "ytvis_ovis_train",
                        ("ovis/train", "ovis/annotations_train.json"))
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    t_full = Trainer(_resume_cfg(tmp_path / "full"), datasets_root=str(resume_env))
    t_full.train(max_iter=4, log_every=1)

    t_a = Trainer(_resume_cfg(tmp_path / "split"), datasets_root=str(resume_env))
    t_a.train(max_iter=2, log_every=1)
    ckpt = os.path.join(str(tmp_path / "split"), "ckpt_0000002")
    assert os.path.exists(ckpt)

    t_b = Trainer(_resume_cfg(tmp_path / "split2"), datasets_root=str(resume_env))
    t_b.load_checkpoint(ckpt)
    assert t_b.iteration == 2
    t_b.train(max_iter=4, log_every=1)

    flat_full = jax.tree.leaves(t_full.params)
    flat_res = jax.tree.leaves(t_b.params)
    assert len(flat_full) == len(flat_res)
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# per-clip detection capacity (reference mdqe.py:380)
# ---------------------------------------------------------------------------

def test_clip_topk_wired_from_detections_per_image():
    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.build import build_inference_cfg
    cfg = load_config("configs/R50_ovis_360.yaml")
    inf = build_inference_cfg(cfg)
    assert inf.clip_topk == min(10 * cfg.TEST.DETECTIONS_PER_IMAGE, 196) == 150


def test_crowded_clip_keeps_more_than_32_detections():
    """40 disjoint high-scoring instances must all survive post-processing when
    the slab has reference capacity (the old fixed 32-slab truncated them)."""
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.meta import postprocess_clip

    N, Q, K, C = 40, 64, 5, 16
    T, H, W = 2, 40, 64
    rng = np.random.default_rng(3)
    # proto channel i lights up block i only
    mask_feats = np.full((T, H, W, N), -8.0, np.float32)
    cols = W // 8
    for i in range(N):
        r, c = divmod(i, cols)
        mask_feats[:, r * 5:r * 5 + 5, c * 8:c * 8 + 8, i] = 8.0
    coeff = np.zeros((Q, N), np.float32)
    coeff[:N] = np.eye(N)
    cls_probs = np.full((Q, K), 1e-4, np.float32)
    cls_probs[np.arange(N), rng.integers(0, K, N)] = 0.9
    embeds = rng.standard_normal((Q, C)).astype(np.float32)

    out = postprocess_clip(jnp.asarray(cls_probs), jnp.asarray(coeff),
                           jnp.asarray(embeds), jnp.asarray(mask_feats),
                           apply_cls_thres=0.1, topk=60)
    assert int(out["valid"].sum()) == N
    assert N > 32  # the point: reference capacity exceeds the old slab
