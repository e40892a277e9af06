"""COCO-path postprocess parity: the reference's `MDQE.inference_image`
(/root/reference/mdqe/mdqe.py:486-556 — center-frame selection, score
threshold, aligned-bilinear upsample + crop, mask-quality rescoring, box-IoU
soft-NMS in score order, multi-class expansion) fed OUR forward's outputs,
against this repo's `inference_image` on the same image and params.

Both sides postprocess bit-identical decoder outputs (our f32 forward), so the
comparison isolates the COCO glue — the one pipeline not covered by
test_full_pipeline_parity. out_size == image_size keeps the final resize an
identity on both sides, removing the documented nearest-vs-bilinear boundary
deviation from the comparison."""
import dataclasses
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os

REF_AVAILABLE = os.path.isdir("/root/reference/mdqe")
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REF_AVAILABLE,
                                 reason="reference repo not mounted")]

if REF_AVAILABLE:
    from ref_oracle import load_reference_full

Q, K = 16, 8
H, W = 100, 150          # pads to 128x160
STRIDE = 4


def _setup(T):
    import jax
    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.build import (build_inference_cfg,
                                                build_model_cfg)
    from mdqe_cvpr2023_tpu.models.detr import detr_init

    cfg = load_config("configs/R50_coco.yaml")
    cfg.merge_from_list([
        "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
        "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
        "MODEL.MDQE.NUM_OBJECT_QUERIES", str(Q),
        "MODEL.MDQE.QUERY_EMBED_DIM", "8",
        "MODEL.MDQE.NUM_CLASSES", str(K),
        "INPUT.SAMPLING_FRAME_NUM", str(T), "INPUT.MIN_SIZE_TEST", "100",
        "DATASETS.TEST", "[coco_2017_val]",
    ])
    model_cfg = build_model_cfg(cfg)
    inf_cfg = dataclasses.replace(build_inference_cfg(cfg), coco_topk=Q * K)
    params = detr_init(jax.random.PRNGKey(3), model_cfg)

    # focal-init biases put every score below apply_cls_thres=0.05 — spread the
    # cls head deterministically so thresholds/NMS/multi-cls paths all fire
    # (same surgery idea as test_full_pipeline_parity._build)
    rng = np.random.default_rng(23)

    def spread(path, leaf):
        name = "/".join(str(p) for p in path)
        if "cls_embed" in name and "rpn" not in name:
            if name.endswith("'b']"):
                return jax.numpy.asarray(
                    rng.uniform(-1.7, 0.0, leaf.shape).astype(np.float32))
            if name.endswith("'w']"):
                return leaf * 3.0
        if "mask_embed" in name and name.endswith("'w']"):
            return leaf * 2.0
        return leaf

    import jax.tree_util as jtu
    params = jtu.tree_map_with_path(spread, params)
    return params, model_cfg, inf_cfg


def _image(T):
    rng = np.random.default_rng(7)
    img = rng.integers(40, 90, (H, W, 3)).astype(np.uint8)
    for i, (y0, x0) in enumerate([(10, 15), (40, 70), (62, 110), (20, 95)]):
        img[y0:y0 + 26, x0:x0 + 30] = rng.integers(130, 255, 3)
    return np.tile(img[None], (T, 1, 1, 1))


def _our_forward(params, model_cfg, video):
    """The same f32 forward `_coco_device_stage` runs, standalone, to feed the
    reference's postprocess with bit-identical inputs."""
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.detr import detr_apply_backbone
    from mdqe_cvpr2023_tpu.models.meta import preprocess_frames

    frames, sizes = preprocess_frames(video)
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)
    norm = (jnp.asarray(frames).astype(jnp.float32) - mean) / std
    out = detr_apply_backbone(params, model_cfg, norm, jnp.asarray(sizes),
                              n_frames=video.shape[0], training=False,
                              is_coco=True)
    return frames, sizes, out


def _ref_postprocess(out, T, multi_cls, apply_cls_thres, frames):
    ref = load_reference_full()
    import sys
    meta_mod = sys.modules["refmdqe.mdqe"]
    ImageList = meta_mod.ImageList

    cls = torch.from_numpy(np.asarray(out["cls"][0], np.float32))[None]
    # ours (Q, T, H4, W4) logits already; reference "masks" is (1, Q, T, H, W)
    masks = torch.from_numpy(np.asarray(out["masks"][0], np.float32))[None]

    self_like = types.SimpleNamespace(
        n_frames=T, apply_cls_thres=apply_cls_thres, match_stride=STRIDE,
        is_multi_cls=multi_cls)
    imgs = ImageList(torch.zeros(T, 3, frames.shape[1], frames.shape[2]),
                     [(H, W)])
    batched = [{"height": H, "width": W}]
    with torch.no_grad():
        res = ref.MDQE.inference_image(
            self_like, {"cls": cls, "masks": masks}, batched, imgs)
    inst = res[0]["instances"]
    return (inst.scores.numpy(), inst.pred_classes.numpy(),
            inst.pred_masks.numpy())


def _sorted_triplets(scores, labels, masks):
    order = np.argsort(-scores, kind="stable")
    return scores[order], labels[order], masks[order]


@pytest.mark.parametrize("T", [1, 3])
@pytest.mark.parametrize("multi_cls", [True, False])
def test_coco_postprocess_parity(T, multi_cls):
    import jax

    with jax.default_matmul_precision("float32"):
        params, model_cfg, inf_cfg = _setup(T)
        inf_cfg = dataclasses.replace(inf_cfg, multi_cls_on=multi_cls)
        video = _image(T)
        frames, sizes, out = _our_forward(params, model_cfg, video)

        from mdqe_cvpr2023_tpu.models.meta import inference_image
        ours = inference_image(params, model_cfg, inf_cfg, frames, (H, W),
                               (H, W))

    ref_s, ref_l, ref_m = _ref_postprocess(out, T, multi_cls,
                                           inf_cfg.apply_cls_thres, frames)

    our_s = np.asarray(ours["scores"], np.float32)
    our_l = np.asarray(ours["classes"], np.int64)
    our_m = ours["masks"]

    assert len(our_s) == len(ref_s), \
        f"{len(our_s)} detections vs reference {len(ref_s)}"
    if len(ref_s) == 0:
        return
    ref_s, ref_l, ref_m = _sorted_triplets(ref_s, ref_l, ref_m)
    our_s, our_l, our_m = _sorted_triplets(our_s, our_l, our_m)
    np.testing.assert_allclose(our_s, ref_s, rtol=1e-3, atol=1e-4)

    # equal scores can tie across (query,label) pairs — compare by greedy
    # match within score ties rather than positionally
    used = np.zeros(len(ref_s), bool)
    for i in range(len(our_s)):
        cands = np.nonzero((~used) & (np.abs(ref_s - our_s[i]) < 1e-3)
                           & (ref_l == our_l[i]))[0]
        best, best_iou = -1, -1.0
        for j in cands:
            inter = np.logical_and(our_m[i], ref_m[j]).sum()
            union = np.logical_or(our_m[i], ref_m[j]).sum()
            iou = inter / union if union else 1.0
            if iou > best_iou:
                best, best_iou = j, iou
        assert best >= 0 and best_iou >= 0.99, \
            f"det {i} (score {our_s[i]:.4f}, label {our_l[i]}): " \
            f"best mask IoU {best_iou:.3f}"
        used[best] = True
