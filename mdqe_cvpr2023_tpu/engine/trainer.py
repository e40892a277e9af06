"""Training / evaluation driver (the reference's Trainer on D2 DefaultTrainer,
train_net.py:46-221, rebuilt TPU-native: data-parallel jit train step over a device
mesh, orbax checkpointing, periodic dev-split eval, jax.profiler tracing hooks)."""
from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data import rle as rle_util
from ..data.augmentation import AugmentationPipeline
from ..data.builtin import CATEGORY_MAPS, get_dataset
from ..data.dataset import ClipMapper, CombinedClipLoader
from ..data.ytvis_eval import YTVISEvaluator
from ..losses import CriterionCfg
from ..models.detr import detr_init
from ..models.meta import InferenceCfg, inference_vis, preprocess_frames
from ..parallel.train import (TrainCfg, make_mesh, make_optimizer, make_train_step,
                              replicate, shard_batch)
from .build import (build_criterion_cfg, build_inference_cfg, build_model_cfg,
                    build_train_cfg)
from .checkpoint import load_torch_checkpoint


@functools.lru_cache(maxsize=8)
def _cached_train_step(model_cfg, crit_cfg, train_cfg, match_stride,
                       pixel_mean, pixel_std):
    tx = make_optimizer(train_cfg)
    return tx, make_train_step(model_cfg, crit_cfg, tx,
                               match_stride=match_stride,
                               pixel_mean=pixel_mean, pixel_std=pixel_std,
                               amp=train_cfg.amp)


class Trainer:
    def __init__(self, cfg, datasets_root: Optional[str] = None):
        self.cfg = cfg
        self.model_cfg = build_model_cfg(cfg)
        self.crit_cfg = build_criterion_cfg(cfg)
        self.train_cfg = build_train_cfg(cfg)
        self.inf_cfg = build_inference_cfg(cfg)
        self.datasets_root = datasets_root
        self.output_dir = cfg.OUTPUT_DIR
        os.makedirs(self.output_dir, exist_ok=True)

        self.mesh = make_mesh()
        self.params = self._init_or_load_params(cfg)
        # shared across Trainer instances with equal configs so re-created
        # trainers (e.g. resume in the same process, tests) reuse the jit cache
        self.tx, self.step_fn = _cached_train_step(
            self.model_cfg, self.crit_cfg, self.train_cfg,
            cfg.MODEL.MDQE.MATCH_STRIDE,
            tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD))
        self.opt_state = self.tx.init(self.params)
        self.iteration = 0

    # ------------------------------------------------------------------
    def _init_or_load_params(self, cfg):
        params = detr_init(jax.random.PRNGKey(cfg.get("SEED", 0)), self.model_cfg)
        weights = cfg.MODEL.WEIGHTS
        if weights and os.path.exists(weights):
            loaded = load_torch_checkpoint(
                weights,
                f_pretrain=cfg.INPUT.PRETRAIN_FRAME_NUM,
                f_target=cfg.INPUT.SAMPLING_FRAME_NUM)
            params = _merge_params(params, loaded)
        return params

    # ------------------------------------------------------------------
    def build_train_loader(self):
        cfg = self.cfg
        n_frames = cfg.INPUT.SAMPLING_FRAME_NUM
        sources = []
        buckets = set()
        pad = lambda v: -(-v // 32) * 32
        for name in cfg.DATASETS.TRAIN:
            records = get_dataset(name, self.datasets_root)
            pseudo = name.startswith("coco")
            inp = cfg.INPUT.PSEUDO if pseudo else cfg.INPUT
            lsj = cfg.INPUT.LSJ_AUG
            aug = AugmentationPipeline(
                min_sizes=list(inp.MIN_SIZE_TRAIN),
                max_size=inp.MAX_SIZE_TRAIN,
                crop_enabled=inp.CROP.ENABLED,
                crop_type=inp.CROP.TYPE,
                crop_size=tuple(inp.CROP.SIZE),
                rotation="rotation" in inp.AUGMENTATIONS,
                color_kinds=[a for a in inp.AUGMENTATIONS if a != "rotation"],
                lsj_enabled=bool(lsj.ENABLED) and not pseudo,
                lsj_image_size=lsj.IMAGE_SIZE,
                lsj_min_scale=lsj.MIN_SCALE,
                lsj_max_scale=lsj.MAX_SCALE,
            )
            mapper = ClipMapper(aug, n_frames, cfg.INPUT.SAMPLING_FRAME_RANGE,
                                pseudo=pseudo)
            sources.append((records, mapper))
            # resolution buckets per source: {median, max} short side x
            # {16:9-bound, max-size} width -> a handful of stable jit shapes
            # covering the batch-consistent short-side draws (batches whose
            # content exceeds every bucket fall back to exact pad32 shapes)
            ms = sorted(inp.MIN_SIZE_TRAIN)
            for m in {ms[(len(ms) - 1) // 2], ms[-1]}:
                wide = min(inp.MAX_SIZE_TRAIN, -(-16 * m // 9))
                buckets.add((pad(m), pad(wide)))
                buckets.add((pad(m), pad(inp.MAX_SIZE_TRAIN)))
            if cfg.INPUT.LSJ_AUG.ENABLED and not pseudo:
                sz = pad(cfg.INPUT.LSJ_AUG.IMAGE_SIZE)
                buckets.add((sz, sz))
        ratios = cfg.DATASETS.DATASET_RATIO
        if not ratios or len(ratios) != len(sources):
            ratios = [1.0] * len(sources)
        n_dev = len(jax.devices())
        batch = max(cfg.SOLVER.IMS_PER_BATCH // max(n_dev, 1), 1) * n_dev
        # device placement happens inside the worker threads (transfer=...):
        # the ~43 MB/iter host->device upload overlaps the in-flight train step
        return CombinedClipLoader(sources, ratios, batch,
                                  cfg.MODEL.MDQE.MAX_NUM_INSTANCES // 6 or 20,
                                  seed=cfg.get("SEED", 0),
                                  size_buckets=sorted(buckets),
                                  num_workers=cfg.DATALOADER.NUM_WORKERS,
                                  transfer=lambda b: shard_batch(b, self.mesh))

    # ------------------------------------------------------------------
    def train(self, max_iter: Optional[int] = None, log_every: int = 20,
              profile_at: Optional[int] = None):
        source = self.build_train_loader()
        loader = source.iter_from(self.iteration)  # resume-exact data stream
        max_iter = max_iter or self.train_cfg.max_iter
        ckpt_period = self.cfg.SOLVER.CHECKPOINT_PERIOD
        eval_period = self.cfg.TEST.EVAL_PERIOD
        rng = jax.random.PRNGKey(17)
        data_wait = 0.0

        with self.mesh:
            params = replicate(self.params, self.mesh)
            opt_state = replicate(self.opt_state, self.mesh)
            t_last = time.perf_counter()
            while self.iteration < max_iter:
                if profile_at is not None and self.iteration == profile_at:
                    jax.profiler.start_trace(os.path.join(self.output_dir, "trace"))
                batch = next(loader)  # already sharded by the loader threads
                data_wait += source.last_wait_s
                params, opt_state, total, ldict = self.step_fn(
                    params, opt_state, batch, jax.random.fold_in(rng, self.iteration))
                self.iteration += 1
                if profile_at is not None and self.iteration == profile_at + 3:
                    jax.block_until_ready(total)
                    jax.profiler.stop_trace()
                if self.iteration % log_every == 0:
                    dt = (time.perf_counter() - t_last) / log_every
                    t_last = time.perf_counter()
                    row = {"iteration": self.iteration,
                           "total_loss": float(total), "sec_per_iter": dt,
                           "data_wait_sec_per_iter": data_wait / log_every,
                           "data_wait_frac": data_wait / max(dt * log_every, 1e-9)}
                    data_wait = 0.0
                    row.update({k: float(v) for k, v in ldict.items()})
                    with open(os.path.join(self.output_dir, "metrics.jsonl"),
                              "a") as f:
                        f.write(json.dumps(row) + "\n")
                    print(f"iter {self.iteration}  loss {float(total):.4f}  "
                          f"{dt:.2f}s/it", flush=True)
                if self.iteration % ckpt_period == 0 or self.iteration == max_iter:
                    self.params = params
                    self.opt_state = opt_state
                    self.save_checkpoint()
                if eval_period > 0 and self.iteration % eval_period == 0:
                    self.params = params
                    self.test()
        self.params = params
        self.opt_state = opt_state

    # ------------------------------------------------------------------
    def save_checkpoint(self):
        """Full training-state checkpoint: params + optimizer state + iteration
        (the reference resumes optimizer+scheduler via D2's checkpointer,
        train_net.py:243,257 — `step` drives the LR schedule, so saving it
        restores the scheduler too)."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.output_dir,
                                            f"ckpt_{self.iteration:07d}"))
        ckptr = ocp.StandardCheckpointer()
        state = {"params": self.params, "opt_state": self.opt_state,
                 "step": self.iteration}
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        print(f"saved checkpoint {path}", flush=True)

    def load_checkpoint(self, path: str, params_only: bool = False):
        """Restore full training state {params, opt_state, step}.

        A checkpoint that does not round-trip against the live state template
        (wrong model config, corrupted files, legacy params-only layout) raises
        instead of silently dropping opt_state — a silent optimizer restart
        changes training results without any sign of it. Pass
        ``params_only=True`` to explicitly restore just the params from a
        legacy/foreign checkpoint; the optimizer is then loudly re-initialized.
        """
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(path)
        if params_only:
            restored = ckptr.restore(path)  # raw-tree restore
            if not isinstance(restored, dict) or "params" not in restored:
                raise ValueError(
                    f"checkpoint {path} has no 'params' entry; keys: "
                    f"{sorted(restored) if isinstance(restored, dict) else type(restored)}")
            self.params = _check_tree_shapes(self.params, restored["params"], path)
            self.opt_state = self.tx.init(self.params)
            self.iteration = int(restored.get("step", 0))
            print(f"[checkpoint] params-only restore from {path}: optimizer "
                  "state RE-INITIALIZED", flush=True)
            return
        # restore with the live state as the item template so optax's typed
        # containers (ScaleByAdamState etc.) round-trip
        template = {"params": self.params, "opt_state": self.opt_state,
                    "step": self.iteration}
        try:
            restored = ckptr.restore(path, template)
            # orbax restores the on-disk shapes even when the template differs;
            # verify explicitly so a config mismatch cannot slip through
            _check_tree_shapes(template["params"], restored["params"], path)
            _check_tree_shapes(template["opt_state"], restored["opt_state"],
                               path)
        except Exception as e:
            raise RuntimeError(
                f"checkpoint {path} does not match the current training state "
                "(model/optimizer config changed, or a legacy params-only "
                "save). Use load_checkpoint(path, params_only=True) to restore "
                f"just the params with a fresh optimizer. Original error: {e}"
            ) from e
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.iteration = int(restored["step"])

    # ------------------------------------------------------------------
    def test(self, dataset_name: Optional[str] = None, max_videos: Optional[int] = None):
        """Run VIS inference over a test split and compute AP (when GT has
        annotations). Returns (metrics, predictions)."""
        cfg = self.cfg
        name = dataset_name or cfg.DATASETS.TEST[0]
        if name.startswith("coco"):
            return self.test_coco(name, max_videos)
        from ..data.builtin import DATASET_SPLITS
        root = self.datasets_root or os.environ.get("MDQE_DATASETS_ROOT", "datasets")
        image_root, json_path = DATASET_SPLITS[name]
        json_path = os.path.join(root, json_path)
        image_root = os.path.join(root, image_root)
        with open(json_path) as f:
            gt_json = json.load(f)

        records = get_dataset(name, root)
        if max_videos:
            records = records[:max_videos]
        # shard videos across processes; gather predictions before evaluation
        # (reference ytvis_eval.py:122-128 comm.gather to rank 0)
        n_proc = jax.process_count()
        if n_proc > 1:
            records = records[jax.process_index()::n_proc]
        predictions = self.predict_videos(records)
        if n_proc > 1:
            from ..utils.dist import all_gather_objects
            predictions = [p for part in all_gather_objects(predictions)
                           for p in part]

        # evaluate + write on the main process only: on a shared filesystem
        # concurrent writes from multiple hosts interleave/truncate the file
        # (reference gathers to rank 0 and only rank 0 evaluates,
        # ytvis_eval.py:122-128)
        from ..utils.dist import is_main_process
        metrics = None
        if is_main_process():
            if gt_json.get("annotations"):
                ev = YTVISEvaluator(gt_json)
                metrics = ev.evaluate(predictions)
                print({k: round(v, 2) for k, v in metrics.items()
                       if not isinstance(v, dict)}, flush=True)
            out = os.path.join(self.output_dir, f"results_{name}.json")
            with open(out, "w") as f:
                json.dump(predictions, f)
        return metrics, predictions

    def predict_videos(self, records: List[Dict]) -> List[Dict]:
        from ..data.dataset import read_image
        cfg = self.cfg
        mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        min_test = cfg.INPUT.MIN_SIZE_TEST
        max_test = cfg.INPUT.get("MAX_SIZE_TEST", 1333)
        predictions = []
        for rec in records:
            frames = []
            H, W = rec["height"], rec["width"]
            scale = min_test / min(H, W)
            if max(H, W) * scale > max_test:
                scale = max_test / max(H, W)
            th, tw = int(round(H * scale)), int(round(W * scale))
            for fp in rec["file_names"]:
                img = read_image(fp)
                frames.append(_resize(img, th, tw))
            video = np.stack(frames)
            proc, _ = preprocess_frames(video, mean, std)
            out = inference_vis(self.params, self.model_cfg, self.inf_cfg, proc,
                                image_size=(th, tw), ori_size=(H, W),
                                pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
                                pixel_std=tuple(cfg.MODEL.PIXEL_STD))
            for score, label, mask in zip(out["pred_scores"], out["pred_labels"],
                                          out["pred_masks"]):
                predictions.append({
                    "video_id": rec["video_id"],
                    "category_id": int(label) + 1,  # back to 1-based json ids
                    "score": float(score),
                    "segmentations": [rle_util.encode(m) for m in mask],
                })
        return predictions


def _resize(img, h, w):
    try:
        import cv2
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    except Exception:
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


def _check_tree_shapes(template, loaded, path):
    """Validate a params-only restore leaf-by-leaf (structure + shapes) so a
    config/checkpoint mismatch fails with a named leaf, not a downstream
    shape error."""
    t_leaves, t_def = jax.tree.flatten(template)
    l_leaves, l_def = jax.tree.flatten(loaded)
    if t_def != l_def:
        raise ValueError(f"checkpoint {path} params tree structure does not "
                         f"match the model: {l_def} vs expected {t_def}")
    for kp, t, l in zip(jax.tree_util.tree_flatten_with_path(template)[0],
                        t_leaves, l_leaves):
        if tuple(np.shape(t)) != tuple(np.shape(l)):
            name = jax.tree_util.keystr(kp[0])
            raise ValueError(
                f"checkpoint {path} leaf {name} has shape {np.shape(l)}, "
                f"model expects {np.shape(t)}")
    return loaded


def _merge_params(init_params, loaded):
    """Overlay loaded leaves onto the initialized tree (missing keys keep init)."""
    if isinstance(init_params, dict) and isinstance(loaded, dict):
        out = {}
        for k, v in init_params.items():
            out[k] = _merge_params(v, loaded[k]) if k in loaded else v
        return out
    if isinstance(init_params, list) and isinstance(loaded, list):
        return [_merge_params(a, b) for a, b in zip(init_params, loaded)]
    if loaded is None:
        return init_params
    if hasattr(loaded, "shape") and hasattr(init_params, "shape") \
            and tuple(loaded.shape) != tuple(init_params.shape):
        print(f"[checkpoint] shape mismatch {loaded.shape} vs {init_params.shape}; "
              "keeping init", flush=True)
        return init_params
    return loaded


def _coco_gt_as_videos(gt_json):
    """Wrap a COCO instances json as 1-frame videos so the VIS evaluator (video IoU
    degenerates to image IoU at T=1) computes standard mask AP."""
    videos = [{"id": im["id"], "height": im["height"], "width": im["width"],
               "length": 1, "file_names": [im.get("file_name", "")]}
              for im in gt_json["images"]]
    anns = []
    for a in gt_json.get("annotations", []):
        anns.append({
            "id": a["id"], "video_id": a["image_id"],
            "category_id": a["category_id"],
            "segmentations": [a.get("segmentation")],
            "areas": [a.get("area")], "iscrowd": a.get("iscrowd", 0),
        })
    return {"videos": videos, "annotations": anns,
            "categories": gt_json["categories"]}


def _attach_coco_eval():
    """Adds test_coco to Trainer (COCO eval-only path, reference mdqe.py:486-556 +
    D2 COCOEvaluator)."""

    def test_coco(self, name, max_images=None):
        import json as _json
        from ..data import rle as rle_util
        from ..data.builtin import DATASET_SPLITS
        from ..data.dataset import read_image
        from ..data.ytvis_eval import YTVISEvaluator
        from ..models.meta import inference_image, preprocess_frames

        root = self.datasets_root or os.environ.get("MDQE_DATASETS_ROOT", "datasets")
        image_root, json_path = DATASET_SPLITS[name]
        json_path = os.path.join(root, json_path)
        image_root = os.path.join(root, image_root)
        with open(json_path) as f:
            gt_json = _json.load(f)
        images = gt_json["images"]
        if max_images:
            images = images[:max_images]

        cfg = self.cfg
        mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        min_test = cfg.INPUT.MIN_SIZE_TEST
        max_test = cfg.INPUT.get("MAX_SIZE_TEST", 1333)
        predictions = []
        for im in images:
            img = read_image(os.path.join(image_root, im["file_name"]))
            H, W = img.shape[:2]
            scale = min_test / min(H, W)
            if max(H, W) * scale > max_test:
                scale = max_test / max(H, W)
            th, tw = int(round(H * scale)), int(round(W * scale))
            resized = _resize(img, th, tw)[None]
            proc, _ = preprocess_frames(resized)
            out = inference_image(self.params, self.model_cfg, self.inf_cfg,
                                  proc, (th, tw), (H, W),
                                  pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
                                  pixel_std=tuple(cfg.MODEL.PIXEL_STD))
            for s, c, m in zip(out["scores"], out["classes"], out["masks"]):
                predictions.append({"video_id": im["id"], "category_id": int(c) + 1,
                                    "score": float(s),
                                    "segmentations": [rle_util.encode(m)]})
        metrics = None
        if gt_json.get("annotations"):
            ev = YTVISEvaluator(_coco_gt_as_videos(
                {**gt_json, "images": images,
                 "annotations": [a for a in gt_json["annotations"]
                                 if a["image_id"] in {i["id"] for i in images}]}))
            metrics = ev.evaluate(predictions)
            print({k: round(v, 2) for k, v in metrics.items()
                   if not isinstance(v, dict)}, flush=True)
        return metrics, predictions

    Trainer.test_coco = test_coco


_attach_coco_eval()
