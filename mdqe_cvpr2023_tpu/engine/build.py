"""Config -> component builders (the glue the reference gets from detectron2's
registry + Trainer: train_net.py:46-221, mdqe/mdqe.py:63-192)."""
from __future__ import annotations

import math

from ..losses.criterion import CriterionCfg
from ..models.detr import MDQEModelCfg
from ..models.meta import InferenceCfg
from ..parallel.train import TrainCfg
from .config import CfgNode


def build_model_cfg(cfg: CfgNode) -> MDQEModelCfg:
    name = cfg.MODEL.BACKBONE.NAME
    swin = None
    if "swin" in name.lower():
        from ..models.swin import SwinCfg
        sw = cfg.MODEL.SWIN
        backbone = f"swin_{sw.TYPE}"
        # build_swin_backbone selects v1 (swin_transformer.py:646), the
        # v2 builders (build_swinv2_backbone) select v2
        version = 1 if "swinv2" not in name.lower() else 2
        swin = SwinCfg(embed_dim=sw.EMBED_DIM, depths=tuple(sw.DEPTHS),
                       num_heads=tuple(sw.NUM_HEADS),
                       window_size=sw.WINDOW_SIZE,
                       patch_size=sw.get("PATCH_SIZE", 4),
                       version=version,
                       drop_path_rate=float(sw.get("DROP_PATH_RATE", 0.0)),
                       ape=bool(sw.get("APE", False)),
                       pretrain_img_size=int(sw.get("PRETRAIN_IMG_SIZE", 224)))
    else:
        backbone = f"resnet{cfg.MODEL.RESNETS.DEPTH}"
    m = cfg.MODEL.MDQE
    return MDQEModelCfg(
        backbone=backbone,
        swin=swin,
        num_classes=m.NUM_CLASSES,
        hidden_dim=m.HIDDEN_DIM,
        n_heads=m.NHEADS,
        n_feature_levels=m.NUM_FEATURE_LEVELS,
        enc_layers=m.ENC_LAYERS,
        dec_layers=m.DEC_LAYERS,
        enc_points=m.ENC_NUM_POINTS,
        dec_points=m.DEC_NUM_POINTS,
        n_frames=cfg.INPUT.SAMPLING_FRAME_NUM,
        n_query=int(math.sqrt(m.NUM_OBJECT_QUERIES)) ** 2,
        query_embed_dim=m.QUERY_EMBED_DIM,
        window_inter_frame_asso=m.WINDOW_INTER_FRAME_ASSOCIATION,
        mlp_ratio=float(m.MLP_RATIO),
        dec_temporal=m.DEC_TEMPORAL,
        mask_on=cfg.MODEL.MASK_ON,
    )


def build_criterion_cfg(cfg: CfgNode) -> CriterionCfg:
    m = cfg.MODEL.MDQE
    return CriterionCfg(
        num_classes=m.NUM_CLASSES,
        eos_coef=float(m.NO_OBJECT_WEIGHT),
        n_frames=cfg.INPUT.SAMPLING_FRAME_NUM,
        n_query=int(math.sqrt(m.NUM_OBJECT_QUERIES)) ** 2,
        window_inter_frame_asso=m.WINDOW_INTER_FRAME_ASSOCIATION,
        interinst_enabled=m.INTERINST_MASK_LOSS_ENABLED,
        interinst_threshold=m.INTERINST_MASK_THRESHOLD,
        box_weight=float(m.BOX_WEIGHT),
        mask_weight=float(m.MASK_WEIGHT),
        dice_weight=float(m.DICE_WEIGHT),
    )


def build_train_cfg(cfg: CfgNode) -> TrainCfg:
    s = cfg.SOLVER
    return TrainCfg(
        base_lr=float(s.BASE_LR),
        weight_decay=float(s.WEIGHT_DECAY),
        backbone_multiplier=float(s.BACKBONE_MULTIPLIER),
        clip_norm=float(s.CLIP_GRADIENTS.CLIP_VALUE) if s.CLIP_GRADIENTS.ENABLED
        else 0.0,
        steps=tuple(s.STEPS),
        max_iter=int(s.MAX_ITER),
        warmup_iters=int(s.WARMUP_ITERS),
        warmup_factor=float(s.WARMUP_FACTOR),
        amp=bool(s.AMP.ENABLED),
        freeze_at=int(cfg.MODEL.BACKBONE.FREEZE_AT),
    )


def build_inference_cfg(cfg: CfgNode) -> InferenceCfg:
    m = cfg.MODEL.MDQE
    n_query = int(math.sqrt(m.NUM_OBJECT_QUERIES)) ** 2
    # per-clip detection slab: the reference admits up to 10*DETECTIONS_PER_IMAGE
    # deduped candidates per clip into the tracker (mdqe/mdqe.py:380); never more
    # than the query count can survive
    clip_topk = min(10 * cfg.TEST.DETECTIONS_PER_IMAGE, n_query)
    return InferenceCfg(
        clip_stride=m.CLIP_STRIDE,
        n_frames_test=m.SAMPLING_FRAME_NUM_TEST,
        n_frames_window_test=m.WINDOW_FRAME_NUM_TEST,
        max_num_instances=m.MAX_NUM_INSTANCES,
        apply_cls_thres=float(m.APPLY_CLS_THRES),
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        multi_cls_on=m.MULTI_CLS_ON,
        match_stride=m.MATCH_STRIDE,
        clip_topk=clip_topk,
        num_classes=m.NUM_CLASSES,
    )
