"""Detectron2-compatible ResNet (FrozenBN), NHWC, stride_in_1x1=False.

Behavioral spec: detectron2.modeling.backbone.resnet (as configured by the reference:
configs/R50_coco.yaml MODEL.RESNETS: DEPTH 50, STRIDE_IN_1X1 False,
OUT_FEATURES [res3, res4, res5]). Param tree mirrors the D2 checkpoint names
(stem.conv1.{weight,norm.*}, res{2..5}.{i}.{conv1,conv2,conv3,shortcut}.*) so the
released checkpoints map 1:1.

TPU notes: all convs run NHWC with OIHW weights (dimension_numbers handle the layout);
FrozenBN folds to a scale+bias at apply time, which XLA fuses into the conv epilogue.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import nn as fnn

RESNET_STAGES = {
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
}


def _conv_bn_init(key, cin, cout, k):
    w = fnn.kaiming_uniform(key, (cout, cin, k, k), a=0.0)  # D2 uses msra_fill (a=0)
    f32 = jnp.float32
    return {"weight": w,
            "norm": {"weight": jnp.ones((cout,), f32), "bias": jnp.zeros((cout,), f32),
                     "running_mean": jnp.zeros((cout,), f32),
                     "running_var": jnp.ones((cout,), f32)}}


def _conv_bn(p, x, stride=1, padding=0, relu=True):
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    y = fnn.frozen_batch_norm(p["norm"], y)
    return jax.nn.relu(y) if relu else y


def resnet_init(key, depth=50):
    """Returns the param tree for ResNet-{50,101} producing res3, res4, res5."""
    blocks_per_stage = RESNET_STAGES[depth]
    keys = jax.random.split(key, 32)
    ki = iter(keys)
    params = {"stem": {"conv1": _conv_bn_init(next(ki), 3, 64, 7)}}
    in_ch = 64
    for si, (stage, nblock) in enumerate(zip(["res2", "res3", "res4", "res5"], blocks_per_stage)):
        bottleneck = 64 * (2 ** si)
        out_ch = bottleneck * 4
        stage_params = []
        kstage = jax.random.split(keys[8 + si], nblock * 4)
        for bi in range(nblock):
            kb = kstage[bi * 4:(bi + 1) * 4]
            blk = {
                "conv1": _conv_bn_init(kb[0], in_ch, bottleneck, 1),
                "conv2": _conv_bn_init(kb[1], bottleneck, bottleneck, 3),
                "conv3": _conv_bn_init(kb[2], bottleneck, out_ch, 1),
            }
            if bi == 0:
                blk["shortcut"] = _conv_bn_init(kb[3], in_ch, out_ch, 1)
            stage_params.append(blk)
            in_ch = out_ch
        params[stage] = stage_params
    return params


def _bottleneck(p, x, stride):
    """stride_in_1x1=False: the stride lives in the 3x3 conv."""
    if "shortcut" in p:
        sc = _conv_bn(p["shortcut"], x, stride=stride, padding=0, relu=False)
    else:
        sc = x
    y = _conv_bn(p["conv1"], x, stride=1, padding=0)
    y = _conv_bn(p["conv2"], y, stride=stride, padding=1)
    y = _conv_bn(p["conv3"], y, stride=1, padding=0, relu=False)
    return jax.nn.relu(y + sc)


def resnet_apply(params, x, out_features=("res3", "res4", "res5")):
    """x: (B, H, W, 3) normalized. Returns dict of NHWC feature maps."""
    y = _conv_bn(params["stem"]["conv1"], x, stride=2, padding=3)
    # maxpool 3x3 stride 2 pad 1
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    feats = {}
    for stage in ["res2", "res3", "res4", "res5"]:
        stride = 1 if stage == "res2" else 2
        for bi, blk in enumerate(params[stage]):
            y = _bottleneck(blk, y, stride if bi == 0 else 1)
        if stage in out_features:
            feats[stage] = y
    return feats
