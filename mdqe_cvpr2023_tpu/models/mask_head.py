"""YOLACT-style proto-mask FPN head.

Behavioral spec: /root/reference/mdqe/models/segmentation.py:12-113 — three
3x3 conv + GN(8) + GELU blocks with two 1x1 lateral adapters (stride-32 input,
stride-16 and stride-8 laterals, nearest upsampling), then
DepthwiseSeparableConv5x5+GN+ReLU -> depthwise 1x1 transpose-conv x2 upsample ->
DepthwiseSeparableConv5x5 to hidden_dim//8 proto channels at stride 4.
Masks are later formed as einsum('qm,mthw->qthw', coeff, proto).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils import nn as fnn
from ..utils.misc import interpolate_nearest


@dataclass(frozen=True)
class MaskHeadCfg:
    hidden_dim: int = 256
    fpn_dims: tuple = (256, 256)

    @property
    def num_gen_params(self) -> int:
        return self.hidden_dim // 8


def _gn_groups(cout: int) -> int:
    """Reference rule: 32 groups if divisible else 24 (segmentation.py:103); fall back
    to per-channel groups for non-reference (test) widths."""
    return 32 if cout % 32 == 0 else (24 if cout % 24 == 0 else cout)


def _dwsep_init(key, cin, cout, k=5):
    k1, k2 = jax.random.split(key)
    return {
        "depthwise": {"weight": fnn.kaiming_uniform(k1, (cin, 1, k, k), a=1.0),
                      "bias": jnp.zeros((cin,), jnp.float32)},
        "pointwise": {"weight": fnn.kaiming_uniform(k2, (cout, cin, 1, 1), a=1.0),
                      "bias": jnp.zeros((cout,), jnp.float32)},
        "gn": fnn.norm_init(cout),
    }


def _dwsep_apply(p, x, relu: bool):
    cin = x.shape[-1]
    x = fnn.conv2d(p["depthwise"], x, padding=2, groups=cin)
    x = fnn.conv2d(p["pointwise"], x, padding=0)
    x = fnn.group_norm(p["gn"], x, _gn_groups(x.shape[-1]))
    return jax.nn.relu(x) if relu else x


def mask_head_init(key, cfg: MaskHeadCfg):
    d = cfg.hidden_dim
    ks = jax.random.split(key, 9)
    return {
        "lay1": fnn.conv_init(ks[0], d, d, 3), "gn1": fnn.norm_init(d),
        "lay2": fnn.conv_init(ks[1], d, d, 3), "gn2": fnn.norm_init(d),
        "lay3": fnn.conv_init(ks[2], d, d, 3), "gn3": fnn.norm_init(d),
        "out_lay1": _dwsep_init(ks[3], d, d),
        "out_uplay": {"weight": fnn.kaiming_uniform(ks[4], (d, 1, 1, 1), a=1.0),
                      "bias": jnp.zeros((d,), jnp.float32)},
        "out_lay2": _dwsep_init(ks[5], d, cfg.num_gen_params),
        "adapter1": fnn.conv_init(ks[6], cfg.fpn_dims[0], d, 1),
        "adapter2": fnn.conv_init(ks[7], cfg.fpn_dims[1], d, 1),
    }


def mask_head_apply(params, cfg: MaskHeadCfg, x, fpns):
    """x: stride-32 (BT,H,W,C); fpns: [stride-16, stride-8] NHWC.
    Returns proto features (BT, 4H8, 4W8, M) at stride 4 (M = hidden//8)."""
    gelu = lambda v: jax.nn.gelu(v, approximate=False)
    x = gelu(fnn.group_norm(params["gn1"], fnn.conv2d(params["lay1"], x, padding=1), 8))

    cur = fnn.conv2d(params["adapter1"], fpns[0], padding=0)
    x = cur + _nearest_to(x, cur)
    x = gelu(fnn.group_norm(params["gn2"], fnn.conv2d(params["lay2"], x, padding=1), 8))

    cur = fnn.conv2d(params["adapter2"], fpns[1], padding=0)
    x = cur + _nearest_to(x, cur)
    x = gelu(fnn.group_norm(params["gn3"], fnn.conv2d(params["lay3"], x, padding=1), 8))

    # both separable convs carry ReLU (segmentation.py:26-31 pass activation=F.relu)
    x = _dwsep_apply(params["out_lay1"], x, relu=True)
    x = fnn.conv_transpose2d_up2(params["out_uplay"], x)
    x = _dwsep_apply(params["out_lay2"], x, relu=True)
    return x


def _nearest_to(x, target):
    """Nearest-upsample NHWC x to target's spatial size (torch F.interpolate nearest)."""
    xt = jnp.moveaxis(x, -1, 1)
    xt = interpolate_nearest(xt, (target.shape[1], target.shape[2]))
    return jnp.moveaxis(xt, 1, -1)
