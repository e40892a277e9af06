"""Load the reference repo's pure-torch modules (read-only, at /root/reference) as a
test oracle, stubbing out its CUDA extension and torchvision with pure-torch shims.

This mirrors the reference's own oracle pattern (ops/test.py compares the CUDA kernel
against the pure-torch implementation); here the reference modules themselves are the
oracle for our JAX implementation. Used by tests only — never imported by the library.
"""
import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _install_msda_shim():
    """Fake `MultiScaleDeformableAttention` ext module: forward via pure torch
    (grid_sample per level), enough for eval-mode oracles."""
    import torch
    import torch.nn.functional as F

    def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                               sampling_locations, attention_weights, im2col_step):
        N, S, M, D = value.shape
        _, Lq, M_, L, P, _ = sampling_locations.shape
        out = value.new_zeros(N, Lq, M * D)
        grids = 2 * sampling_locations - 1
        acc = []
        for lid in range(L):
            H, W = int(spatial_shapes[lid, 0]), int(spatial_shapes[lid, 1])
            s0 = int(level_start_index[lid])
            v = value[:, s0:s0 + H * W].permute(0, 2, 3, 1).reshape(N * M, D, H, W)
            g = grids[:, :, :, lid].permute(0, 2, 1, 3, 4).reshape(N * M, Lq, P, 2)
            samp = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                 align_corners=False)  # (N*M, D, Lq, P)
            acc.append(samp)
        samp = torch.stack(acc, dim=-2)  # (N*M, D, Lq, L, P)
        w = attention_weights.permute(0, 2, 1, 3, 4).reshape(N * M, 1, Lq, L, P)
        out = (samp * w).sum((-1, -2))  # (N*M, D, Lq)
        return out.reshape(N, M, D, Lq).permute(0, 3, 1, 2).reshape(N, Lq, M * D)

    mod = types.ModuleType("MultiScaleDeformableAttention")
    mod.ms_deform_attn_forward = ms_deform_attn_forward
    sys.modules["MultiScaleDeformableAttention"] = mod


def _install_torchvision_shim():
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.interpolate = F.interpolate
    ops.misc = misc
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc


def _load_pkg(name, path, init_file=None):
    """Register a package without executing its real __init__ (unless given)."""
    spec = importlib.util.spec_from_file_location(
        name, init_file or path + "/__init__.py",
        submodule_search_locations=[path])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    if init_file is None:
        mod.__path__ = [path]
    else:
        spec.loader.exec_module(mod)
    return mod


def _load_mod(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_timm_d2_shims():
    """Minimal fakes for timm.models.layers and the detectron2 symbols the
    reference Swin backbone imports (eval-mode parity only)."""
    import torch.nn as nn

    if "timm" in sys.modules:
        return

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, std=0.02):
        return tensor.data.normal_(0, std)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers

    d2 = types.ModuleType("detectron2")
    modeling = types.ModuleType("detectron2.modeling")
    backbone_m = types.ModuleType("detectron2.modeling.backbone")
    build_m = types.ModuleType("detectron2.modeling.backbone.build")
    fpn_m = types.ModuleType("detectron2.modeling.backbone.fpn")
    layers_m = types.ModuleType("detectron2.layers")

    class Backbone(nn.Module):
        pass

    class _Registry:
        def register(self, *a, **k):
            def deco(f):
                return f
            return deco(a[0]) if a and callable(a[0]) else deco

    class ShapeSpec:
        def __init__(self, channels=None, stride=None, height=None, width=None):
            self.channels, self.stride = channels, stride

    backbone_m.Backbone = Backbone
    build_m.BACKBONE_REGISTRY = _Registry()
    fpn_m.FPN = object
    fpn_m.LastLevelMaxPool = object
    layers_m.ShapeSpec = ShapeSpec
    modeling.backbone = backbone_m
    d2.modeling = modeling
    sys.modules["detectron2"] = d2
    sys.modules["detectron2.modeling"] = modeling
    sys.modules["detectron2.modeling.backbone"] = backbone_m
    sys.modules["detectron2.modeling.backbone.build"] = build_m
    sys.modules["detectron2.modeling.backbone.fpn"] = fpn_m
    sys.modules["detectron2.layers"] = layers_m


def load_reference_swin():
    """Loads the reference SwinTransformerV2 class with shimmed deps."""
    if "swin" in _loaded:
        return _loaded["swin"]
    _install_timm_d2_shims()
    pkg = types.ModuleType("refmdqe.backbone")
    pkg.__path__ = [REF_ROOT + "/mdqe/backbone"]
    sys.modules.setdefault("refmdqe", types.ModuleType("refmdqe"))
    sys.modules["refmdqe"].__path__ = [REF_ROOT + "/mdqe"]
    sys.modules["refmdqe.backbone"] = pkg
    mod = _load_mod("refmdqe.backbone.swin_transformer_v2",
                    REF_ROOT + "/mdqe/backbone/swin_transformer_v2.py")
    _loaded["swin"] = mod.SwinTransformerV2
    return mod.SwinTransformerV2


_loaded = {}


def load_reference_models():
    """Returns a namespace with the reference torch modules:
    MSDeformAttn, Transformer_Enc, Transformer_Dec, MaskHead, misc, box_ops."""
    if _loaded:
        return _loaded["ns"]
    _install_msda_shim()
    _install_torchvision_shim()

    # bare packages (skip real __init__ which pulls in detectron2)
    for name, path in [
        ("refmdqe", REF_ROOT + "/mdqe"),
        ("refmdqe.models", REF_ROOT + "/mdqe/models"),
        ("refmdqe.models.ops", REF_ROOT + "/mdqe/models/ops"),
        ("refmdqe.util", REF_ROOT + "/mdqe/util"),
    ]:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg

    # real subpackages whose __init__ is safe
    _load_pkg("refmdqe.models.ops.functions", REF_ROOT + "/mdqe/models/ops/functions",
              REF_ROOT + "/mdqe/models/ops/functions/__init__.py")
    _load_pkg("refmdqe.models.ops.modules", REF_ROOT + "/mdqe/models/ops/modules",
              REF_ROOT + "/mdqe/models/ops/modules/__init__.py")

    _load_mod("refmdqe.util.misc", REF_ROOT + "/mdqe/util/misc.py")
    _load_mod("refmdqe.util.box_ops", REF_ROOT + "/mdqe/util/box_ops.py")
    _load_mod("refmdqe.models.misc", REF_ROOT + "/mdqe/models/misc.py")
    _load_mod("refmdqe.models.segmentation", REF_ROOT + "/mdqe/models/segmentation.py")
    enc = _load_mod("refmdqe.models.transformer_enc",
                    REF_ROOT + "/mdqe/models/transformer_enc.py")
    dec = _load_mod("refmdqe.models.transformer_dec",
                    REF_ROOT + "/mdqe/models/transformer_dec.py")

    ns = types.SimpleNamespace(
        MSDeformAttn=sys.modules["refmdqe.models.ops.modules"].MSDeformAttn,
        Transformer_Enc=enc.Transformer_Enc,
        Transformer_Dec=dec.Transformer_Dec,
        MaskHead=sys.modules["refmdqe.models.segmentation"].MaskHead,
        misc=sys.modules["refmdqe.models.misc"],
        util_misc=sys.modules["refmdqe.util.misc"],
    )
    _loaded["ns"] = ns
    return ns
