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

    def ms_deform_attn_backward(value, spatial_shapes, level_start_index,
                                sampling_locations, attention_weights,
                                grad_output, im2col_step):
        """Backward via autograd of the pure-torch forward (the real ext's
        col2im kernels, ms_deform_attn_cuda.cu:83-153) — lets gradients flow
        through the reference modules for gradient-parity oracles."""
        value = value.detach().requires_grad_(True)
        loc = sampling_locations.detach().requires_grad_(True)
        attw = attention_weights.detach().requires_grad_(True)
        with torch.enable_grad():
            out = ms_deform_attn_forward(value, spatial_shapes,
                                         level_start_index, loc, attw,
                                         im2col_step)
        return torch.autograd.grad(out, (value, loc, attw), grad_output)

    mod = types.ModuleType("MultiScaleDeformableAttention")
    mod.ms_deform_attn_forward = ms_deform_attn_forward
    mod.ms_deform_attn_backward = ms_deform_attn_backward
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


def load_reference_swin_v1():
    """Loads the reference (v1) SwinTransformer class with shimmed deps."""
    if "swin_v1" in _loaded:
        return _loaded["swin_v1"]
    _install_timm_d2_shims()
    pkg = types.ModuleType("refmdqe.backbone")
    pkg.__path__ = [REF_ROOT + "/mdqe/backbone"]
    sys.modules.setdefault("refmdqe", types.ModuleType("refmdqe"))
    sys.modules["refmdqe"].__path__ = [REF_ROOT + "/mdqe"]
    sys.modules["refmdqe.backbone"] = pkg
    mod = _load_mod("refmdqe.backbone.swin_transformer",
                    REF_ROOT + "/mdqe/backbone/swin_transformer.py")
    _loaded["swin_v1"] = mod.SwinTransformer
    return mod.SwinTransformer


_loaded = {}


def _ensure_module(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def _install_d2_runtime_shims():
    """Minimal detectron2 runtime for the reference's ASSEMBLED pipeline
    (mdqe/mdqe.py + tracking/OverTracker.py): structures (ImageList, Instances,
    Boxes, BitMasks), META_ARCH_REGISTRY, build_backbone (fed by
    set_backbone_state), retry_if_cuda_oom, and PointRend's grid sampler
    (faithful reimplementation of point_features.py)."""
    import torch

    if getattr(sys.modules.get("detectron2.structures"), "_mdqe_shim", False):
        return

    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = image_size
            self._fields = {}
            for k, v in kwargs.items():
                self.set(k, v)

        @property
        def image_size(self):
            return self._image_size

        def __setattr__(self, name, val):
            if name.startswith("_"):
                super().__setattr__(name, val)
            else:
                self.set(name, val)

        def __getattr__(self, name):
            if name.startswith("_") or name not in self._fields:
                raise AttributeError(name)
            return self._fields[name]

        def set(self, name, value):
            self._fields[name] = value

        def has(self, name):
            return name in self._fields

        def to(self, device):
            out = Instances(self._image_size)
            for k, v in self._fields.items():
                out.set(k, v.to(device) if hasattr(v, "to") else v)
            return out

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

        def __getitem__(self, item):
            out = Instances(self._image_size)
            for k, v in self._fields.items():
                out.set(k, v[item])
            return out

    class ImageList:
        def __init__(self, tensor, image_sizes):
            self.tensor = tensor
            self.image_sizes = image_sizes

        @staticmethod
        def from_tensors(tensors, size_divisibility=0):
            image_sizes = [(int(t.shape[-2]), int(t.shape[-1]))
                           for t in tensors]
            mh = max(s[0] for s in image_sizes)
            mw = max(s[1] for s in image_sizes)
            if size_divisibility > 0:
                d = size_divisibility
                mh = (mh + d - 1) // d * d
                mw = (mw + d - 1) // d * d
            batch = tensors[0].new_zeros(len(tensors), tensors[0].shape[0],
                                         mh, mw)
            for i, t in enumerate(tensors):
                batch[i, :, :t.shape[-2], :t.shape[-1]] = t
            return ImageList(batch, image_sizes)

        def __len__(self):
            return len(self.image_sizes)

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

        def get_bounding_boxes(self):
            n, h, w = self.tensor.shape
            boxes = torch.zeros(n, 4, dtype=torch.float32)
            for i in range(n):
                ys, xs = torch.nonzero(self.tensor[i], as_tuple=True)
                if len(ys) > 0:
                    boxes[i] = torch.as_tensor(
                        [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                        dtype=torch.float32)
            return Boxes(boxes)

    structures = _ensure_module("detectron2.structures")
    structures.Instances = Instances
    structures.ImageList = ImageList
    structures.Boxes = Boxes
    structures.BitMasks = BitMasks
    structures._mdqe_shim = True

    d2 = _ensure_module("detectron2")
    d2.structures = structures

    class _Registry:
        def register(self, *a, **k):
            def deco(f):
                return f
            return deco(a[0]) if a and callable(a[0]) else deco

    _backbone_state = {}

    def set_backbone_state(state):
        """state: dict of D2-named R50 tensors (numpy), e.g. 'stem.conv1.weight'."""
        _backbone_state.clear()
        _backbone_state.update({k: torch.from_numpy(v) for k, v in state.items()})

    class _ShapeSpec:
        def __init__(self, channels, stride):
            self.channels, self.stride = channels, stride

    class FakeD2ResNet50(torch.nn.Module):
        """Functional D2-convention R50 (FrozenBN eval math, stride_in_1x1=False)
        over the tensors installed via set_backbone_state. Weights deliberately
        NOT registered: the oracle's state dict for the converter is assembled
        from the same raw dict."""

        BLOCKS = {"res2": (3, 1), "res3": (4, 2), "res4": (6, 2), "res5": (3, 2)}

        def output_shape(self):
            return {"res3": _ShapeSpec(512, 8), "res4": _ShapeSpec(1024, 16),
                    "res5": _ShapeSpec(2048, 32)}

        def _conv_bn(self, name, x, stride=1, padding=0, eps=1e-5):
            import torch.nn.functional as F
            st = _backbone_state
            y = F.conv2d(x, st[name + ".weight"], stride=stride, padding=padding)
            w = st[name + ".norm.weight"]
            b = st[name + ".norm.bias"]
            m = st[name + ".norm.running_mean"]
            v = st[name + ".norm.running_var"]
            scale = w / torch.sqrt(v + eps)
            return (y * scale[None, :, None, None]
                    + (b - m * scale)[None, :, None, None])

        def forward(self, x):
            import torch.nn.functional as F
            y = F.relu(self._conv_bn("stem.conv1", x, stride=2, padding=3))
            y = F.max_pool2d(y, kernel_size=3, stride=2, padding=1)
            feats = {}
            for stage, (n, stride) in self.BLOCKS.items():
                for i in range(n):
                    s = stride if i == 0 else 1
                    sc = (self._conv_bn(f"{stage}.{i}.shortcut", y, stride=s)
                          if i == 0 else y)
                    h = F.relu(self._conv_bn(f"{stage}.{i}.conv1", y))
                    h = F.relu(self._conv_bn(f"{stage}.{i}.conv2", h, stride=s,
                                             padding=1))
                    h = self._conv_bn(f"{stage}.{i}.conv3", h)
                    y = F.relu(h + sc)
                if stage != "res2":
                    feats[stage] = y
            return feats

    modeling = _ensure_module("detectron2.modeling")
    modeling.META_ARCH_REGISTRY = _Registry()
    modeling.build_backbone = lambda cfg: FakeD2ResNet50()
    d2.modeling = modeling

    memory_m = _ensure_module("detectron2.utils.memory")
    memory_m.retry_if_cuda_oom = lambda fn: fn
    utils_m = _ensure_module("detectron2.utils")
    utils_m.memory = memory_m
    d2.utils = utils_m

    def get_uncertain_point_coords_on_grid(uncertainty_map, num_points):
        """PointRend point_features.py: top-k uncertainty points on the HxW
        grid, returned as (indices, normalized xy coords at pixel centers)."""
        R, _, H, W = uncertainty_map.shape
        h_step, w_step = 1.0 / H, 1.0 / W
        num_points = min(H * W, num_points)
        point_indices = torch.topk(uncertainty_map.view(R, H * W),
                                   k=num_points, dim=1)[1]
        point_coords = torch.zeros(R, num_points, 2, dtype=torch.float,
                                   device=uncertainty_map.device)
        point_coords[:, :, 0] = w_step / 2.0 + (point_indices % W).float() * w_step
        point_coords[:, :, 1] = h_step / 2.0 + (point_indices // W).float() * h_step
        return point_indices, point_coords

    pf = _ensure_module("detectron2.projects.point_rend.point_features")
    pf.get_uncertain_point_coords_on_grid = get_uncertain_point_coords_on_grid
    pr = _ensure_module("detectron2.projects.point_rend")
    pr.point_features = pf
    projects = _ensure_module("detectron2.projects")
    projects.point_rend = pr
    d2.projects = projects

    # mdqe/models/backbone.py imports torchvision.models._utils (vestigial path)
    tvm = _ensure_module("torchvision.models")
    tvmu = _ensure_module("torchvision.models._utils")

    class IntermediateLayerGetter:  # never instantiated by the oracle
        def __init__(self, *a, **k):
            raise NotImplementedError

    tvmu.IntermediateLayerGetter = IntermediateLayerGetter
    tvm._utils = tvmu
    if "torchvision" in sys.modules:
        sys.modules["torchvision"].models = tvm

    _loaded["set_backbone_state"] = set_backbone_state


def load_reference_full():
    """Loads the reference's full MDQE meta-architecture + OverTracker with all
    runtime shims installed. Returns a namespace:
    MDQE (class), OverTracker, Clips, set_backbone_state(state_dict)."""
    if "full" in _loaded:
        return _loaded["full"]
    ns_models = load_reference_models()
    _install_d2_runtime_shims()

    models_pkg = sys.modules["refmdqe.models"]
    inner = _load_mod("refmdqe.models.mdqe", REF_ROOT + "/mdqe/models/mdqe.py")
    matcher = _load_mod("refmdqe.models.matcher",
                        REF_ROOT + "/mdqe/models/matcher.py")
    criterion = _load_mod("refmdqe.models.criterion",
                          REF_ROOT + "/mdqe/models/criterion.py")
    backbone = _load_mod("refmdqe.models.backbone",
                         REF_ROOT + "/mdqe/models/backbone.py")
    posenc = _load_mod("refmdqe.models.position_encoding",
                       REF_ROOT + "/mdqe/models/position_encoding.py")
    # `from .models import mdqe, SetCriterion, ...` resolves via pkg attributes
    models_pkg.mdqe = inner.mdqe
    models_pkg.SetCriterion = criterion.SetCriterion
    models_pkg.HungarianMatcher = matcher.HungarianMatcher
    models_pkg.ClipPeakMatcher = matcher.ClipPeakMatcher
    models_pkg.Transformer_Enc = ns_models.Transformer_Enc
    models_pkg.Transformer_Dec = ns_models.Transformer_Dec
    models_pkg.backbone = backbone
    models_pkg.position_encoding = posenc

    tracking_pkg = types.ModuleType("refmdqe.tracking")
    tracking_pkg.__path__ = [REF_ROOT + "/mdqe/tracking"]
    sys.modules["refmdqe.tracking"] = tracking_pkg
    overtracker = _load_mod("refmdqe.tracking.OverTracker",
                            REF_ROOT + "/mdqe/tracking/OverTracker.py")
    tracking_pkg.Clips = overtracker.Clips
    tracking_pkg.OverTracker = overtracker.OverTracker

    meta = _load_mod("refmdqe.mdqe", REF_ROOT + "/mdqe/mdqe.py")
    full = types.SimpleNamespace(
        MDQE=meta.MDQE,
        OverTracker=overtracker.OverTracker,
        Clips=overtracker.Clips,
        HungarianMatcher=matcher.HungarianMatcher,
        ClipPeakMatcher=matcher.ClipPeakMatcher,
        SetCriterion=criterion.SetCriterion,
        set_backbone_state=_loaded["set_backbone_state"],
    )
    _loaded["full"] = full
    return full


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
