"""Checkpoint conversion: released Detectron2/torch .pth state dicts -> nested JAX
param pytrees.

The param tree mirrors the torch module names (SURVEY.md §7: `detr.transformer_enc.*`,
`detr.transformer_dec.*`, `detr.backbone.0.backbone.*`, `detr.input_proj.*`), and leaf
shapes follow torch conventions, so conversion is a pure name re-nesting with no tensor
surgery. Also implements temporal weight inflation (reference
convert_inflated_weights.py:39-81) for PRETRAIN_FRAME_NUM != SAMPLING_FRAME_NUM.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np
import jax.numpy as jnp

# torch module-path prefixes -> our param tree roots
_PREFIX_MAP = [
    ("detr.backbone.0.backbone.", ("backbone",)),
    ("detr.input_proj.", ("input_proj",)),
    ("detr.transformer_enc.", ("transformer_enc",)),
    ("detr.transformer_dec.", ("transformer_dec",)),
]

# buffers that are recomputed statically and never loaded
_SKIP = (
    "query_relpos_grid",
    "pixel_mean",
    "pixel_std",
    "criterion.",
    # Swin window-attention index/coordinate buffers (recomputed from shapes)
    "relative_position_index",
    "relative_coords_table",
)


def _assign(tree: dict, path, value):
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def _listify(node):
    """Convert dicts whose keys are all digit strings into lists (module lists)."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(re.fullmatch(r"\d+", k) for k in out) \
            and sorted(int(k) for k in out) == list(range(len(out))):
        return [out[str(i)] for i in range(len(out))]
    return out  # non-contiguous indices (e.g. Sequential with param-free layers)


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"], dtype=jnp.float32):
    """Flat torch state dict (tensor or ndarray values) -> nested param pytree.

    Handles: input_proj Sequential indices (0->conv, 1->gn), MSDeformAttn offset
    buffers (raw-array leaves), and skips recomputed buffers.
    """
    tree: dict = {}
    for name, tensor in state_dict.items():
        if any(s in name for s in _SKIP):
            continue
        arr = np.asarray(tensor)
        path = None
        for prefix, root in _PREFIX_MAP:
            if name.startswith(prefix):
                rest = name[len(prefix):].split(".")
                if root == ("input_proj",):
                    # detr.input_proj.{i}.{0|1}.{weight|bias}
                    idx, seq, leaf = rest
                    sub = "conv" if seq == "0" else "gn"
                    path = ("input_proj", idx, sub, leaf)
                else:
                    path = root + tuple(rest)
                break
        if path is None:
            # unknown key (e.g. D2 engine extras); ignore silently
            continue
        leaf_dtype = dtype if np.issubdtype(arr.dtype, np.floating) else arr.dtype
        _assign(tree, path, jnp.asarray(arr, leaf_dtype))
    return _listify(tree)


def inflate_temporal_weights(state_dict: Dict[str, np.ndarray], f_pretrain: int,
                             f_target: int, n_heads: int = 8,
                             n_points: int = 4) -> Dict[str, np.ndarray]:
    """Inflate temporal deform-attn weights from f_pretrain to f_target frames
    (behavioral spec: reference convert_inflated_weights.py:39-81). The temporal
    attention treats frames as levels, so the frame axis inside the flattened
    (H, F, K, D) head layout is tiled T times and sliced to f_target. Applies to
    `temp_attn_inst.{attention_weights,sampling_grid_offsets}` linear weight/bias,
    the `sampling_offsets` grid buffer, `lvl_spatial_scales`, and `temp_embed`."""
    if f_pretrain == f_target:
        return dict(state_dict)
    T = max((f_target + 1) // f_pretrain, 1)
    out = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor)
        parts = name.split(".")
        if "temp_attn" in name:
            if parts[-2] in {"attention_weights", "sampling_grid_offsets"}:
                # layout (H, F, K, D[, C]); tile F axis T times, slice to f_target
                d = arr.shape[0] // (n_heads * f_pretrain * n_points)
                rest = arr.shape[1:]
                v = arr.reshape(n_heads, f_pretrain, n_points, d, *rest)
                v = np.repeat(v, T, axis=1)[:, :f_target]
                arr = v.reshape(n_heads * f_target * n_points * d, *rest)
            elif parts[-1] == "sampling_offsets":
                # buffer (1, 1, H, F, K, 2): tile the frame axis (axis 3)
                arr = np.repeat(arr, T, axis=3)[:, :, :, :f_target]
            elif parts[-1] == "lvl_spatial_scales" and parts[-2] == "temp_attn_inst":
                arr = np.repeat(arr, T, axis=0)[:f_target]
        if "temp_embed" in name:
            arr = np.repeat(arr, T, axis=0)[:f_target]
        out[name] = arr
    return out


def load_torch_checkpoint(path: str, dtype=jnp.float32, f_pretrain: int | None = None,
                          f_target: int | None = None):
    """Load a released .pth checkpoint into a nested JAX param tree.

    Requires torch (CPU) for unpickling. Applies temporal inflation when
    f_pretrain != f_target (reference train_net.py:249-254)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}
    if f_pretrain is not None and f_target is not None and f_pretrain != f_target:
        state = inflate_temporal_weights(state, f_pretrain, f_target)
    return convert_torch_state_dict(state, dtype)
