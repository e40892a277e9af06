"""Activation-parity tests: our JAX modules vs the reference's pure-torch modules
(loaded read-only from /root/reference with the CUDA ext stubbed by a torch oracle).
Weights flow through our checkpoint converter, so these tests also validate the
torch->JAX name mapping used for the released checkpoints."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import os
REF_AVAILABLE = os.path.isdir("/root/reference/mdqe")
pytestmark = pytest.mark.skipif(not REF_AVAILABLE, reason="reference repo not mounted")

if REF_AVAILABLE:
    from ref_oracle import load_reference_models

from mdqe_cvpr2023_tpu.engine.checkpoint import convert_torch_state_dict
from mdqe_cvpr2023_tpu.models.attention import MSDeformAttnCfg, ms_deform_attn_module
from mdqe_cvpr2023_tpu.models.encoder import EncoderCfg, encoder_apply
from mdqe_cvpr2023_tpu.models.decoder import DecoderCfg, decoder_apply
from mdqe_cvpr2023_tpu.models.mask_head import MaskHeadCfg, mask_head_apply
from mdqe_cvpr2023_tpu.utils import nn as fnn

SHAPES = ((8, 8), (4, 4), (2, 2), (1, 1))
N = sum(h * w for h, w in SHAPES)


def to_params(module, prefix="detr.transformer_dec."):
    sd = {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}
    tree = convert_torch_state_dict(sd)
    for _ in prefix.rstrip(".").split("."):
        pass
    node = tree
    for seg in ["transformer_dec"] if "dec" in prefix else ["transformer_enc"]:
        node = node[seg]
    return node


@pytest.mark.parametrize("pred_offsets", [True, False])
def test_msdeform_attn_spatial_parity(pred_offsets):
    ref = load_reference_models()
    torch.manual_seed(0)
    dim, heads, P = 64, 4, 2
    mod = ref.MSDeformAttn(d_model=dim, n_levels=4, n_heads=heads, n_points=P,
                           n_frames=1, pred_offsets=pred_offsets, mode="spatial").eval()
    B, Q = 2, 5
    rng = np.random.default_rng(0)
    query = rng.standard_normal((B, Q, dim)).astype(np.float32)
    ref_boxes = np.concatenate([rng.uniform(0.2, 0.8, (B, Q, 2)),
                                rng.uniform(0.1, 0.4, (B, Q, 2))], -1).astype(np.float32)
    src = rng.standard_normal((B, N, dim)).astype(np.float32)
    ss = torch.as_tensor(SHAPES, dtype=torch.long)
    with torch.no_grad():
        expected = mod(torch.from_numpy(query), torch.from_numpy(ref_boxes),
                       torch.from_numpy(src), ss).numpy()

    sd = {"detr.transformer_dec.a." + k: v.detach().numpy()
          for k, v in mod.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]["a"]
    cfg = MSDeformAttnCfg(dim, 4, heads, P, 1, pred_offsets, "spatial")
    out = ms_deform_attn_module(params, cfg, jnp.asarray(query), jnp.asarray(ref_boxes),
                                jnp.asarray(src), SHAPES)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=2e-5)


def test_msdeform_attn_temporal_parity():
    ref = load_reference_models()
    torch.manual_seed(1)
    dim, heads, P, T = 64, 4, 2, 3
    mod = ref.MSDeformAttn(d_model=dim, n_levels=4, n_heads=heads, n_points=P,
                           n_frames=T, pred_offsets=False, mode="temporal").eval()
    B, Q = 1, 5
    rng = np.random.default_rng(1)
    query = rng.standard_normal((B, Q, dim)).astype(np.float32)
    ref_boxes = np.concatenate([rng.uniform(0.2, 0.8, (B, Q, 2)),
                                rng.uniform(0.1, 0.4, (B, Q, 2))], -1).astype(np.float32)
    src = rng.standard_normal((B, T, N, dim)).astype(np.float32)
    ss = torch.as_tensor(SHAPES, dtype=torch.long)
    with torch.no_grad():
        expected = mod(torch.from_numpy(query), torch.from_numpy(ref_boxes),
                       torch.from_numpy(src), ss).numpy()

    sd = {"detr.transformer_dec.a." + k: v.detach().numpy()
          for k, v in mod.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]["a"]
    cfg = MSDeformAttnCfg(dim, 4, heads, P, T, False, "temporal")
    out = ms_deform_attn_module(params, cfg, jnp.asarray(query), jnp.asarray(ref_boxes),
                                jnp.asarray(src), SHAPES)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=2e-5)


def _sine_pos(shapes, dim, BT):
    pos = []
    for (h, w) in shapes:
        nm = jnp.ones((BT, h, w))
        pos.append(np.asarray(fnn.position_embedding_sine(nm, dim // 2)))
    return pos


@pytest.mark.slow  # heaviest oracle test; spatial/decoder parity stays fast
def test_encoder_parity():
    ref = load_reference_models()
    torch.manual_seed(2)
    dim, heads = 64, 4
    enc = ref.Transformer_Enc(dim=dim, n_heads=heads, n_feature_levels=4,
                              n_enc_points=2, n_enc_layers=2, n_frames=1).eval()
    BT = 2
    rng = np.random.default_rng(2)
    srcs = [rng.standard_normal((BT, h, w, dim)).astype(np.float32) for h, w in SHAPES]
    masks = [np.zeros((BT, h, w), bool) for h, w in SHAPES]
    pos = _sine_pos(SHAPES, dim, BT)

    with torch.no_grad():
        t_srcs = [torch.from_numpy(np.moveaxis(s, -1, 1)).contiguous() for s in srcs]
        t_masks = [torch.from_numpy(m) for m in masks]
        t_pos = [torch.from_numpy(np.moveaxis(p, -1, 1)).contiguous() for p in pos]
        expected = enc(t_srcs, t_masks, t_pos, is_training=False).numpy()

    sd = {"detr.transformer_enc." + k: v.detach().numpy()
          for k, v in enc.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_enc"]
    cfg = EncoderCfg(dim, heads, 4, 2, 2)
    out = encoder_apply(params, cfg, [jnp.asarray(s) for s in srcs],
                        [jnp.asarray(m) for m in masks], [jnp.asarray(p) for p in pos])
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-5, rtol=5e-5)


def test_mask_head_parity():
    ref = load_reference_models()
    torch.manual_seed(3)
    dim = 256
    T = 2
    mh = ref.MaskHead(dim, [dim, dim], T, 5).eval()
    rng = np.random.default_rng(3)
    x32 = rng.standard_normal((T, 4, 4, dim)).astype(np.float32)
    x16 = rng.standard_normal((T, 8, 8, dim)).astype(np.float32)
    x8 = rng.standard_normal((T, 16, 16, dim)).astype(np.float32)
    with torch.no_grad():
        expected = mh(torch.from_numpy(np.moveaxis(x32, -1, 1)).contiguous(),
                      [torch.from_numpy(np.moveaxis(x16, -1, 1)).contiguous(),
                       torch.from_numpy(np.moveaxis(x8, -1, 1)).contiguous()]).numpy()
        # (1, M, T, H, W)

    sd = {"detr.transformer_dec.mask_head." + k: v.detach().numpy()
          for k, v in mh.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]["mask_head"]
    out = mask_head_apply(params, MaskHeadCfg(dim, (dim, dim)),
                          jnp.asarray(x32), [jnp.asarray(x16), jnp.asarray(x8)])
    got = np.moveaxis(np.asarray(out), -1, 0)[None]  # (1, M, T, H, W) — T leading in BT
    got = np.asarray(out).transpose(3, 0, 1, 2)[None]
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_decoder_parity_eval():
    ref = load_reference_models()
    torch.manual_seed(4)
    dim, heads, T, Q = 256, 8, 2, 16
    dec = ref.Transformer_Dec(num_classes=7, dim=dim, n_heads=heads, n_feature_levels=4,
                              n_frames=T, n_dec_points=2, n_dec_layers=2, mlp_ratio=4,
                              n_query=Q, fpn_dims=[dim, dim], dec_temporal=True,
                              clip_peak_matcher=None, window_inter_frame_asso=5,
                              query_embed_dim=8, is_coco=False, mask_on=True).eval()
    rng = np.random.default_rng(4)
    BT = T
    encoded = rng.standard_normal((BT, N, dim)).astype(np.float32)
    masks = np.zeros((BT, N), bool)
    ss = torch.as_tensor(SHAPES, dtype=torch.long)
    with torch.no_grad():
        expected = dec(torch.from_numpy(encoded), torch.from_numpy(masks), ss)

    sd = {"detr.transformer_dec." + k: v.detach().numpy()
          for k, v in dec.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]
    cfg = DecoderCfg(num_classes=7, dim=dim, n_heads=heads, n_levels=4, n_frames=T,
                     n_points=2, n_layers=2, n_query=Q, query_embed_dim=8,
                     window_inter_frame_asso=5, use_tca=True, mask_on=True)
    out = decoder_apply(params, cfg, jnp.asarray(encoded), jnp.asarray(masks), SHAPES,
                        n_frames=BT, training=False)
    np.testing.assert_allclose(np.asarray(out["cls"]), expected["cls"].numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mask_coeff"]),
                               expected["mask_coeff"].numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["query_embed"]),
                               expected["query_embed"].numpy(), atol=1e-4, rtol=1e-4)
