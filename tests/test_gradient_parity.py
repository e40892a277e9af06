"""Gradient-level parity vs the torch reference (VERDICT r3 weak #6).

Loss *values* matching (test_criterion_parity.py) can hide VJP bugs — a
misplaced stop_gradient around the dynamic-k assignment or a wrong adjoint in
the matmul-form losses would pass every value test and only surface as degraded
final AP. Here we compare gradients directly, torch autograd vs jax.grad, on
identical inputs/weights:

  - criterion: d(each hungarian loss term)/d(cls, boxes, mask_coeff, proto),
    interinst repulsion on and off
    (/root/reference/mdqe/models/criterion.py:381-473)
  - encoder / MSDeformAttn / mask head / decoder: d(sum(out * R))/d(params),
    with torch param grads mapped through the SAME checkpoint converter used
    for values, so the comparison is leaf-aligned with our param tree
    (/root/reference/mdqe/models/transformer_enc.py, transformer_dec.py,
    segmentation.py; MSDA backward via autograd of the pure-torch oracle,
    standing in for ms_deform_attn_cuda.cu:83-153)
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_AVAILABLE = os.path.isdir("/root/reference/mdqe")
pytestmark = [pytest.mark.skipif(not REF_AVAILABLE,
                                 reason="reference repo not mounted"),
              pytest.mark.slow]

if REF_AVAILABLE:
    from ref_oracle import load_reference_full, load_reference_models
    from test_criterion_parity import (_our_cfg, _rand_outputs, _rand_targets,
                                       _ref_modules, B, Q, K, M, H4, W4)

from mdqe_cvpr2023_tpu.engine.checkpoint import convert_torch_state_dict
from mdqe_cvpr2023_tpu.losses.criterion import _hungarian_layer_losses
from mdqe_cvpr2023_tpu.models.attention import MSDeformAttnCfg, ms_deform_attn_module
from mdqe_cvpr2023_tpu.models.encoder import EncoderCfg, encoder_apply
from mdqe_cvpr2023_tpu.models.mask_head import MaskHeadCfg, mask_head_apply
from mdqe_cvpr2023_tpu.utils import nn as fnn

SHAPES = ((8, 8), (4, 4), (2, 2), (1, 1))
N_TOK = sum(h * w for h, w in SHAPES)


def _assert_grad_close(got, exp, name, tol=2e-4):
    got, exp = np.asarray(got, np.float64), np.asarray(exp, np.float64)
    scale = max(np.abs(exp).max(), 1e-6)
    err = np.abs(got - exp).max()
    assert err <= tol * (1.0 + scale), \
        f"{name}: grad err {err:.3e} vs scale {scale:.3e}"


def _compare_grad_trees(ours, ref_tree, prefix="", tol=2e-4):
    """Leaf-by-leaf comparison of two aligned pytrees of gradients. Integer
    leaves (buffers like lvl_spatial_scales) carry float0 grads — skipped."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_r = jax.tree_util.tree_leaves(ref_tree)
    assert len(flat_o) == len(flat_r)
    n_checked = 0
    for (kp, g_o), g_r in zip(flat_o, flat_r):
        if not np.issubdtype(np.asarray(g_o).dtype, np.inexact):
            continue
        _assert_grad_close(g_o, g_r, prefix + jax.tree_util.keystr(kp), tol)
        n_checked += 1
    assert n_checked > 0


# ---------------------------------------------------------------------------
# criterion: d loss_k / d (cls, boxes, coeff, proto)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("interinst", [False, True])
def test_criterion_gradient_parity(interinst):
    T = 2
    rng = np.random.default_rng(7)
    cls, boxes, coeff, proto = _rand_outputs(rng, T)
    ref_targets, our_targets = _rand_targets(rng, T)
    matcher, criterion = _ref_modules(interinst, T)
    cfg = _our_cfg(interinst, T)

    # ---- torch: differentiable forward, matcher under its own no_grad ----
    t_in = {
        "cls": torch.tensor(cls, requires_grad=True),
        "boxes": torch.tensor(boxes, requires_grad=True),
        "mask_coeff": torch.tensor(coeff, requires_grad=True),
        "proto": torch.tensor(np.moveaxis(proto, -1, 1), requires_grad=True),
    }
    indices = matcher(t_in, ref_targets)
    num_masks = float(max(sum(len(i) for (_, i) in indices), 1))
    ref_losses = criterion.get_loss(t_in, ref_targets, indices, num_masks)

    leaves = ("cls", "boxes", "mask_coeff", "proto")
    ref_grads = {}
    for k, v in ref_losses.items():
        gs = torch.autograd.grad(v, [t_in[n] for n in leaves],
                                 retain_graph=True, allow_unused=True)
        ref_grads[k] = {n: (np.zeros_like(t_in[n].detach().numpy())
                            if g is None else g.numpy())
                        for n, g in zip(leaves, gs)}

    # ---- jax ----
    tgt = {k: jnp.asarray(v) for k, v in our_targets.items()}

    def loss_k(key):
        def f(c, bx, cf, pr):
            ld = _hungarian_layer_losses(cfg, c, bx, cf, pr, tgt)
            return ld[key]
        return f

    for key, ref_key in [("loss_cls", "loss_cls"), ("loss_bbox", "loss_bbox"),
                         ("loss_giou", "loss_giou"), ("loss_mask", "loss_mask"),
                         ("loss_dice", "loss_dice")]:
        if ref_key not in ref_grads:
            continue
        g = jax.grad(loss_k(key), argnums=(0, 1, 2, 3))(
            jnp.asarray(cls), jnp.asarray(boxes), jnp.asarray(coeff),
            jnp.asarray(proto))
        rg = ref_grads[ref_key]
        _assert_grad_close(g[0], rg["cls"], f"{key}/cls")
        _assert_grad_close(g[1], rg["boxes"], f"{key}/boxes")
        _assert_grad_close(g[2], rg["mask_coeff"], f"{key}/coeff")
        # ours is (B,T,h,w,M); torch proto grad is (B,M,T,h,w)
        _assert_grad_close(np.moveaxis(np.asarray(g[3]), -1, 1), rg["proto"],
                           f"{key}/proto")


# ---------------------------------------------------------------------------
# modules: d(sum(out * R)) / d params, torch grads mapped via the converter
# ---------------------------------------------------------------------------

def _randomize_offset_weights(module):
    """The reference zero-inits sampling_offsets weights (deformable-DETR
    _reset_parameters), which makes every query sample EXACTLY on bilinear-kink
    knots (pixel-center reference points + the rational rotational-grid bias).
    At a kink the left/right derivatives differ by O(1) and the two
    implementations unnormalize coordinates differently in fp32 — ours computes
    loc*W - 0.5 like the reference CUDA kernel (ms_deform_im2col_cuda.cuh:262),
    the torch-shim oracle's grid_sample computes ((2*loc)*W - 1)/2 — so they can
    round to opposite kink sides and pick different (both valid) subgradients.
    Randomizing the offset weights moves sampling points off the measure-zero
    knot set so gradients are well-defined and comparable."""
    import torch as _t
    with _t.no_grad():
        for name, p in module.named_parameters():
            if "sampling_offsets" in name and name.endswith("weight"):
                p.normal_(0.0, 0.05)


def _torch_param_grads(module, prefix):
    # remove_duplicate=False: shared submodules (Transformer_Dec holds
    # bbox_embed both directly and inside DecoderDefAttn) must appear under
    # every state_dict alias so the converted tree is leaf-aligned with params
    sd = {}
    for name, p in module.named_parameters(remove_duplicate=False):
        g = p.grad
        sd[prefix + name] = (np.zeros(p.shape, np.float32) if g is None
                             else g.detach().numpy())
    # converter also expects buffers (sampling_offsets grids etc.) — zeros
    for name, b in module.named_buffers(remove_duplicate=False):
        key = prefix + name
        if key not in sd:
            sd[key] = np.zeros(b.shape, np.float32)
    return sd


def test_msdeform_attn_gradient_parity():
    ref = load_reference_models()
    torch.manual_seed(0)
    dim, heads, P = 64, 4, 2
    mod = ref.MSDeformAttn(d_model=dim, n_levels=4, n_heads=heads, n_points=P,
                           n_frames=1, pred_offsets=True, mode="spatial").eval()
    _randomize_offset_weights(mod)
    Bq, Qq = 2, 5
    rng = np.random.default_rng(0)
    query = rng.standard_normal((Bq, Qq, dim)).astype(np.float32)
    ref_boxes = np.concatenate([rng.uniform(0.2, 0.8, (Bq, Qq, 2)),
                                rng.uniform(0.1, 0.4, (Bq, Qq, 2))],
                               -1).astype(np.float32)
    src = rng.standard_normal((Bq, N_TOK, dim)).astype(np.float32)
    R = rng.standard_normal((Bq, Qq, dim)).astype(np.float32)
    ss = torch.as_tensor(SHAPES, dtype=torch.long)

    out_t = mod(torch.from_numpy(query), torch.from_numpy(ref_boxes),
                torch.from_numpy(src), ss)
    (out_t * torch.from_numpy(R)).sum().backward()
    gsd = _torch_param_grads(mod, "detr.transformer_dec.a.")
    ref_gtree = convert_torch_state_dict(gsd)["transformer_dec"]["a"]

    sd = {"detr.transformer_dec.a." + k: v.detach().numpy()
          for k, v in mod.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]["a"]
    cfg = MSDeformAttnCfg(dim, 4, heads, P, 1, True, "spatial")

    def scalar(p):
        out = ms_deform_attn_module(p, cfg, jnp.asarray(query),
                                    jnp.asarray(ref_boxes), jnp.asarray(src),
                                    SHAPES)
        return (out * jnp.asarray(R)).sum()

    g = jax.grad(scalar, allow_int=True)(params)
    _compare_grad_trees(g, ref_gtree, "msda.")


def test_encoder_gradient_parity():
    ref = load_reference_models()
    torch.manual_seed(2)
    dim, heads = 64, 4
    enc = ref.Transformer_Enc(dim=dim, n_heads=heads, n_feature_levels=4,
                              n_enc_points=2, n_enc_layers=2, n_frames=1).eval()
    _randomize_offset_weights(enc)
    BT = 2
    rng = np.random.default_rng(2)
    srcs = [rng.standard_normal((BT, h, w, dim)).astype(np.float32)
            for h, w in SHAPES]
    masks = [np.zeros((BT, h, w), bool) for h, w in SHAPES]
    pos = [np.asarray(fnn.position_embedding_sine(jnp.ones((BT, h, w)), dim // 2))
           for h, w in SHAPES]
    R = rng.standard_normal((BT, N_TOK, dim)).astype(np.float32)

    t_srcs = [torch.from_numpy(np.moveaxis(s, -1, 1)).contiguous() for s in srcs]
    t_masks = [torch.from_numpy(m) for m in masks]
    t_pos = [torch.from_numpy(np.moveaxis(p, -1, 1)).contiguous() for p in pos]
    out_t = enc(t_srcs, t_masks, t_pos, is_training=False)
    (out_t * torch.from_numpy(R)).sum().backward()
    gsd = _torch_param_grads(enc, "detr.transformer_enc.")
    ref_gtree = convert_torch_state_dict(gsd)["transformer_enc"]

    sd = {"detr.transformer_enc." + k: v.detach().numpy()
          for k, v in enc.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_enc"]
    cfg = EncoderCfg(dim, heads, 4, 2, 2)

    def scalar(p):
        out = encoder_apply(p, cfg, [jnp.asarray(s) for s in srcs],
                            [jnp.asarray(m) for m in masks],
                            [jnp.asarray(x) for x in pos])
        return (out * jnp.asarray(R)).sum()

    g = jax.grad(scalar, allow_int=True)(params)
    _compare_grad_trees(g, ref_gtree, "enc.")


def test_decoder_gradient_parity():
    """d(sum over ALL intermediate layers of out*R)/d(params) through
    decoder_loop vs torch autograd through the reference DecoderDefAttn in
    TRAINING mode (module.train(), drop=0 so it stays deterministic).

    This specifically pins the detach semantics of iterative box refinement —
    the reference detaches reference points between refinement layers
    (/root/reference/mdqe/models/transformer_dec.py:468,494) while the
    positional projection flows gradient through the UNdetached boxes
    (:469,495), and clip reference boxes are built from the detached frame
    boxes (:497-503). A missing/extra stop_gradient in decoder_loop passes
    every activation test and only shows up as degraded trained AP."""
    from mdqe_cvpr2023_tpu.models.decoder import DecoderCfg, decoder_loop

    ref = load_reference_models()
    torch.manual_seed(5)
    # dim must be ≥256-ish: MaskHead's num_gen_params = dim//8 feeds a
    # GroupNorm(32-or-24) inside DepthwiseSeparableConv2d (segmentation.py:103)
    dim, heads, T, Q, L = 256, 8, 2, 9, 2
    dec = ref.Transformer_Dec(num_classes=7, dim=dim, n_heads=heads,
                              n_feature_levels=4, n_frames=T, n_dec_points=2,
                              n_dec_layers=L, mlp_ratio=4, n_query=Q,
                              fpn_dims=[dim, dim], dec_temporal=True,
                              clip_peak_matcher=None, window_inter_frame_asso=3,
                              query_embed_dim=8, is_coco=False, mask_on=True)
    dec.train()  # DecoderDefAttn reads self.training for the B/T split
    # the fixed-grid scheme's correction linear (sampling_grid_offsets) is
    # zero-initialized; randomize it so its weight grads are exercised and the
    # clamp path (ms_deform_attn.py:149-153) is off its boundary knots
    with torch.no_grad():
        for name, p in dec.named_parameters():
            if "sampling_grid_offsets" in name and name.endswith("weight"):
                p.normal_(0.0, 0.02)

    B = 2
    BT = B * T
    rng = np.random.default_rng(5)
    query = rng.standard_normal((BT, Q, dim)).astype(np.float32)
    ref_pts = rng.uniform(0.2, 0.8, (BT, Q, 2)).astype(np.float32)
    encoded = rng.standard_normal((BT, N_TOK, dim)).astype(np.float32)
    masks = np.zeros((BT, N_TOK), bool)
    R_x = rng.standard_normal((L + 1, BT, Q, dim)).astype(np.float32)
    R_inst = rng.standard_normal((L + 1, B, Q, dim)).astype(np.float32)
    R_box = rng.standard_normal((L + 1, BT, Q, 4)).astype(np.float32)
    ss = torch.as_tensor(SHAPES, dtype=torch.long)

    inter, inter_inst, inter_boxes = dec.decoder(
        torch.from_numpy(query), torch.from_numpy(ref_pts),
        torch.from_numpy(encoded), ss, torch.from_numpy(masks))
    loss_t = ((inter * torch.from_numpy(R_x)).sum()
              + (inter_inst * torch.from_numpy(R_inst)).sum()
              + (inter_boxes * torch.from_numpy(R_box)).sum())
    loss_t.backward()
    gsd = _torch_param_grads(dec, "detr.transformer_dec.")
    ref_gtree = convert_torch_state_dict(gsd)["transformer_dec"]

    sd = {"detr.transformer_dec." + k: v.detach().numpy()
          for k, v in dec.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]
    cfg = DecoderCfg(num_classes=7, dim=dim, n_heads=heads, n_levels=4,
                     n_frames=T, n_points=2, n_layers=L, n_query=Q,
                     query_embed_dim=8, window_inter_frame_asso=3,
                     use_tca=True, mask_on=True)

    # sanity: values must already agree, or the grad comparison is meaningless
    vx, vi, vb = decoder_loop(params, cfg, jnp.asarray(query),
                              jnp.asarray(ref_pts), jnp.asarray(encoded),
                              SHAPES, jnp.asarray(masks), T)
    np.testing.assert_allclose(np.asarray(vx), inter.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vb), inter_boxes.detach().numpy(),
                               atol=1e-4, rtol=1e-4)

    def scalar(p):
        ix, ii, ib = decoder_loop(p, cfg, jnp.asarray(query),
                                  jnp.asarray(ref_pts), jnp.asarray(encoded),
                                  SHAPES, jnp.asarray(masks), T)
        return ((ix * jnp.asarray(R_x)).sum()
                + (ii * jnp.asarray(R_inst)).sum()
                + (ib * jnp.asarray(R_box)).sum())

    g = jax.grad(scalar, allow_int=True)(params)
    # bbox_embed / decoder_norm / point2pos_proj are SHARED torch modules:
    # the state dict (hence our converted tree) aliases them under both the
    # top level and decoder.*, but torch autograd accumulates one total grad
    # reported under every alias. Our decoder_loop reads only the top-level
    # copy, so fold its grad into the (zero) alias before comparing.
    for ours, alias in (("bbox_embed", "bbox_embed"), ("decoder_norm", "norm"),
                        ("point2pos_proj", "point2pos_proj")):
        g["decoder"][alias] = jax.tree.map(
            lambda a, b: a + b, g["decoder"][alias], g[ours])
    _compare_grad_trees(g, ref_gtree, "dec.", tol=5e-4)


def test_reid_loss_gradient_parity_exhaustive_regime():
    """d(ctt)/d(embeds) and d(aux)/d(embeds) through `_reid_loss_video` vs
    torch autograd through the reference `loss_reid_query_init`
    (/root/reference/mdqe/models/criterion.py:540-602), on the exhaustive-
    sampling-regime inputs of test_criterion_parity.py::
    test_reid_loss_parity_exhaustive_regime — per instance the candidate pool
    is smaller than both dynamic-k caps, so the reference's randperm and our
    masked-top-k select the SAME sets and gradients are comparable. The
    masked-top-k + jnp.where selection chain is a classic silent-NaN /
    wrong-adjoint site that value parity cannot see."""
    from mdqe_cvpr2023_tpu.losses import CriterionCfg
    from mdqe_cvpr2023_tpu.losses.criterion import _reid_loss_video
    from mdqe_cvpr2023_tpu.models.decoder import query_relpos_grid

    nb, T, E, window = 4, 2, 8, 2
    Qn = nb * nb
    rng = np.random.default_rng(0)
    q_ids = np.full((T, Qn), -1, np.int64)
    q_ids[0, 1] = 0; q_ids[0, 2] = 0
    q_ids[0, 9] = 1; q_ids[1, 9] = 1
    q_ids[1, 4] = 2
    q_ids[0, 14] = 1
    embeds = rng.standard_normal((T, Qn, E)).astype(np.float32) * 0.5

    from test_criterion_parity import _ref_modules
    _, criterion = _ref_modules(False, T)
    criterion.n_queries = Qn
    criterion.n_query_bins = nb
    i, j = torch.meshgrid(torch.arange(nb), torch.arange(nb))
    idxg = torch.stack([j, i], dim=-1).view(-1, 2)
    criterion.query_relpos_grid = (idxg[:, None] - idxg[None]).abs()
    criterion.window_inter_frame_asso = window

    emb_t = torch.tensor(embeds[None], requires_grad=True)
    ref_ctt, ref_aux = criterion.loss_reid_query_init(
        emb_t, torch.from_numpy(q_ids)[None])
    g_ctt_ref = torch.autograd.grad(ref_ctt, emb_t, retain_graph=True)[0][0]
    g_aux_ref = torch.autograd.grad(ref_aux, emb_t)[0][0]

    cfg = CriterionCfg(num_classes=5, n_frames=T, n_query=Qn,
                       window_inter_frame_asso=window)
    N = 3
    gt_ids = jnp.asarray(np.tile(np.arange(N)[:, None], (1, T)), jnp.int32)
    gt_valid = jnp.ones((N,), bool)
    relpos = jnp.asarray(query_relpos_grid(nb))
    key = jax.random.PRNGKey(0)

    def ctt_of(e):
        c, _, _ = _reid_loss_video(cfg, e, jnp.asarray(q_ids, jnp.int32),
                                   gt_ids, gt_valid, relpos, key)
        return c / N

    def aux_of(e):
        _, a, _ = _reid_loss_video(cfg, e, jnp.asarray(q_ids, jnp.int32),
                                   gt_ids, gt_valid, relpos, key)
        return a / N

    g_ctt = jax.grad(ctt_of)(jnp.asarray(embeds))
    g_aux = jax.grad(aux_of)(jnp.asarray(embeds))
    _assert_grad_close(g_ctt, g_ctt_ref.numpy(), "reid/ctt", tol=5e-5)
    _assert_grad_close(g_aux, g_aux_ref.numpy(), "reid/aux", tol=5e-5)


def test_reid_loss_gradient_finite_capped_regime():
    """In the capped/masked regime (fired candidate pools exceed both dynamic-k
    caps, some instances absent -> `use`=False branch active) the selected sets
    diverge from the reference's randperm stream, so no value comparison is
    possible — but the gradient must be finite: -inf priorities flowing
    through top_k, jnp.where(use, ...) dead branches, and the 1e-12-clipped
    normalizations are all NaN-through-vjp hazards."""
    from mdqe_cvpr2023_tpu.losses import CriterionCfg
    from mdqe_cvpr2023_tpu.losses.criterion import _reid_loss_video
    from mdqe_cvpr2023_tpu.models.decoder import query_relpos_grid

    nb, T, E = 8, 2, 8
    Qn = nb * nb                       # TQ = 128 > K_neg = min(50*T, TQ) = 100
    rng = np.random.default_rng(1)
    # ids: instance 0 occupies many queries (pos pool > cap), the rest mostly
    # background (-1) so the fired diff pool exceeds 100; one zero-norm embed
    # row stresses the clipped normalization's vjp
    q_ids = rng.integers(-1, 2, (T, Qn)).astype(np.int64)
    q_ids[0, :20] = 0
    embeds = rng.standard_normal((T, Qn, E)).astype(np.float32)
    embeds[1, 0] = 0.0

    cfg = CriterionCfg(num_classes=5, n_frames=T, n_query=Qn,
                       window_inter_frame_asso=5)
    N = 4                              # instance 3 never appears -> use=False
    gt_ids = jnp.asarray(np.tile(np.arange(N)[:, None], (1, T)), jnp.int32)
    gt_valid = jnp.asarray([True, True, True, False])
    relpos = jnp.asarray(query_relpos_grid(nb))

    def total(e):
        c, a, cnt = _reid_loss_video(cfg, e, jnp.asarray(q_ids, jnp.int32),
                                     gt_ids, gt_valid, relpos,
                                     jax.random.PRNGKey(1))
        return (c + a) / jnp.clip(cnt, 1.0, None)

    val, g = jax.value_and_grad(total)(jnp.asarray(embeds))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g))), "NaN/inf in reid grad"


def test_mask_head_gradient_parity():
    ref = load_reference_models()
    torch.manual_seed(3)
    dim, T = 256, 2
    mh = ref.MaskHead(dim, [dim, dim], T, 5).eval()
    rng = np.random.default_rng(3)
    x32 = rng.standard_normal((T, 4, 4, dim)).astype(np.float32)
    x16 = rng.standard_normal((T, 8, 8, dim)).astype(np.float32)
    x8 = rng.standard_normal((T, 16, 16, dim)).astype(np.float32)

    out_t = mh(torch.from_numpy(np.moveaxis(x32, -1, 1)).contiguous(),
               [torch.from_numpy(np.moveaxis(x16, -1, 1)).contiguous(),
                torch.from_numpy(np.moveaxis(x8, -1, 1)).contiguous()])
    R = rng.standard_normal(out_t.shape).astype(np.float32)
    (out_t * torch.from_numpy(R)).sum().backward()
    gsd = _torch_param_grads(mh, "detr.transformer_dec.mask_head.")
    ref_gtree = convert_torch_state_dict(gsd)["transformer_dec"]["mask_head"]

    sd = {"detr.transformer_dec.mask_head." + k: v.detach().numpy()
          for k, v in mh.state_dict().items()}
    params = convert_torch_state_dict(sd)["transformer_dec"]["mask_head"]

    def scalar(p):
        out = mask_head_apply(p, MaskHeadCfg(dim, (dim, dim)), jnp.asarray(x32),
                              [jnp.asarray(x16), jnp.asarray(x8)])
        # ours (T,H,W,M) vs torch (1,M,T,H,W)
        got = out.transpose(3, 0, 1, 2)[None]
        return (got * jnp.asarray(R)).sum()

    g = jax.grad(scalar, allow_int=True)(params)
    # fp32 accumulation over T*H*W output positions: absolute noise ~1e-4
    _compare_grad_trees(g, ref_gtree, "mask_head.", tol=1e-3)
