"""SwinV2 backbone activation parity vs the reference torch implementation."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
REF_AVAILABLE = os.path.isdir("/root/reference/mdqe")
pytestmark = pytest.mark.skipif(not REF_AVAILABLE, reason="reference not mounted")

if REF_AVAILABLE:
    from ref_oracle import load_reference_swin, load_reference_swin_v1

from mdqe_cvpr2023_tpu.engine.checkpoint import convert_torch_state_dict
from mdqe_cvpr2023_tpu.models.swin import SwinCfg, swin_apply


@pytest.mark.slow
def test_swin_tiny_geometry_parity():
    SwinV2 = load_reference_swin()
    torch.manual_seed(0)
    cfg = SwinCfg(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8),
                  window_size=4, out_stages=(0, 1, 2))
    ref = SwinV2(patch_size=4, embed_dim=32, depths=[2, 2, 2], num_heads=[2, 4, 8],
                 window_size=4, drop_path_rate=0.0,
                 out_features=["stage2", "stage3", "stage4"])
    ref.eval()  # (the reference's train() override returns None, no chaining)

    sd = {"detr.backbone.0.backbone." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(sd)["backbone"]

    rng = np.random.default_rng(0)
    # non-multiple-of-window spatial size exercises padding + shifted masks
    x = rng.standard_normal((2, 40, 52, 3)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())

    outs = swin_apply(params, jnp.asarray(x), cfg)
    for i, name in enumerate(["stage2", "stage3", "stage4"]):
        exp = expected[name].numpy()
        got = np.moveaxis(np.asarray(outs[i]), -1, 1)
        np.testing.assert_allclose(got, exp, atol=2e-4, rtol=2e-4), name


@pytest.mark.slow
def test_swin_v1_geometry_parity():
    """Swin v1 (pre-norm, learned rel-pos bias table, norm-then-reduce merge)
    vs the reference swin_transformer.py:440-683."""
    SwinV1 = load_reference_swin_v1()
    torch.manual_seed(1)
    cfg = SwinCfg(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8),
                  window_size=4, out_stages=(0, 1, 2), version=1)
    ref = SwinV1(patch_size=4, embed_dim=32, depths=[2, 2, 2], num_heads=[2, 4, 8],
                 window_size=4, drop_path_rate=0.0, ape=False, frozen_stages=-1,
                 out_features=["stage2", "stage3", "stage4"])
    ref.eval()

    sd = {"detr.backbone.0.backbone." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(sd)["backbone"]

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 40, 52, 3)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())

    outs = swin_apply(params, jnp.asarray(x), cfg)
    for i, name in enumerate(["stage2", "stage3", "stage4"]):
        exp = expected[name].numpy()
        got = np.moveaxis(np.asarray(outs[i]), -1, 1)
        np.testing.assert_allclose(got, exp, atol=2e-4, rtol=2e-4), name


def test_swin_drop_path_train_eval():
    """Stochastic depth: eval (rng=None) deterministic; train rng produces a
    different but finite output; rate 0 with an rng equals eval."""
    import jax
    cfg = SwinCfg(embed_dim=16, depths=(2, 2), num_heads=(2, 4), window_size=4,
                  out_stages=(0, 1), drop_path_rate=0.5)
    from mdqe_cvpr2023_tpu.models.swin import swin_init
    params = swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16, 16, 3)),
                    jnp.float32)
    eval_out = swin_apply(params, x, cfg)
    train_out = swin_apply(params, x, cfg, rng=jax.random.PRNGKey(3))
    assert all(bool(np.isfinite(np.asarray(o)).all()) for o in train_out)
    assert not np.allclose(np.asarray(eval_out[-1]), np.asarray(train_out[-1]))
    cfg0 = SwinCfg(embed_dim=16, depths=(2, 2), num_heads=(2, 4), window_size=4,
                   out_stages=(0, 1), drop_path_rate=0.0)
    same = swin_apply(params, x, cfg0, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(eval_out[-1]), np.asarray(same[-1]),
                               rtol=1e-6, atol=1e-6)


def test_swin_v1_ape_parity():
    """APE (absolute position embedding): reference swin_transformer.py:504-509
    trunc-normal (1,C,H0,W0) param, bicubic-resized to the runtime patch grid
    and added after patch embed (:595-598). Covers both the identity path
    (input at the pretrain resolution) and a genuinely resized grid — the
    static interpolation matrices must match torch's bicubic exactly."""
    SwinV1 = load_reference_swin_v1()
    torch.manual_seed(3)
    cfg = SwinCfg(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=4,
                  out_stages=(0, 1), version=1, ape=True, pretrain_img_size=32)
    ref = SwinV1(pretrain_img_size=32, patch_size=4, embed_dim=32,
                 depths=[2, 2], num_heads=[2, 4], window_size=4,
                 drop_path_rate=0.0, ape=True, frozen_stages=-1,
                 out_features=["stage2", "stage3"])
    ref.eval()
    with torch.no_grad():  # make the APE non-trivial (init is zeros+trunc_normal)
        ref.absolute_pos_embed.mul_(50.0)

    sd = {"detr.backbone.0.backbone." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(sd)["backbone"]
    assert "absolute_pos_embed" in params

    rng = np.random.default_rng(5)
    for hw in [(32, 32), (40, 52)]:  # identity resize and true bicubic resize
        x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
        outs = swin_apply(params, jnp.asarray(x), cfg)
        for i, name in enumerate(["stage2", "stage3"]):
            exp = expected[name].numpy()
            got = np.moveaxis(np.asarray(outs[i]), -1, 1)
            np.testing.assert_allclose(got, exp, atol=3e-4, rtol=3e-4,
                                       err_msg=f"{name} @ {hw}")
