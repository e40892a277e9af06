"""Swin t/s/b/l preset wiring (reference mdqe/backbone/config.py:6-76)."""
import numpy as np
import pytest


@pytest.mark.parametrize("kind,embed", [("swin_tiny", 96), ("swin_small", 96),
                                        ("swin_base", 128), ("swin_large", 192)])
def test_preset_channels(kind, embed):
    from mdqe_cvpr2023_tpu.models.detr import MDQEModelCfg
    cfg = MDQEModelCfg(backbone=kind)
    assert cfg.backbone_channels == (2 * embed, 4 * embed, 8 * embed)
    assert cfg.swin_cfg.embed_dim == embed


@pytest.mark.slow
def test_tiny_preset_forward():
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.detr import (MDQEModelCfg, detr_init,
                                               detr_apply_backbone)
    cfg = MDQEModelCfg(backbone="swin_tiny", num_classes=3, hidden_dim=64,
                       n_heads=4, enc_layers=1, dec_layers=1, n_frames=1,
                       n_query=16, query_embed_dim=8)
    params = detr_init(jax.random.PRNGKey(0), cfg)
    out = detr_apply_backbone(params, cfg, jnp.zeros((1, 64, 64, 3), jnp.float32),
                              jnp.asarray([[64, 64]], jnp.int32), n_frames=1,
                              training=False)
    assert out["cls"].shape == (1, 16, 3)


def test_config_swin_type_selects_preset():
    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.build import build_model_cfg
    cfg = load_config("configs/swinl_coco.yaml")
    m = build_model_cfg(cfg)
    assert m.backbone == "swin_large"
    assert m.swin_cfg.window_size == 12  # from yaml, not the preset default
    cfg.MODEL.SWIN.TYPE = "tiny"
    cfg.MODEL.SWIN.EMBED_DIM = 96
    cfg.MODEL.SWIN.DEPTHS = [2, 2, 6, 2]
    cfg.MODEL.SWIN.NUM_HEADS = [3, 6, 12, 24]
    m2 = build_model_cfg(cfg)
    assert m2.backbone == "swin_tiny" and m2.swin_cfg.embed_dim == 96


@pytest.mark.slow
def test_v1_training_forward_backward():
    """Swin v1 + drop-path through the full model with gradients: the train
    path (rng given) must produce finite grads and differ from eval."""
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.detr import (MDQEModelCfg, detr_init,
                                               detr_apply_backbone)
    from mdqe_cvpr2023_tpu.models.swin import SwinCfg
    swin = SwinCfg(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8),
                   window_size=4, version=1, drop_path_rate=0.3)
    cfg = MDQEModelCfg(backbone="swin_custom", swin=swin, num_classes=3,
                       hidden_dim=64, n_heads=4, enc_layers=1, dec_layers=1,
                       n_frames=1, n_query=16, query_embed_dim=8)
    params = detr_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    sizes = jnp.asarray([[64, 64]], jnp.int32)

    def loss(p, rng):
        out = detr_apply_backbone(p, cfg, x, sizes, n_frames=1, training=True,
                                  drop_rate=0.1, rng=rng)
        return (out["cls"] ** 2).mean()

    g = jax.grad(loss)(params, jax.random.PRNGKey(1))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
    # drop-path actually fires: two rngs give different losses
    l1 = float(loss(params, jax.random.PRNGKey(1)))
    l2 = float(loss(params, jax.random.PRNGKey(2)))
    assert l1 != l2
