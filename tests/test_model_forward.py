"""End-to-end shape/compile smoke tests for the model core (tiny dims, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init, detr_apply_backbone
from mdqe_cvpr2023_tpu.models.detr import detr_encode, detr_mask_feats
from mdqe_cvpr2023_tpu.models.decoder import decoder_apply

TINY = MDQEModelCfg(backbone="resnet50", num_classes=5, hidden_dim=64, n_heads=4,
                    enc_layers=2, dec_layers=2, n_frames=2, n_query=16,
                    query_embed_dim=8, dec_temporal=True)


@pytest.fixture(scope="module")
def tiny_model():
    params = detr_init(jax.random.PRNGKey(0), TINY)
    return params


@pytest.mark.slow
def test_train_forward_shapes(tiny_model):
    B, T = 1, TINY.n_frames
    Hp = Wp = 64
    images = jnp.asarray(np.random.default_rng(0).standard_normal((B * T, Hp, Wp, 3)),
                         jnp.float32)
    sizes = jnp.asarray([[60, 64]] * (B * T), jnp.int32)
    out = detr_apply_backbone(tiny_model, TINY, images, sizes, n_frames=T, training=True)
    L = TINY.dec_layers + 1
    Q = TINY.n_query
    assert out["cls"].shape == (L, B, Q, TINY.num_classes)
    assert out["boxes"].shape == (L, B, Q, T, 4)
    assert out["mask_coeff"].shape == (L, B, Q, TINY.hidden_dim // 8)
    assert out["proto"].shape == (B * T, Hp // 4, Wp // 4, TINY.hidden_dim // 8)
    assert out["query_init"]["rpn_sem_cls"].shape == (B * T, Hp // 8, Wp // 8, TINY.num_classes)
    assert np.all(np.isfinite(np.asarray(out["cls"])))
    # cxcywh is sigmoid-bounded so xyxy stays within [-0.5, 1.5]; x1>=x0, y1>=y0
    b = np.asarray(out["boxes"])
    assert b.min() >= -0.5 and b.max() <= 1.5
    assert np.all(b[..., 2:] - b[..., :2] >= 0)


@pytest.mark.slow
def test_inference_clip_path(tiny_model):
    T = 4  # test clip longer than train n_frames
    Hp = Wp = 64
    images = jnp.asarray(np.random.default_rng(1).standard_normal((T, Hp, Wp, 3)),
                         jnp.float32)
    sizes = jnp.asarray([[64, 60]] * T, jnp.int32)
    encoded, mask_flat, shapes = detr_encode(tiny_model, TINY, images, sizes)
    N = sum(h * w for h, w in shapes)
    assert encoded.shape == (T, N, TINY.hidden_dim)
    mf = detr_mask_feats(tiny_model, TINY, encoded, shapes)
    assert mf.shape == (T, Hp // 4, Wp // 4, TINY.hidden_dim // 8)

    out = decoder_apply(tiny_model["transformer_dec"], TINY.decoder_cfg, encoded,
                        mask_flat, shapes, n_frames=T, training=False)
    Q = TINY.n_query
    assert out["cls"].shape == (1, Q, TINY.num_classes)
    assert out["mask_coeff"].shape == (1, Q, TINY.hidden_dim // 8)
    assert out["query_embed"].shape == (1, Q, TINY.hidden_dim)
    cls = np.asarray(out["cls"])
    assert cls.min() >= 0 and cls.max() <= 1


@pytest.mark.slow
def test_jit_compiles(tiny_model):
    T = TINY.n_frames
    images = jnp.zeros((T, 32, 32, 3), jnp.float32)
    sizes = jnp.asarray([[32, 32]] * T, jnp.int32)

    @jax.jit
    def step(params, images, sizes):
        out = detr_apply_backbone(params, TINY, images, sizes, n_frames=T, training=True)
        return out["cls"].sum() + out["boxes"].sum()

    v1 = step(tiny_model, images, sizes)
    v2 = step(tiny_model, images + 1.0, sizes)
    assert np.isfinite(float(v1)) and np.isfinite(float(v2))
