"""Banded hat-matmul kernel parity through the Pallas interpreter.

The banded kernels (round 5) block-permute encoder queries into 16x16 spatial
tiles and contract only a dynamic (BR, BF*D) patch per (batch, head, q-tile,
level), with an exact full-extent fallback per cell. Validated here against
the XLA gather formulation (itself oracle-tested in test_deform_attn.py) in
every regime the band logic distinguishes:

  - clustered encoder-like locations (band path on the banded level)
  - uniformly scattered locations (per-cell fallback)
  - mixed cells + out-of-range locations (clamped band selection)
  - custom-VJP backward for all three inputs in both regimes
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdqe_cvpr2023_tpu.ops import deform_attn_pallas as dap
from mdqe_cvpr2023_tpu.ops.deform_attn import _ms_deform_attn_xla

SHAPES = ((24, 40), (12, 20))  # level 0 row-banded (rows=40 > BAND_R=32)
N = sum(h * w for h, w in SHAPES)


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = dap._INTERPRET
    dap._INTERPRET = True
    yield
    dap._INTERPRET = old


def _clustered_loc(rng, B, H, L, P, scatter=0.08):
    """Encoder-like: queries are the pixels; locations = per-pixel reference
    point + small offsets (same normalized point at every level)."""
    refs = []
    for (h, w) in SHAPES:
        yy, xx = np.mgrid[0:h, 0:w]
        refs.append(np.stack([(xx.ravel() + 0.5) / w,
                              (yy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs)                       # (N, 2) normalized
    off = rng.uniform(-scatter, scatter, (B, N, H, L, P, 2))
    return (ref[None, :, None, None, None, :] + off).astype(np.float32)


def _inputs(loc_mode, B=1, H=2, D=32, P=4, seed=0):
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((B, N, H, D)).astype(np.float32)
    L = len(SHAPES)
    if loc_mode == "clustered":
        loc = _clustered_loc(rng, B, H, L, P)
    elif loc_mode == "scattered":
        loc = rng.uniform(-0.1, 1.1, (B, N, H, L, P, 2)).astype(np.float32)
    else:  # mixed: clustered with a scattered stripe of queries
        loc = _clustered_loc(rng, B, H, L, P)
        loc[:, 100:200] = rng.uniform(-0.1, 1.1,
                                      (B, 100, H, L, P, 2)).astype(np.float32)
    attw = rng.dirichlet(np.ones(L * P), (B, N, H)).reshape(B, N, H, L, P)
    return (jnp.asarray(value), SHAPES, jnp.asarray(loc),
            jnp.asarray(attw.astype(np.float32)))


@pytest.mark.parametrize("loc_mode", ["clustered", "scattered", "mixed"])
def test_banded_forward_matches_xla(loc_mode):
    value, shapes, loc, attw = _inputs(loc_mode)
    out_k = dap.ms_deform_attn_pallas(value, shapes, loc, attw, 128,
                                      "float32", True)
    out_x = _ms_deform_attn_xla(value, shapes, loc, attw)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_banded_band_path_actually_taken():
    """Guard against the fallback silently handling everything: with tightly
    clustered locations the banded level's extents must fit the band for
    most cells (the math parity above would pass either way)."""
    value, shapes, loc, attw = _inputs("clustered")
    loc_np = np.asarray(loc)
    perm, _ = dap._query_block_perm(SHAPES)
    q_tile = 128
    r = 40  # level 0 rows = w
    lp = loc_np[0][perm]                          # (N, H, L, P, 2)
    gr = lp[:, :, 0, :, 0] * 40 - 0.5             # rows coord = x, (N, H, P)
    n_fit = n_tot = 0
    for t in range(N // q_tile):
        sl = slice(t * q_tile, (t + 1) * q_tile)
        for hh in range(loc_np.shape[2]):
            g = np.clip(gr[sl, hh], -1, r)
            rlo = min(max(int(np.floor(g.min())) // 8 * 8, 0), 40 - 32)
            rhi = min(int(np.floor(g.max())) + 1, r - 1)
            n_fit += rhi < rlo + 32
            n_tot += 1
    assert n_fit / n_tot > 0.7, f"band hit rate {n_fit}/{n_tot}"


@pytest.mark.parametrize("loc_mode,seed", [("clustered", 0), ("scattered", 1),
                                           ("mixed", 2)])
def test_banded_backward_matches_xla_vjp(loc_mode, seed):
    value, shapes, loc, attw = _inputs(loc_mode, seed=seed)
    g = jnp.asarray(np.random.default_rng(seed + 7)
                    .standard_normal((value.shape[0], N,
                                      value.shape[2] * value.shape[3]))
                    .astype(np.float32))
    dv_k, dl_k, da_k = dap._backward_banded(value, shapes, loc, attw, g, 128,
                                            "float32")
    _, vjp = jax.vjp(lambda v, l, a: _ms_deform_attn_xla(v, shapes, l, a),
                     value, loc, attw)
    dv_x, dl_x, da_x = vjp(g)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(da_k), np.asarray(da_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dl_k), np.asarray(dl_x),
                               rtol=1e-3, atol=1e-3)


def test_banded_through_custom_vjp_api():
    value, shapes, loc, attw = _inputs("clustered")

    def loss_k(v, l, a):
        return (dap.ms_deform_attn_pallas(v, shapes, l, a, 128, "float32",
                                          True) ** 2).sum()

    def loss_x(v, l, a):
        return (_ms_deform_attn_xla(v, shapes, l, a) ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(value, loc, attw)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(value, loc, attw)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_training_encoder_opts_out_of_banded(monkeypatch):
    """The training (remat) encoder path must pass allow_banded=False down to
    ms_deform_attn — interleaved same-window step A/Bs showed the banded
    pack/permute glue recomputed under the remat policy costs more than the
    banded kernels save (1.47-1.48 vs 1.36 s/iter at the 512x800 train
    geometry), while the fwd-only inference path keeps the banded win."""
    from mdqe_cvpr2023_tpu.models import encoder as enc_mod

    seen = []
    real = enc_mod.ms_deform_attn_module

    def spy(*args, **kwargs):
        seen.append(kwargs.get("allow_banded", True))
        return real(*args, **kwargs)

    monkeypatch.setattr(enc_mod, "ms_deform_attn_module", spy)

    cfg = enc_mod.EncoderCfg(dim=32, n_heads=2, n_levels=2, n_points=2,
                             n_layers=2)
    params = enc_mod.encoder_init(jax.random.PRNGKey(0), cfg)
    B = 1
    srcs = [jnp.zeros((B, 8, 8, 32)), jnp.zeros((B, 4, 4, 32))]
    masks = [jnp.zeros((B, 8, 8), bool), jnp.zeros((B, 4, 4), bool)]
    pos = [jnp.zeros((B, 8, 8, 32)), jnp.zeros((B, 4, 4, 32))]

    enc_mod.encoder_apply(params, cfg, srcs, masks, pos, drop_rate=0.1,
                          rng=jax.random.PRNGKey(1))
    assert seen and all(b is False for b in seen), seen

    seen.clear()
    enc_mod.encoder_apply(params, cfg, srcs, masks, pos)
    assert seen and all(b is True for b in seen), seen
