"""Kernel-correctness harness for the deformable-attention op, mirroring the
reference's dual-implementation pattern (/root/reference/mdqe/models/ops/test.py):
fast fused op vs readable oracle in double and float precision, plus an independent
torch.grid_sample oracle and numeric gradient checks."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mdqe_cvpr2023_tpu.ops import ms_deform_attn, ms_deform_attn_ref

SHAPES = [(6, 4), (3, 2), (2, 2), (1, 1)]  # (h, w) per level, like ops/test.py
N = sum(h * w for h, w in SHAPES)


def make_inputs(rng, B=1, Q=4, H=2, D=8, P=2, dtype=np.float64):
    L = len(SHAPES)
    value = rng.standard_normal((B, N, H, D)).astype(dtype) * 0.01
    loc = rng.uniform(0, 1, (B, Q, H, L, P, 2)).astype(dtype)
    w = rng.uniform(0, 1, (B, Q, H, L, P)).astype(dtype) + 1e-5
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, loc, w


@pytest.mark.parametrize("dtype,tol", [(np.float64, 1e-12), (np.float32, 1e-5)])
def test_fused_matches_oracle(dtype, tol):
    rng = np.random.default_rng(0)
    value, loc, w = make_inputs(rng, B=2, Q=7, H=2, D=8, P=3, dtype=dtype)
    out = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    ref = ms_deform_attn_ref(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out, np.float64), np.asarray(ref, np.float64),
                               atol=tol, rtol=tol)


def test_against_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    B, Q, H, D, P = 2, 5, 2, 4, 3
    L = len(SHAPES)
    value, loc, w = make_inputs(rng, B=B, Q=Q, H=H, D=D, P=P, dtype=np.float64)

    # torch oracle: per-level grid_sample + weighted sum (independent re-derivation
    # of the reference oracle's math using torch's own grid_sample)
    tv = torch.from_numpy(value)
    tloc = torch.from_numpy(loc)
    tw = torch.from_numpy(w)
    outs = []
    start = 0
    for l, (h_l, w_l) in enumerate(SHAPES):
        v_l = tv[:, start:start + h_l * w_l].permute(0, 2, 3, 1).reshape(B * H, D, h_l, w_l)
        start += h_l * w_l
        grid = 2 * tloc[:, :, :, l] - 1  # (B,Q,H,P,2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        samp = F.grid_sample(v_l, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=False)  # (B*H, D, Q, P)
        outs.append(samp.reshape(B, H, D, Q, P))
    samp = torch.stack(outs, dim=-2)  # (B,H,D,Q,L,P)
    expected = (samp * tw.permute(0, 2, 1, 3, 4)[:, :, None]).sum((-1, -2))  # (B,H,D,Q)
    expected = expected.permute(0, 3, 1, 2).reshape(B, Q, H * D).numpy()

    out = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                                    jnp.asarray(w)), np.float64)
    np.testing.assert_allclose(out, expected, atol=1e-12, rtol=1e-10)


def test_out_of_range_locations_are_zero_padded():
    value = jnp.ones((1, N, 1, 4), jnp.float64)
    loc = jnp.full((1, 2, 1, len(SHAPES), 1, 2), 3.0, jnp.float64)  # far outside
    w = jnp.ones((1, 2, 1, len(SHAPES), 1), jnp.float64) / len(SHAPES)
    out = ms_deform_attn(value, SHAPES, loc, w)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0.0)


def test_gradients_match_numeric():
    rng = np.random.default_rng(2)
    value, loc, w = make_inputs(rng, B=1, Q=3, H=2, D=4, P=2, dtype=np.float64)
    value_j, loc_j, w_j = jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(value_j, loc_j, w_j)

    eps = 1e-6
    for argi, arr in [(0, value), (1, loc), (2, w)]:
        flat = arr.reshape(-1)
        for idx in rng.choice(flat.size, size=8, replace=False):
            pert = flat.copy()
            pert[idx] += eps
            args_p = [value, loc, w]
            args_p[argi] = pert.reshape(arr.shape)
            up = float(f(*[jnp.asarray(a) for a in args_p]))
            pert[idx] -= 2 * eps
            args_m = [value, loc, w]
            args_m[argi] = pert.reshape(arr.shape)
            down = float(f(*[jnp.asarray(a) for a in args_m]))
            num = (up - down) / (2 * eps)
            ana = float(np.asarray(grads[argi]).reshape(-1)[idx])
            assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (argi, idx, num, ana)


@pytest.mark.parametrize("D", [30, 32, 64, 71])
def test_channel_sizes(D):
    # mirrors ops/test.py's channel sweep (trimmed for CPU test time)
    rng = np.random.default_rng(D)
    value, loc, w = make_inputs(rng, B=1, Q=4, H=2, D=D, P=2, dtype=np.float32)
    out = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    ref = ms_deform_attn_ref(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
