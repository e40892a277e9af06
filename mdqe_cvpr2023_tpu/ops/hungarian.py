"""Exact linear-sum assignment on device (Jonker-Volgenant shortest augmenting
path), for the tracker's per-clip matching.

Why: the reference tracker runs scipy.optimize.linear_sum_assignment on host
(/root/reference/mdqe/tracking/OverTracker.py:152-168). On this TPU a host
round trip costs ~30-60 ms through the tunnel — 3-4x the whole clip's compute —
so the association must run on device. The matrices are tiny (<=121 x 150);
exactness (not an auction approximation) keeps behavior identical to scipy up
to ties.

Algorithm: classic JV with dual potentials and a virtual column 0
(e-maxx formulation), minimizing cost; maximize by negation. The inner
"scan unmatched columns" step is a masked vector min, the augmenting-path
search a while_loop (<= C iterations), rows a fori_loop — all fixed-shape.
Complexity O(R * C^2) vector ops; for 121x150 that is ~3M lane-ops, microseconds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


@jax.jit
def lsa_maximize(scores, row_mask=None):
    """Max-weight assignment of rows to columns, all rows matched (R <= C).

    scores: (R, C) f32. Returns col4row (R,) int32 — the column assigned to each
    row; identical totals to scipy.optimize.linear_sum_assignment(maximize=True)
    (column choice may differ on exact ties).

    row_mask (R,) bool: rows with False are skipped entirely — their col4row is
    meaningless (0). Safe when skipped rows are all-zero AND zero-weight matches
    are discarded by the caller: excluding indifferent rows never changes the
    positive part of an optimal assignment, but skipping them avoids the
    augmenting-path walk, whose sequential while_loop iterations cost ~10 us
    each on TPU (an all-zero 120x150 problem runs ~80 ms without the mask)."""
    return lsa_minimize(-scores, row_mask)


@jax.jit
def lsa_minimize(cost, row_mask=None):
    """Min-cost assignment (R <= C required). Returns col4row (R,) int32."""
    R, C = cost.shape
    if R > C:
        raise ValueError(f"lsa requires R <= C, got {cost.shape}")
    a = cost.astype(jnp.float32)
    # columns 1..C real, column 0 virtual; rows 1..R real, row 0 virtual
    # state: u (R+1,), v (C+1,), p (C+1,) row matched to column (0 = none)
    u0 = jnp.zeros(R + 1, jnp.float32)
    v0 = jnp.zeros(C + 1, jnp.float32)
    p0 = jnp.zeros(C + 1, jnp.int32)

    def row_step(i, uvp):
        if row_mask is not None:
            return jax.lax.cond(row_mask[i - 1], _row_body,
                                lambda uvp_, i_: uvp_, uvp, i)
        return _row_body(uvp, i)

    def _row_body(uvp, i):
        u, v, p = uvp
        p = p.at[0].set(i)

        # Deferred-dual JV: the classic formulation updates u/v/minv with a
        # full-vector scatter + two where-updates EVERY while iteration; since
        # the loop is sequential, those vector ops set the per-clip latency
        # (measured ~20 ms/clip at 120 live instances). Reformulated with a
        # running prefix D = sum of deltas: store M[j] = min_t (cur_t[j] +
        # D_{t-1}) instead of the decayed minv (effective minv = M - D, so
        # delta = M[j1] - D and simply D <- M[j1]); record Dat[j] = D when j
        # becomes used, and commit the duals ONCE per row at loop exit:
        # v[used] -= D_end - Dat, u[p[used]] += D_end - Dat. Identical
        # assignments (same argmin sequence), ~2x less work per iteration.
        M0 = jnp.full(C + 1, _INF)
        way0 = jnp.zeros(C + 1, jnp.int32)
        used0 = jnp.zeros(C + 1, bool)
        dat0 = jnp.zeros(C + 1, jnp.float32)

        def cond(st):
            j0, *_ = st
            return p[j0] != 0

        def body(st):
            j0, D, M, way, used, dat = st
            used = used.at[j0].set(True)
            dat = dat.at[j0].set(D)
            i0 = p[j0]
            # relax in base coordinates: cur_j = a[i0-1, j-1] - u[i0] - v[j]
            cur = a[i0 - 1] - u[i0] - v[1:]            # (C,)
            cur = jnp.concatenate([jnp.full((1,), _INF), cur]) + D
            cur = jnp.where(used, _INF, cur)
            upd = cur < M
            M = jnp.where(upd, cur, M)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used, _INF, M)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            return j1, masked[j1], M, way, used, dat

        j0, D, M, way, used, dat = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(0.0), M0, way0, used0, dat0))

        # commit duals once (used columns only; column 0 carries u[i])
        adj = jnp.where(used, D - dat, 0.0)
        v = v - adj
        u = u.at[p].add(adj)

        # augment along way back to the virtual column
        def aug_cond(st):
            p_, j0_ = st
            return j0_ != 0

        def aug_body(st):
            p_, j0_ = st
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return p_, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    _, _, p = jax.lax.fori_loop(1, R + 1, row_step, (u0, v0, p0))
    # invert: col4row[r] = j with p[j+1] == r+1 (each real row matched exactly once;
    # unmatched columns carry row 0 and are dropped by the out-of-range index)
    rowm = p[1:]  # (C,) 1-based row matched to each real column
    col4row = jnp.zeros(R, jnp.int32).at[
        jnp.where(rowm > 0, rowm - 1, R)].set(jnp.arange(C, dtype=jnp.int32),
                                              mode="drop")
    return col4row
