"""Device Hungarian (ops/hungarian.py) vs scipy.optimize.linear_sum_assignment.

The tracker's matching must be exact (reference OverTracker.py:152-168 uses
scipy); ties may break differently, so equality is asserted on the TOTAL
assignment weight, plus pairwise-unique columns."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from mdqe_cvpr2023_tpu.ops.hungarian import lsa_maximize


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (5, 5), (7, 30),
                                   (121, 150), (40, 40)])
def test_matches_scipy_total(shape):
    rng = np.random.default_rng(0)
    R, C = shape
    for trial in range(8):
        s = rng.random((R, C)).astype(np.float32)
        col = np.asarray(lsa_maximize(s))
        assert len(set(col.tolist())) == R  # one column per row
        ours = s[np.arange(R), col].sum()
        ri, ci = linear_sum_assignment(s, maximize=True)
        ref = s[ri, ci].sum()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_gated_scores_with_zeros():
    # tracker-style: most entries zeroed by the threshold gate
    rng = np.random.default_rng(1)
    s = rng.random((30, 40)).astype(np.float32)
    s[s < 0.8] = 0.0
    col = np.asarray(lsa_maximize(s))
    ri, ci = linear_sum_assignment(s, maximize=True)
    np.testing.assert_allclose(s[np.arange(30), col].sum(), s[ri, ci].sum(),
                               rtol=1e-5)


def test_row_mask_skips_zero_rows():
    """Masked-out all-zero rows must not change the positive-part assignment."""
    rng = np.random.default_rng(2)
    for trial in range(6):
        s = np.zeros((60, 80), np.float32)
        # a handful of positive rows
        act = rng.choice(60, size=12, replace=False)
        s[act] = rng.random((12, 80)).astype(np.float32)
        s[s < 0.6] = 0.0
        mask = (s > 0).any(axis=1)
        col = np.asarray(lsa_maximize(s, mask))
        ours = sum(s[r, col[r]] for r in range(60) if s[r, col[r]] > 0)
        ri, ci = linear_sum_assignment(s, maximize=True)
        ref = sum(s[r, c] for r, c in zip(ri, ci) if s[r, c] > 0)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)
