"""In-graph Hungarian solver vs scipy (reference uses scipy LSA everywhere:
mask2former_video/modeling/matcher.py:156, dvis_Plus/noiser.py:54)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from dvis_plus_tpu.ops.hungarian import hungarian, hungarian_masked


@pytest.mark.parametrize("n,m", [(1, 1), (3, 3), (10, 10), (7, 12), (50, 50), (100, 200)])
def test_matches_scipy_cost(n, m):
    rng = np.random.RandomState(0)
    for trial in range(5):
        cost = rng.randn(n, m).astype(np.float32) * 10
        col4row, row4col = jax.jit(hungarian)(jnp.asarray(cost))
        col4row = np.asarray(col4row)
        ri, ci = linear_sum_assignment(cost)
        # optimal total cost must match exactly (ties may permute)
        ours = cost[np.arange(n), col4row].sum()
        theirs = cost[ri, ci].sum()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)
        # assignment must be a valid partial permutation
        assert len(set(col4row.tolist())) == n
        # row4col consistency
        row4col = np.asarray(row4col)
        for r, c in enumerate(col4row):
            assert row4col[c] == r


def test_unique_optimum_exact_permutation():
    rng = np.random.RandomState(1)
    cost = rng.rand(20, 20).astype(np.float32)  # generic: unique optimum a.s.
    col4row, _ = hungarian(jnp.asarray(cost))
    _, ci = linear_sum_assignment(cost)
    np.testing.assert_array_equal(np.asarray(col4row), ci)


def test_masked_prefers_valid_columns():
    rng = np.random.RandomState(2)
    cost = rng.rand(4, 10).astype(np.float32)
    valid = jnp.asarray([True] * 6 + [False] * 4)
    col4row, _ = hungarian_masked(jnp.asarray(cost), valid)
    # 4 rows, 6 valid cols -> all rows must land on valid columns
    assert np.all(np.asarray(col4row) < 6)
    ri, ci = linear_sum_assignment(cost[:, :6])
    ours = cost[np.arange(4), np.asarray(col4row)].sum()
    np.testing.assert_allclose(ours, cost[ri, ci].sum(), rtol=1e-5)


def test_jit_and_vmap():
    rng = np.random.RandomState(3)
    costs = rng.rand(4, 8, 8).astype(np.float32)
    batched = jax.jit(jax.vmap(lambda c: hungarian(c)[0]))(jnp.asarray(costs))
    for b in range(4):
        _, ci = linear_sum_assignment(costs[b])
        total = costs[b][np.arange(8), np.asarray(batched[b])].sum()
        np.testing.assert_allclose(total, costs[b][np.arange(8), ci].sum(), rtol=1e-5)
