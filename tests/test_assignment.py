"""Auction solver vs scipy: optimality on random and cosine-structured costs."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from dvis_plus_tpu.ops.assignment import auction_lap


def test_random_costs_optimal():
    rng = np.random.RandomState(0)
    solve = jax.jit(auction_lap)
    for trial in range(10):
        cost = rng.randn(50, 50).astype(np.float32) * 5
        c4r = np.asarray(solve(jnp.asarray(cost)))
        assert len(set(c4r.tolist())) == 50  # valid permutation
        ri, ci = linear_sum_assignment(cost)
        ours = cost[np.arange(50), c4r].sum()
        theirs = cost[ri, ci].sum()
        # near-optimal: auction gap bounded by n * eps_final
        assert ours <= theirs + 0.01, (ours, theirs)


def test_cosine_cost_exact():
    """Tracker-style costs (1 - cosine of noisy matched embeds): the optimum
    is well-separated, auction must recover it exactly."""
    rng = np.random.RandomState(1)
    solve = jax.jit(auction_lap)
    exact = 0
    for trial in range(20):
        ref = rng.randn(100, 64).astype(np.float32)
        perm = rng.permutation(100)
        cur = ref[perm] + 0.05 * rng.randn(100, 64).astype(np.float32)
        ref_n = ref / np.linalg.norm(ref, axis=1, keepdims=True)
        cur_n = cur / np.linalg.norm(cur, axis=1, keepdims=True)
        cost = (1 - cur_n @ ref_n.T).T.astype(np.float32)  # (ref, cur)
        c4r = np.asarray(solve(jnp.asarray(cost)))
        _, ci = linear_sum_assignment(cost)
        if np.array_equal(c4r, ci):
            exact += 1
    assert exact == 20


def test_rectangular():
    rng = np.random.RandomState(2)
    cost = rng.rand(10, 30).astype(np.float32)
    c4r = np.asarray(auction_lap(jnp.asarray(cost)))
    assert len(set(c4r.tolist())) == 10
    ri, ci = linear_sum_assignment(cost)
    assert cost[np.arange(10), c4r].sum() <= cost[ri, ci].sum() + 1e-4
