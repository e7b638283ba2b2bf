"""Vectorized auction algorithm for linear assignment (TPU-fast path).

The exact JV solver in :mod:`dvis_plus_tpu.ops.hungarian` is a sequential
scalar loop — correct everywhere, but ~10ms for a 100x100 problem on TPU
(scalar while_loop iterations don't vectorize). The streaming tracker solves
one assignment per frame (reference noiser ``match_embds``,
``DVIS_Plus/dvis_Plus/noiser.py:43-56``), so matching must cost microseconds.

Bertsekas' forward auction maps to the VPU: every bidding round is dense
(n, m) vector work (top-2 values per row, per-column argmax of bids), iterated
in a ``lax.while_loop``. A single stage with eps = cost_span/5000 recovers the
exact scipy optimum on random dense, rectangular, and tracker-style cosine
costs (see tests); tracker costs converge in ~1 round because the optimum is
well-separated.

Note on epsilon scaling: carrying prices across stages is only valid for
square problems (for n < m the n*eps bound needs unassigned columns at base
price) — measured round counts don't justify the complexity, so we run one
stage.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def auction_lap(cost: jnp.ndarray, max_rounds: int = 3000) -> jnp.ndarray:
    """Minimize sum of cost[i, col4row[i]] over assignments; n <= m.

    Returns col4row (n,) int32 (a valid injective assignment; exact optimum on
    non-adversarial inputs, within n*eps in the worst case).
    """
    n, m = cost.shape
    assert n <= m, cost.shape
    if m == 1:
        return jnp.zeros((n,), jnp.int32)
    benefit = -cost.astype(jnp.float32)  # maximize
    span = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
    eps = span / 5000.0

    rows = jnp.arange(n)
    cols = jnp.arange(m)

    def cond(state):
        col4row, owner, prices, rounds = state
        return jnp.any(col4row < 0) & (rounds < max_rounds)

    def body(state):
        col4row, owner, prices, rounds = state
        unassigned = col4row < 0  # (n,)
        values = benefit - prices[None, :]  # (n, m)
        top2, idx2 = jax.lax.top_k(values, 2)
        best_j = idx2[:, 0]
        bid = top2[:, 0] - top2[:, 1] + eps  # (n,)
        bid_mat = jnp.where(
            unassigned[:, None] & (best_j[:, None] == cols[None, :]),
            bid[:, None],
            _NEG,
        )
        best_bid = jnp.max(bid_mat, axis=0)  # (m,)
        winner = jnp.argmax(bid_mat, axis=0)
        has_bid = best_bid > _NEG / 2

        prices = jnp.where(has_bid, prices + best_bid, prices)
        prev_owner = jnp.where(has_bid, owner, -1)
        col4row = jnp.where(
            jnp.any((prev_owner[None, :] == rows[:, None]) & has_bid[None, :], axis=1),
            -1,
            col4row,
        )
        owner = jnp.where(has_bid, winner, owner)
        col4row = col4row.at[jnp.where(has_bid, winner, n)].set(
            jnp.where(has_bid, cols, 0), mode="drop"
        )
        return (col4row, owner, prices, rounds + 1)

    init = (
        jnp.full((n,), -1, jnp.int32),
        jnp.full((m,), -1, jnp.int32),
        jnp.zeros((m,), jnp.float32),
        jnp.int32(0),
    )
    col4row, owner, prices, _ = jax.lax.while_loop(cond, body, init)

    # safety net for the round cap: place leftovers on free columns
    def fix(i, c4r):
        taken = jnp.zeros((m,), bool).at[jnp.where(c4r >= 0, c4r, m)].set(
            True, mode="drop"
        )
        free_col = jnp.argmax(~taken)
        return jnp.where(c4r[i] < 0, c4r.at[i].set(free_col), c4r)

    col4row = jax.lax.fori_loop(0, n, fix, col4row)
    return col4row.astype(jnp.int32)
