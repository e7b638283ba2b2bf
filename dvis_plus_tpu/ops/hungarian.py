"""Linear sum assignment (Hungarian matching) inside jit.

The reference calls ``scipy.optimize.linear_sum_assignment`` from the matchers
(``DVIS_Plus/mask2former_video/modeling/matcher.py:156``), the tracker's Noiser
(``dvis_Plus/noiser.py:54``) and MinVIS post-processing
(``dvis_Plus/meta_architecture.py:262``) — a host round-trip per frame. On TPU
that CPU crossing would serialize the streaming tracker, so we solve the
assignment on-device: the shortest-augmenting-path algorithm (Crouse 2016, the
same algorithm scipy implements) expressed with ``lax.while_loop`` /
``lax.fori_loop`` over fixed-size state arrays.

Cost matrices here are small (Q x N, Q <= 200), so an O(n^3) scalar-ish loop is
cheap; the win is staying in-graph so the tracker scan never leaves the device.

Exactness: produces an optimal assignment for any finite float cost matrix
(ties may resolve differently than scipy; total cost is identical).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def hungarian(cost: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve min-cost assignment for a (n, m) cost matrix with n <= m.

    Returns ``(col4row, row4col)``:
      - ``col4row``: (n,) int32 — column assigned to each row.
      - ``row4col``: (m,) int32 — row assigned to each column (-1 if none).

    All rows are assigned (n <= m required; pad the cost matrix with a large
    constant + validity masking for variable problem sizes).
    """
    n, m = cost.shape
    assert n <= m, f"hungarian requires n <= m, got {cost.shape}"
    cost = cost.astype(jnp.float32)

    def solve_row(cur_row, state):
        u, v, row4col, col4row = state

        # --- Dijkstra-style shortest augmenting path from cur_row ---
        def dijkstra_cond(dstate):
            _, _, _, _, sink, _, _ = dstate
            return sink < 0

        def dijkstra_body(dstate):
            i, SC, shortest, path, _, minval, SR = dstate
            SR = SR.at[i].set(True)
            r = minval + cost[i, :] - u[i] - v  # (m,)
            upd = (r < shortest) & (~SC)
            path = jnp.where(upd, i, path)
            shortest = jnp.where(upd, r, shortest)
            masked = jnp.where(SC, _INF, shortest)
            j = jnp.argmin(masked)
            minval = masked[j]
            SC = SC.at[j].set(True)
            unassigned = row4col[j] < 0
            sink = jnp.where(unassigned, j, -1)
            i = jnp.where(unassigned, i, row4col[j])
            return (i, SC, shortest, path, sink, minval, SR)

        init = (
            cur_row,
            jnp.zeros((m,), jnp.bool_),
            jnp.full((m,), _INF, jnp.float32),
            jnp.full((m,), -1, jnp.int32),
            jnp.int32(-1),
            jnp.float32(0.0),
            jnp.zeros((n,), jnp.bool_),
        )
        _, SC, shortest, path, sink, minval, SR = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init
        )

        # --- dual updates ---
        u = u.at[cur_row].add(minval)
        other = SR & (jnp.arange(n) != cur_row)
        # shortest path cost to the column currently matched to row i
        spc_row = jnp.where(
            col4row >= 0, shortest[jnp.clip(col4row, 0, m - 1)], 0.0
        )
        u = jnp.where(other, u + minval - spc_row, u)
        v = jnp.where(SC, v - (minval - shortest), v)

        # --- augment along the alternating path ---
        def aug_cond(astate):
            _, _, _, done = astate
            return ~done

        def aug_body(astate):
            j, row4col_, col4row_, _ = astate
            i = path[j]
            row4col_ = row4col_.at[j].set(i)
            nxt_j = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            done = i == cur_row
            return (nxt_j, row4col_, col4row_, done)

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, jnp.bool_(False))
        )
        return (u, v, row4col, col4row)

    u = jnp.zeros((n,), jnp.float32)
    v = jnp.zeros((m,), jnp.float32)
    row4col = jnp.full((m,), -1, jnp.int32)
    col4row = jnp.full((n,), -1, jnp.int32)
    u, v, row4col, col4row = jax.lax.fori_loop(
        0, n, solve_row, (u, v, row4col, col4row)
    )
    return col4row, row4col


def hungarian_masked(
    cost: jnp.ndarray, valid_cols: jnp.ndarray, pad_value: float = 1e6
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Assignment over a fixed-size cost matrix where only some columns are
    real (static-shape replacement for the reference's variable GT counts).

    Invalid columns are given a large uniform cost so real columns are always
    preferred; the returned ``col4row`` may point at invalid columns for rows
    beyond the true column count — callers must mask with
    ``valid_cols[col4row]``.
    """
    cost = jnp.where(valid_cols[None, :], cost, pad_value)
    return hungarian(cost)
