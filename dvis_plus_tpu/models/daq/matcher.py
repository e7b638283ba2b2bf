"""DAQ matchers over static padded targets, in-graph.

Re-designs ``DVIS_DAQ/dvis_daq/matcher.py``:

- :func:`frame_match` — ``FrameMatcher`` (:182-281): plain per-frame Hungarian
  on class+mask+dice costs restricted to valid GT instances, plus (a) an
  ``aux`` assignment giving every query its argmin-cost GT (matched queries
  keep their Hungarian GT) and (b) a query validity mask = matched OR
  max class prob > select_thr;
- :func:`new_ins_match` — ``NewInsHungarianMatcher`` (:65-181): only *newly
  appeared* GT instances (valid now, not tracked before) may match, and only
  to the trailing ``num_new_ins`` detection queries; previously tracked GTs
  keep their track-query assignment.

Dense representation: ``tgt_for_query (S,) int32`` (-1 = unmatched) instead of
index-pair lists.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dvis_plus_tpu.losses.matcher import MatchCosts, _pair_cost
from dvis_plus_tpu.ops.hungarian import hungarian
from dvis_plus_tpu.losses.matcher import solve_lap
from dvis_plus_tpu.ops.point_sample import point_sample

_PAD = 1e6


def _frame_cost(
    rng: jax.Array,
    logits: jnp.ndarray,  # (S, K+1)
    masks: jnp.ndarray,  # (S, H, W)
    labels: jnp.ndarray,  # (N,)
    tgt_masks: jnp.ndarray,  # (N, H, W)
    costs: MatchCosts,
) -> jnp.ndarray:
    coords = jax.random.uniform(rng, (costs.num_points, 2), dtype=jnp.float32)
    src_pts = point_sample(masks, coords[None]).astype(jnp.float32)
    tgt_pts = point_sample(tgt_masks, coords[None]).astype(jnp.float32)
    return _pair_cost(logits.astype(jnp.float32), src_pts, labels, tgt_pts, costs)


class FrameMatchResult(NamedTuple):
    tgt_for_query: jnp.ndarray  # (S,) matched GT slot or -1
    aux_tgt_for_query: jnp.ndarray  # (S,) argmin-cost GT for every query
    query_valid: jnp.ndarray  # (S,) bool


def frame_match(
    rng: jax.Array,
    logits: jnp.ndarray,  # (S, K+1)
    masks: jnp.ndarray,  # (S, H, W)
    labels: jnp.ndarray,  # (N,)
    tgt_masks: jnp.ndarray,  # (N, H, W)
    valid_inst: jnp.ndarray,  # (N,) GT present in this frame
    select_thr: float,
    costs: MatchCosts = MatchCosts(),
) -> FrameMatchResult:
    S = logits.shape[0]
    N = labels.shape[0]
    C = _frame_cost(rng, logits, masks, labels, tgt_masks, costs)
    C = jnp.where(valid_inst[None, :], C, _PAD)

    q4g = solve_lap(C.T, costs.solver)  # (N,) -> query
    tgt_for_query = jnp.full((S,), -1, jnp.int32)
    tgt_for_query = tgt_for_query.at[jnp.where(valid_inst, q4g, S)].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )

    aux = jnp.argmin(C, axis=1).astype(jnp.int32)  # (S,)
    aux = jnp.where(tgt_for_query >= 0, tgt_for_query, aux)

    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    score = prob[:, :-1].max(axis=1)
    query_valid = (tgt_for_query >= 0) | (score > select_thr)
    return FrameMatchResult(tgt_for_query, aux, query_valid)


def new_ins_match(
    rng: jax.Array,
    logits: jnp.ndarray,  # (S, K+1) current (track slots + new-ins) queries
    masks: jnp.ndarray,  # (S, H, W)
    labels: jnp.ndarray,  # (N,)
    tgt_masks: jnp.ndarray,  # (N, H, W)
    valid_inst: jnp.ndarray,  # (N,)
    tgt_for_track: jnp.ndarray,  # (S,) GT currently held by each track slot (-1)
    num_new_ins: int,
    costs: MatchCosts = MatchCosts(),
) -> jnp.ndarray:
    """Returns tgt_for_query (S,): track slots keep their GT; new GTs matched
    among the last ``num_new_ins`` queries only."""
    S = logits.shape[0]
    N = labels.shape[0]
    tracked = jnp.zeros((N,), bool).at[
        jnp.where(tgt_for_track >= 0, tgt_for_track, N)
    ].set(True, mode="drop")
    new_inst = valid_inst & ~tracked

    C = _frame_cost(rng, logits, masks, labels, tgt_masks, costs)
    C = jnp.where(new_inst[None, :], C, _PAD)
    is_new_row = jnp.arange(S) >= (S - num_new_ins)
    C = jnp.where(is_new_row[:, None], C, _PAD)

    q4g = solve_lap(C.T, costs.solver)  # (N,) -> query
    accept = new_inst & (C.T[jnp.arange(N), q4g] < _PAD / 2)
    tgt_for_query = tgt_for_track
    tgt_for_query = tgt_for_query.at[jnp.where(accept, q4g, S)].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    return tgt_for_query
