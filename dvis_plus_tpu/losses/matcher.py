"""Hungarian matchers over static-shape padded targets, fully in-graph.

Re-designs the reference matchers
(``DVIS_Plus/mask2former_video/modeling/matcher.py``):

- ``VideoHungarianMatcher`` (:71) -> :func:`video_hungarian_match` — one
  assignment per clip over class + point-sampled sigmoid-CE + dice costs, with
  a single shared random point set (:126) so cost terms are MXU matmuls.
- ``VideoHungarianMatcher_Consistent`` (:198) -> :func:`consistent_match` —
  each GT is matched only in its first-appearance frame, matched queries are
  excluded from later frames (cost 1e6, :291) and the assignment is pinned for
  the whole clip.

Cost math runs in fp32 (the reference forces fp32 under autocast, :140-142).
Instead of the reference's per-sample python loop + scipy round-trip, costs are
batched with vmap and solved by the in-graph lax Hungarian.

Returned assignment is dense: ``query_for_gt[b, n]`` = query index matched to
GT slot n (meaningless where ``targets.valid`` is False — callers mask).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dvis_plus_tpu.ops.hungarian import hungarian
from dvis_plus_tpu.ops.point_sample import point_sample
from dvis_plus_tpu.losses.targets import VideoTargets

_PAD_COST = 1e6


class MatchCosts(NamedTuple):
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    num_points: int = 12544
    # LAP solver for the training matchers: "jv" = exact sequential JV
    # (reference scipy.linear_sum_assignment semantics, default); "auction" =
    # vectorized auction (ops/assignment.py) — wins big at high GT capacity
    # (v5e: 0.5 vs 14 ms/solve at 100x200) but its round count grows on
    # near-uniform costs. Exact on non-degenerate costs (tested vs jv).
    solver: str = "jv"


def solve_lap(C_T: jnp.ndarray, solver: str = "jv") -> jnp.ndarray:
    """row4col assignment minimizing C_T (rows=GT slots, cols=queries).

    For the auction path the sentinels are clipped to just above the
    valid-cost span first: auction's bid epsilon scales with the global span,
    so raw 1e6 pads would wash out real cost differences. The TWO sentinel
    tiers — invalid-GT rows (_PAD_COST) and pinned-query columns
    (2*_PAD_COST, consistent_match) — map to two distinct clipped levels so
    auction sees the same preference ordering as the JV path on
    pad-involved rows."""
    if solver == "auction":
        from dvis_plus_tpu.ops.assignment import auction_lap

        c = C_T.astype(jnp.float32)
        finite = c < _PAD_COST / 2
        tier2 = c >= 1.5 * _PAD_COST  # pinned columns (2 * _PAD_COST)
        vmax = jnp.max(jnp.where(finite, c, -jnp.inf))
        vmin = jnp.min(jnp.where(finite, c, jnp.inf))
        vmax = jnp.where(jnp.isfinite(vmax), vmax, 1.0)
        vmin = jnp.where(jnp.isfinite(vmin), vmin, 0.0)
        span = (vmax - vmin) + 1.0
        pad = vmax + span
        return auction_lap(jnp.where(finite, c, jnp.where(tier2, pad + span, pad)))
    q, _ = hungarian(C_T)
    return q


def batch_sigmoid_ce_cost(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (N, P) binary -> (Q, N) mean BCE cost (matcher.py:38-62)."""
    hw = src.shape[-1]
    pos = jax.nn.softplus(-src)  # BCE(x, 1)
    neg = jax.nn.softplus(src)  # BCE(x, 0)
    return (pos @ tgt.T + neg @ (1.0 - tgt).T) / hw


def batch_dice_cost(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (N, P) binary -> (Q, N) dice cost (matcher.py:15-30)."""
    probs = jax.nn.sigmoid(src)
    numerator = 2.0 * (probs @ tgt.T)
    denominator = probs.sum(-1)[:, None] + tgt.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def _pair_cost(
    logits: jnp.ndarray,  # (Q, K+1) fp32
    src_pts: jnp.ndarray,  # (Q, P) point-sampled mask logits, fp32
    labels: jnp.ndarray,  # (N,)
    tgt_pts: jnp.ndarray,  # (N, P) point-sampled binary targets
    costs: MatchCosts,
) -> jnp.ndarray:
    prob = jax.nn.softmax(logits, axis=-1)
    cost_class = -prob[:, labels]  # (Q, N)
    cost_mask = batch_sigmoid_ce_cost(src_pts, tgt_pts)
    cost_dice = batch_dice_cost(src_pts, tgt_pts)
    return (
        costs.mask_weight * cost_mask
        + costs.class_weight * cost_class
        + costs.dice_weight * cost_dice
    )


def _sample_pts(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """masks (M, T, H, W), coords (P, 2) -> (M, T*P) with the shared point set."""
    M, T = masks.shape[0], masks.shape[1]
    pts = point_sample(masks, coords[None, None])  # (M, T, P)
    return pts.reshape(M, -1)


def video_hungarian_match(
    rng: jax.Array,
    pred_logits: jnp.ndarray,  # (B, Q, K+1)
    pred_masks: jnp.ndarray,  # (B, Q, T, H, W)
    targets: VideoTargets,
    costs: MatchCosts = MatchCosts(),
) -> jnp.ndarray:
    """Clip-level matching. Returns query_for_gt (B, N) int32."""
    B, Q = pred_logits.shape[:2]
    N = targets.capacity

    assert Q >= N, f"need num_queries >= GT capacity, got Q={Q}, N={N}"

    def one(rng_b, logits, masks, labels, tmasks, valid):
        coords = jax.random.uniform(rng_b, (costs.num_points, 2), dtype=jnp.float32)
        src_pts = _sample_pts(masks, coords).astype(jnp.float32)
        tgt_pts = _sample_pts(tmasks, coords).astype(jnp.float32)
        C = _pair_cost(logits.astype(jnp.float32), src_pts, labels, tgt_pts, costs)
        # invalid GT slots get a uniform pad cost: they soak up leftover
        # queries without perturbing the real rows' optimum
        C = jnp.where(valid[None, :], C, _PAD_COST)
        q4g = solve_lap(C.T, costs.solver)  # (N,) -> query index per GT slot
        return q4g

    rngs = jax.random.split(rng, B)
    return jax.vmap(one)(
        rngs, pred_logits, pred_masks, targets.labels, targets.masks, targets.valid
    )


def consistent_match(
    rng: jax.Array,
    pred_logits: jnp.ndarray,  # (B, T, Q, K+1) per-frame logits
    pred_masks: jnp.ndarray,  # (B, T, Q, H, W) per-frame masks
    targets: VideoTargets,
    costs: MatchCosts = MatchCosts(),
) -> jnp.ndarray:
    """First-appearance-frame matching with query pinning (matcher.py:198-299).

    Returns query_for_gt (B, N) int32 — one assignment shared by all frames.
    """
    B, T, Q = pred_logits.shape[:3]
    N = targets.capacity

    def one(rng_b, logits_t, masks_t, labels, tmasks, valid, frame_valid):
        # first frame where each GT appears (T if never)
        first = jnp.argmax(frame_valid, axis=1)  # (N,) 0 if never valid
        first = jnp.where(valid & frame_valid.any(axis=1), first, T)

        used_q = jnp.zeros((Q,), jnp.bool_)
        q4g = jnp.full((N,), -1, jnp.int32)
        rngs = jax.random.split(rng_b, T)

        for f in range(T):  # static frame loop (T is small)
            cols = (first == f) & valid  # GTs to match at this frame
            coords = jax.random.uniform(rngs[f], (costs.num_points, 2), dtype=jnp.float32)
            src_pts = point_sample(masks_t[f], coords[None]).astype(jnp.float32)  # (Q, P)
            tgt_pts = point_sample(tmasks[:, f], coords[None]).astype(jnp.float32)  # (N, P)
            C = _pair_cost(logits_t[f].astype(jnp.float32), src_pts, labels, tgt_pts, costs)
            C = jnp.where(cols[None, :], C, _PAD_COST)  # only this frame's GTs
            C = jnp.where(used_q[:, None], 2.0 * _PAD_COST, C)  # pinned queries
            q4col = solve_lap(C.T, costs.solver)  # (N,) -> query per GT slot
            accept = cols & (C.T[jnp.arange(N), q4col] < _PAD_COST)
            q4g = jnp.where(accept, q4col, q4g)
            used_q = used_q.at[jnp.where(accept, q4col, Q)].set(True, mode="drop")
        return q4g

    rngs = jax.random.split(rng, B)
    return jax.vmap(one)(
        rngs,
        pred_logits,
        pred_masks,
        targets.labels,
        targets.masks,
        targets.valid,
        targets.frame_valid,
    )
