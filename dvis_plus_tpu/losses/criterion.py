"""Video set criterion: CE + point-sampled sigmoid-CE + dice with deep
supervision, over static padded targets.

Re-designs the reference ``VideoSetCriterion``
(``DVIS_Plus/mask2former_video/modeling/criterion.py:92-253``):

- ``loss_labels`` (:125): weighted cross-entropy where unmatched queries are
  supervised to the no-object class with weight ``eos_coef`` (0.1).
- ``loss_masks`` (:143): per (instance, frame) rows; importance point sampling
  (12544 pts, oversample 3.0, importance 0.75) from the *predicted* logits
  (stop-gradient), then sigmoid-CE (mean over points) and dice, each summed
  over rows / num_masks. num_masks = #instances (psum'd across data shards and
  divided by shard count, clamped to >= 1 — the reference's all_reduce at
  :232-234).
- ``matcher_outputs`` (:218-221): a different model's predictions can drive the
  matching (segmenter-guided early training of tracker/refiner).
- deep supervision (:242-249): aux layers re-matched per layer unless
  matcher-guided.

The whole thing is pure-functional and jit-compatible; assignments are dense
``query_for_gt`` maps from :mod:`dvis_plus_tpu.losses.matcher`.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from dvis_plus_tpu.losses.matcher import MatchCosts, consistent_match, video_hungarian_match
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.ops.point_sample import (
    point_sample,
    uncertain_point_coords_with_randomness,
)


class CriterionConfig(NamedTuple):
    num_classes: int
    eos_coef: float = 0.1
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    match_mode: str = "clip"  # clip | frame_consistent
    matcher_solver: str = "jv"  # jv (exact) | auction (TPU-fast; see MatchCosts)


class LayerOutputs(NamedTuple):
    """One decoder layer's predictions.

    pred_logits: (B, Q, K+1) clip-level, or (B, T, Q, K+1) per-frame.
    pred_masks: (B, Q, T, H, W).
    """

    pred_logits: jnp.ndarray
    pred_masks: jnp.ndarray


def _match(
    rng: jax.Array,
    outputs: LayerOutputs,
    targets: VideoTargets,
    cfg: CriterionConfig,
) -> jnp.ndarray:
    costs = MatchCosts(
        class_weight=cfg.class_weight,
        mask_weight=cfg.mask_weight,
        dice_weight=cfg.dice_weight,
        num_points=cfg.num_points,
        solver=cfg.matcher_solver,
    )
    if cfg.match_mode == "frame_consistent":
        assert outputs.pred_logits.ndim == 4, "consistent match needs per-frame logits"
        # per-frame masks: (B, Q, T, H, W) -> (B, T, Q, H, W)
        masks_t = jnp.swapaxes(outputs.pred_masks, 1, 2)
        return consistent_match(rng, outputs.pred_logits, masks_t, targets, costs)
    logits = outputs.pred_logits
    if logits.ndim == 4:  # collapse per-frame logits by mean prob for clip match
        logits = logits.mean(axis=1)
    return video_hungarian_match(rng, logits, outputs.pred_masks, targets, costs)


def loss_labels(
    pred_logits: jnp.ndarray,
    targets: VideoTargets,
    query_for_gt: jnp.ndarray,
    cfg: CriterionConfig,
) -> jnp.ndarray:
    """Weighted CE. pred_logits (B, Q, K+1) or (B, T, Q, K+1)."""
    K = cfg.num_classes
    B, N = targets.labels.shape
    per_frame = pred_logits.ndim == 4

    q_idx = jnp.where(targets.valid, query_for_gt, pred_logits.shape[-2])
    target_classes = jnp.full((B, pred_logits.shape[-2]), K, jnp.int32)
    target_classes = jax.vmap(
        lambda tc, qi, lb: tc.at[qi].set(lb, mode="drop")
    )(target_classes, q_idx, targets.labels)

    if per_frame:
        T = pred_logits.shape[1]
        target_classes = jnp.broadcast_to(target_classes[:, None], (B, T, target_classes.shape[-1]))

    logits = pred_logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = jnp.where(target_classes == K, cfg.eos_coef, 1.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def loss_masks(
    rng: jax.Array,
    pred_masks: jnp.ndarray,  # (B, Q, T, H, W)
    targets: VideoTargets,
    query_for_gt: jnp.ndarray,  # (B, N)
    num_masks: jnp.ndarray,  # scalar normalizer
    cfg: CriterionConfig,
) -> Dict[str, jnp.ndarray]:
    B, Q, T, H, W = pred_masks.shape
    N = targets.capacity

    # gather predicted masks for each GT slot -> (B, N, T, H, W)
    q_idx = jnp.clip(query_for_gt, 0, Q - 1)
    src = jax.vmap(lambda pm, qi: pm[qi])(pred_masks, q_idx)
    src = src.astype(jnp.float32).reshape(B * N * T, H, W)
    TH, TW = targets.masks.shape[-2:]
    tgt = targets.masks.reshape(B * N * T, TH, TW)  # bool ok; cast post-gather
    row_valid = jnp.broadcast_to(targets.valid[..., None], (B, N, T)).reshape(-1)

    coords = uncertain_point_coords_with_randomness(
        rng,
        jax.lax.stop_gradient(src),
        cfg.num_points,
        cfg.oversample_ratio,
        cfg.importance_sample_ratio,
    )
    point_logits = point_sample(src, coords)  # (BNT, P)
    point_labels = point_sample(tgt, jax.lax.stop_gradient(coords))

    w = row_valid.astype(jnp.float32)
    # sigmoid CE, mean over points per row, sum over valid rows / num_masks
    ce = jnp.maximum(point_logits, 0) - point_logits * point_labels + jax.nn.softplus(
        -jnp.abs(point_logits)
    )
    loss_mask = jnp.sum(ce.mean(axis=1) * w) / num_masks

    probs = jax.nn.sigmoid(point_logits)
    numerator = 2.0 * jnp.sum(probs * point_labels, axis=1)
    denominator = jnp.sum(probs, axis=1) + jnp.sum(point_labels, axis=1)
    dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    loss_dice = jnp.sum(dice * w) / num_masks

    return {"loss_mask": loss_mask, "loss_dice": loss_dice}


def video_criterion(
    rng: jax.Array,
    outputs: LayerOutputs,
    aux_outputs: Sequence[LayerOutputs],
    targets: VideoTargets,
    cfg: CriterionConfig,
    matcher_outputs: Optional[LayerOutputs] = None,
    num_masks: Optional[jnp.ndarray] = None,
    ret_match_result: bool = False,
):
    """Full criterion over final + aux layers.

    Returns (losses dict, query_for_gt) — losses keyed loss_ce / loss_mask /
    loss_dice (+ _{i} suffixes for aux layers, reference :248).
    ``num_masks`` should already be globally normalized by the caller (psum
    over the data mesh axis / axis size); defaults to the local count.
    """
    if num_masks is None:
        num_masks = jnp.maximum(targets.num_instances().sum().astype(jnp.float32), 1.0)

    match_from = matcher_outputs if matcher_outputs is not None else outputs
    rngs = jax.random.split(rng, 2 * (len(aux_outputs) + 1))
    q4g = _match(rngs[0], match_from, targets, cfg)

    losses: Dict[str, jnp.ndarray] = {}
    losses["loss_ce"] = cfg.class_weight * loss_labels(
        outputs.pred_logits, targets, q4g, cfg
    )
    ml = loss_masks(rngs[1], outputs.pred_masks, targets, q4g, num_masks, cfg)
    losses["loss_mask"] = cfg.mask_weight * ml["loss_mask"]
    losses["loss_dice"] = cfg.dice_weight * ml["loss_dice"]

    for i, aux in enumerate(aux_outputs):
        if matcher_outputs is None:
            q4g_i = _match(rngs[2 + 2 * i], aux, targets, cfg)
        else:
            q4g_i = q4g
        losses[f"loss_ce_{i}"] = cfg.class_weight * loss_labels(
            aux.pred_logits, targets, q4g_i, cfg
        )
        ml = loss_masks(rngs[3 + 2 * i], aux.pred_masks, targets, q4g_i, num_masks, cfg)
        losses[f"loss_mask_{i}"] = cfg.mask_weight * ml["loss_mask"]
        losses[f"loss_dice_{i}"] = cfg.dice_weight * ml["loss_dice"]

    if ret_match_result:
        return losses, q4g
    return losses, q4g
