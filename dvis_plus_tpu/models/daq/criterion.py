"""DAQ criterion: per-frame losses with disappearance handling.

Re-designs ``DAQCriterion`` (``DVIS_DAQ/dvis_daq/criterion.py:85-320``):

- list-of-frames criterion: each frame's query set is supervised with its own
  matching (``tgt_for_query`` dense map here vs index pairs there);
- labels (:105-141): matched queries take their GT class; matched pairs whose
  GT is absent this frame or listed in ``disappeared`` are supervised to
  no-object (the DAQ disappearance signal); unmatched queries -> no-object;
  dead slots excluded entirely (static-capacity artifact);
- masks (:144-199): point-sampled sigmoid-CE + dice over matched pairs that
  are present and not disappeared; normalized by the total matched count
  across frames (psum'd by the caller across data shards).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.ops.point_sample import (
    point_sample,
    uncertain_point_coords_with_randomness,
)


def _frame_labels_loss(logits, tgt_for_query, labels, pair_ok, alive, cfg):
    """logits (S, K+1); pair_ok: matched pair supervises its class."""
    K = cfg.num_classes
    S = logits.shape[0]
    cls = jnp.where(
        pair_ok, labels[jnp.clip(tgt_for_query, 0, labels.shape[0] - 1)], K
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, cls[:, None], axis=-1)[:, 0]
    w = jnp.where(cls == K, cfg.eos_coef, 1.0) * alive.astype(jnp.float32)
    return jnp.sum(nll * w), jnp.sum(w)


def _frame_masks_loss(rng, masks, tgt_for_query, tgt_masks, pair_ok, cfg):
    """masks (S, H, W) logits; tgt_masks (N, Ht, Wt)."""
    S = masks.shape[0]
    N = tgt_masks.shape[0]
    src = masks.astype(jnp.float32)
    tidx = jnp.clip(tgt_for_query, 0, N - 1)
    tgt = tgt_masks[tidx]  # (S, Ht, Wt) bool

    coords = uncertain_point_coords_with_randomness(
        rng,
        jax.lax.stop_gradient(src),
        cfg.num_points,
        cfg.oversample_ratio,
        cfg.importance_sample_ratio,
    )
    pl = point_sample(src, coords)
    plab = point_sample(tgt, jax.lax.stop_gradient(coords))
    w = pair_ok.astype(jnp.float32)

    ce = jnp.maximum(pl, 0) - pl * plab + jax.nn.softplus(-jnp.abs(pl))
    loss_mask = jnp.sum(ce.mean(axis=1) * w)

    probs = jax.nn.sigmoid(pl)
    num = 2.0 * jnp.sum(probs * plab, axis=1)
    den = jnp.sum(probs, axis=1) + jnp.sum(plab, axis=1)
    dice = 1.0 - (num + 1.0) / (den + 1.0)
    loss_dice = jnp.sum(dice * w)
    return loss_mask, loss_dice


def daq_criterion(
    rng: jax.Array,
    outputs: List[Dict],  # per-frame dicts from the cutter
    targets,  # labels (N,), masks (N, T, H, W), frame_valid (N, T)
    frame_indices: Sequence[int],  # target frame index for each output
    cfg: CriterionConfig,
    num_masks: jnp.ndarray = None,
) -> Dict[str, jnp.ndarray]:
    N = targets.labels.shape[0]
    labels = targets.labels

    if num_masks is None:
        total = 0.0
        for out, fi in zip(outputs, frame_indices):
            t4q = out["tgt_for_query"]
            total = total + jnp.sum((t4q >= 0) & out["query_alive"])
        num_masks = jnp.maximum(total.astype(jnp.float32), 1.0)

    L = outputs[0]["pred_logits"].shape[0]
    losses: Dict[str, jnp.ndarray] = {}
    rngs = jax.random.split(rng, len(outputs) * L)

    for l in range(L):
        ce_sum, ce_w = 0.0, 0.0
        m_sum, d_sum = 0.0, 0.0
        for oi, (out, fi) in enumerate(zip(outputs, frame_indices)):
            t4q = out["tgt_for_query"]
            alive = out["query_alive"]
            matched = (t4q >= 0) & alive
            tclip = jnp.clip(t4q, 0, N - 1)
            present = targets.frame_valid[:, fi][tclip]
            disappeared = out["disappeared"][tclip]
            pair_ok = matched & present & ~disappeared

            c, w = _frame_labels_loss(
                out["pred_logits"][l], t4q, labels, pair_ok, alive, cfg
            )
            ce_sum, ce_w = ce_sum + c, ce_w + w
            m, d = _frame_masks_loss(
                rngs[oi * L + l],
                out["pred_masks"][l],
                t4q,
                targets.masks[:, fi],
                pair_ok,
                cfg,
            )
            m_sum, d_sum = m_sum + m, d_sum + d

        suffix = "" if l == L - 1 else f"_{l}"
        losses[f"loss_ce{suffix}"] = cfg.class_weight * ce_sum / jnp.maximum(ce_w, 1.0)
        losses[f"loss_mask{suffix}"] = cfg.mask_weight * m_sum / num_masks
        losses[f"loss_dice{suffix}"] = cfg.dice_weight * d_sum / num_masks
    return losses
