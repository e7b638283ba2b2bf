"""DVIS++ offline meta-architecture: frozen segmenter + frozen tracker +
trainable temporal refiner.

Re-designs reference ``DVIS_Plus_offline``
(``DVIS_Plus/dvis_Plus/meta_architecture.py:1067-1580``):

- training forward (:1316-1376): segmenter (in 21-frame windows in the
  reference — here one jit region; window if HBM-bound) and tracker under
  stop-gradient, then the refiner over the whole clip; matching target is the
  (T*H, W)-flattened video "image" (frame_decoder_loss_reshape :1424-1444):
  clip-level Hungarian with num_points x T samples, dice over the whole video
  mask; refiner logits are temporally pooled so frame 0's logits are used
  (:1434);
- matcher guidance for the first half of training comes from the *tracker*
  outputs with time-averaged logits (:1349-1356, :1430);
- class-memory contrastive loss (get_cl_loss_with_memory :1502-1579) with the
  static ring-buffer ClassMemory;
- inference (run_window_inference :1446-1500): per window segmenter+tracker
  with carried TrackerState, embeds accumulated, then one refiner pass over
  the full video; final logits merge = elementwise max of refined and online
  class probabilities (aux_pred_cls path, :824-826 / :1377).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import ModelConfig
from dvis_plus_tpu.losses.criterion import (
    CriterionConfig,
    LayerOutputs,
    _match,
    loss_labels,
    loss_masks,
)
from dvis_plus_tpu.losses.reid import ClassMemory, reid_loss_with_memory
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.dvis_online import DVISOnline
from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner
from dvis_plus_tpu.models.tracker.referring_tracker import TrackerState


class DVISOffline(nn.Module):
    """Online stack + temporal refiner."""

    cfg: ModelConfig

    def setup(self):
        self.online = DVISOnline(self.cfg)
        td = self.cfg.transformer_decoder
        dim = td.hidden_dim * (2 if td.reid_branch else 1)
        self.refiner = TemporalRefiner(
            dtype=jnp.dtype(self.cfg.compute_dtype),
            num_classes=self.cfg.num_classes,
            hidden_dim=dim,
            feedforward_dim=self.cfg.refiner.feedforward_dim,
            num_heads=self.cfg.refiner.num_heads,
            num_layers=self.cfg.refiner.num_layers,
            mask_dim=td.hidden_dim,
            window=self.cfg.refiner.window_size,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # (B, T, H, W, 3)
        state: Optional[TrackerState] = None,
        rng: Optional[jax.Array] = None,
        training: bool = False,
    ):
        B, T = images.shape[:2]
        seg_out, track_out, new_state = self.online(
            images, state=state, rng=rng, training=False
        )
        # stages 1+2 are frozen (reference :1153-1155; also optimizer-masked)
        track_out = jax.tree.map(jax.lax.stop_gradient, track_out)

        C2 = seg_out["pred_embds_without_norm"].shape[-1]
        frame_embds = seg_out["pred_embds_without_norm"].reshape(B, T, -1, C2)
        mf = seg_out["mask_features"]
        mask_features = mf.reshape((B, T) + mf.shape[1:])
        # tracker mask_feature_proj is applied inside the tracker; the refiner
        # consumes the raw segmenter mask features (reference passes
        # mask_features straight through, :1345)
        refine_out = self.refiner(
            track_out["pred_embds"], frame_embds, mask_features, training=training
        )
        return seg_out, track_out, refine_out, new_state

    def online_step(
        self,
        images: jnp.ndarray,  # (B, T, H, W, 3)
        state: Optional[TrackerState] = None,
    ):
        """One streaming window of segmenter+tracker (run_window_inference
        :1446-1490): returns the pieces the final refiner pass needs."""
        B, T = images.shape[:2]
        seg_out, track_out, new_state = self.online(images, state=state)
        C2 = seg_out["pred_embds_without_norm"].shape[-1]
        frame_embds = seg_out["pred_embds_without_norm"].reshape(B, T, -1, C2)
        mf = seg_out["mask_features"]
        mask_features = mf.reshape((B, T) + mf.shape[1:])
        return (
            track_out["pred_logits"],  # online logits (aux class fusion)
            track_out["pred_embds"],  # instance embds
            frame_embds,
            mask_features,
            new_state,
        )

    def refine(self, instance_embeds, frame_embeds, mask_features):
        """Full-video refiner pass over accumulated window outputs (:1497)."""
        return self.refiner(instance_embeds, frame_embeds, mask_features, training=False)

    def refine_embeds(self, instance_embeds, frame_embeds, time_mask=None):
        """Embeds-only refiner pass (no mask features in HBM) — pair with
        :meth:`refine_mask_window` per time chunk; the TPU-native form of the
        reference's windowed mask prediction (refiner.py:169-194)."""
        return self.refiner.embed_pass(instance_embeds, frame_embeds, time_mask=time_mask)

    def refine_mask_window(self, mask_embed, mask_features):
        """Mask head on one time window (B, Tw, ...) -> (B, Q, Tw, H, W)."""
        return self.refiner.mask_window(mask_embed, mask_features)


def _flatten_clip(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., T, H, W) -> (..., 1, T*H, W): the reference's trick of treating a
    video as one tall image for matching/losses (:1424-1444)."""
    *lead, T, H, W = masks.shape
    return masks.reshape(*lead, 1, T * H, W)


def dvis_offline_train_loss(
    rng: jax.Array,
    track_out: Dict[str, Any],
    refine_out: Dict[str, Any],
    targets: VideoTargets,
    ccfg: CriterionConfig,
    use_matcher_guidance: jnp.ndarray,
    memory: Optional[ClassMemory] = None,
    use_cl: bool = True,
    num_masks: Optional[jnp.ndarray] = None,
) -> Tuple[Dict[str, jnp.ndarray], Optional[ClassMemory]]:
    B, N, T = targets.masks.shape[:3]
    ccfg = ccfg._replace(
        match_mode="clip", num_points=ccfg.num_points * T
    )  # num_points scaled by T (:1182-1186)
    if num_masks is None:
        num_masks = jnp.maximum(targets.num_instances().sum().astype(jnp.float32), 1.0)

    flat_targets = VideoTargets(
        labels=targets.labels,
        masks=_flatten_clip(targets.masks),
        valid=targets.valid,
        frame_valid=targets.valid[..., None],
    )

    def flat_layer(logits, masks):
        # refiner logits are per-frame duplicates of the pooled logits; frame 0
        # is representative (:1430-1434)
        return LayerOutputs(pred_logits=logits[:, 0], pred_masks=_flatten_clip(masks))

    outputs = flat_layer(refine_out["pred_logits"], refine_out["pred_masks"])
    aux = [
        flat_layer(lg, mk)
        for lg, mk in zip(refine_out["aux_pred_logits"], refine_out["aux_pred_masks"])
    ]

    guided = LayerOutputs(
        pred_logits=track_out["pred_logits"].mean(axis=1),  # (B, Q, K+1)
        pred_masks=_flatten_clip(track_out["pred_masks"]),
    )

    rng_m, rng_l = jax.random.split(rng)
    q4g_guided = _match(rng_m, guided, flat_targets, ccfg)
    q4g_self = _match(rng_m, outputs, flat_targets, ccfg)
    q4g = jnp.where(use_matcher_guidance, q4g_guided, q4g_self)

    losses: Dict[str, jnp.ndarray] = {}
    rngs = jax.random.split(rng_l, len(aux) + 1)
    losses["loss_ce"] = ccfg.class_weight * loss_labels(
        outputs.pred_logits, flat_targets, q4g, ccfg
    )
    ml = loss_masks(rngs[0], outputs.pred_masks, flat_targets, q4g, num_masks, ccfg)
    losses["loss_mask"] = ccfg.mask_weight * ml["loss_mask"]
    losses["loss_dice"] = ccfg.dice_weight * ml["loss_dice"]
    # self-match mode re-matches each aux layer (criterion.py:242-249)
    aux_rngs = jax.random.split(rng_m, len(aux) + 1)
    for i, a in enumerate(aux):
        q4g_aux = jnp.where(
            use_matcher_guidance,
            q4g_guided,
            _match(aux_rngs[i], a, flat_targets, ccfg),
        )
        losses[f"loss_ce_{i}"] = ccfg.class_weight * loss_labels(
            a.pred_logits, flat_targets, q4g_aux, ccfg
        )
        ml = loss_masks(rngs[1 + i], a.pred_masks, flat_targets, q4g_aux, num_masks, ccfg)
        losses[f"loss_mask_{i}"] = ccfg.mask_weight * ml["loss_mask"]
        losses[f"loss_dice_{i}"] = ccfg.dice_weight * ml["loss_dice"]

    new_memory = memory
    if use_cl and memory is not None:
        cl, new_memory = reid_loss_with_memory(
            refine_out["pred_embds"], q4g, targets.valid, targets.labels, memory
        )
        losses["loss_reid"] = 2.0 * cl["loss_reid"]
        losses["loss_aux_reid"] = 3.0 * cl["loss_aux_reid"]
    return losses, new_memory
