"""DVIS++ online meta-architecture: frozen segmenter + trainable referring
tracker.

Re-designs reference ``DVIS_Plus_online``
(``DVIS_Plus/dvis_Plus/meta_architecture.py:403-1064``):

- training forward (:591-696): segmenter under stop-gradient (frozen is also
  enforced by the optimizer mask), tracker over its embeds; segmenter
  predictions reordered by the tracker's per-frame alignment indices
  (reset_image_output_order :744-757) and used as ``matcher_outputs`` for the
  first half of training (:666-673); consistent (first-appearance) matching;
  ReID contrastive loss on pred_references (:674-676, get_cl_loss_ref);
- streaming inference (run_window_inference :774-816): caller chunks frames
  into windows and threads the TrackerState carry (the ``resume=True`` /
  ``keep`` protocol); post-processing (:758-772) = mean class logits over T,
  ids = arange(Q);
- task inference heads: vis top-K (:818-867), vps panoptic argmax + segment
  bookkeeping (:869-952), vss semantic einsum (:954-979). The probability/mask
  tensors are produced on device; the vps segment-id python loop stays on host
  exactly as in the reference.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import ModelConfig
from dvis_plus_tpu.losses.criterion import CriterionConfig, LayerOutputs, video_criterion
from dvis_plus_tpu.losses.reid import reid_loss
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.minvis import inference_video
from dvis_plus_tpu.models.segmenter.segmenter import Segmenter
from dvis_plus_tpu.models.tracker.referring_tracker import ReferringTracker, TrackerState


class DVISOnline(nn.Module):
    """Segmenter + referring tracker. Embed dim doubles with the ReID branch
    (reference from_config :556-559)."""

    cfg: ModelConfig

    def setup(self):
        self.segmenter = Segmenter(self.cfg)
        td = self.cfg.transformer_decoder
        tracker_dim = td.hidden_dim * (2 if td.reid_branch else 1)
        self.tracker = ReferringTracker(
            num_classes=self.cfg.num_classes,
            hidden_dim=tracker_dim,
            feedforward_dim=self.cfg.tracker.feedforward_dim,
            num_heads=self.cfg.tracker.num_heads,
            num_layers=self.cfg.tracker.num_layers,
            mask_dim=td.hidden_dim,
            noise_ratio=self.cfg.tracker.noise_ratio,
            noise_mode=self.cfg.tracker.noise_mode,
            matcher=self.cfg.tracker.matcher_solver,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # (B, T, H, W, 3) normalized
        state: Optional[TrackerState] = None,
        rng: Optional[jax.Array] = None,
        training: bool = False,
    ) -> Tuple[Dict[str, Any], Dict[str, Any], TrackerState]:
        B, T = images.shape[:2]
        seg_out = self.segmenter(images.reshape((B * T,) + images.shape[2:]))
        # frozen segmenter: grads never flow back (reference torch.no_grad :644)
        seg_out = jax.tree.map(jax.lax.stop_gradient, seg_out)

        C2 = seg_out["pred_embds"].shape[-1]
        frame_embds = seg_out["pred_embds"].reshape(B, T, -1, C2)
        frame_embds_nn = seg_out["pred_embds_without_norm"].reshape(B, T, -1, C2)
        mf = seg_out["mask_features"]
        mask_features = mf.reshape((B, T) + mf.shape[1:])

        track_out, new_state = self.tracker(
            frame_embds,
            mask_features,
            frame_embeds_no_norm=frame_embds_nn,
            state=state,
            rng=rng,
            training=training,
        )
        return seg_out, track_out, new_state


def reorder_image_outputs(
    seg_logits: jnp.ndarray,  # (B, T, Q, K+1)
    seg_masks: jnp.ndarray,  # (B, Q, T, H, W)
    indices: jnp.ndarray,  # (B, T, Q) tracker alignment: slot -> original query
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """reset_image_output_order (:744-757): gather segmenter predictions into
    tracker slot order so matcher guidance refers to the right queries."""
    logits = jnp.take_along_axis(seg_logits, indices[..., None], axis=2)
    masks_t = jnp.swapaxes(seg_masks, 1, 2)  # (B, T, Q, H, W)
    masks_t = jnp.take_along_axis(masks_t, indices[..., None, None], axis=2)
    return logits, jnp.swapaxes(masks_t, 1, 2)


def dvis_online_train_loss(
    rng: jax.Array,
    seg_out: Dict[str, Any],
    track_out: Dict[str, Any],
    targets: VideoTargets,
    ccfg: CriterionConfig,
    use_matcher_guidance: jnp.ndarray,  # scalar bool: iter < max_iter/2
    use_cl: bool = True,
    num_masks: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Consistent-matched losses (+ ReID CL) for the online stage."""
    B, N, T = targets.masks.shape[:3]
    ccfg = ccfg._replace(match_mode="frame_consistent")
    if num_masks is None:
        # reference counts instances once per frame entry (B*T target dicts)
        num_masks = jnp.maximum(
            targets.num_instances().sum().astype(jnp.float32) * T, 1.0
        )

    outputs = LayerOutputs(
        pred_logits=track_out["pred_logits"], pred_masks=track_out["pred_masks"]
    )
    aux = [
        LayerOutputs(pred_logits=lg, pred_masks=mk)
        for lg, mk in zip(track_out["aux_pred_logits"], track_out["aux_pred_masks"])
    ]

    Q = outputs.pred_logits.shape[2]
    seg_logits = seg_out["pred_logits"].reshape(B, T, Q, -1)
    seg_masks = seg_out["pred_masks"]
    seg_masks = seg_masks.reshape(B, T, Q, *seg_masks.shape[-2:]).swapaxes(1, 2)
    g_logits, g_masks = reorder_image_outputs(seg_logits, seg_masks, track_out["indices"])

    # Both matchings are computed in-graph; `use_matcher_guidance` selects which
    # assignment drives the losses (reference switches at max_iter//2, :666-673).
    rng_m, rng_l = jax.random.split(rng)
    from dvis_plus_tpu.losses.criterion import _match  # shared matcher entry

    q4g_guided = _match(
        rng_m, LayerOutputs(pred_logits=g_logits, pred_masks=g_masks), targets, ccfg
    )
    q4g_self = _match(rng_m, outputs, targets, ccfg)
    q4g = jnp.where(use_matcher_guidance, q4g_guided, q4g_self)

    from dvis_plus_tpu.losses.criterion import loss_labels, loss_masks

    losses: Dict[str, jnp.ndarray] = {}
    rngs = jax.random.split(rng_l, len(aux) + 1)
    losses["loss_ce"] = ccfg.class_weight * loss_labels(
        outputs.pred_logits, targets, q4g, ccfg
    )
    ml = loss_masks(rngs[0], outputs.pred_masks, targets, q4g, num_masks, ccfg)
    losses["loss_mask"] = ccfg.mask_weight * ml["loss_mask"]
    losses["loss_dice"] = ccfg.dice_weight * ml["loss_dice"]
    # In self-match mode the reference re-matches EVERY aux layer on its own
    # predictions (mask2former_video/modeling/criterion.py:242-249); only the
    # guided mode pins one assignment for all layers.
    aux_rngs = jax.random.split(rng_m, len(aux) + 1)
    for i, a in enumerate(aux):
        q4g_aux = jnp.where(
            use_matcher_guidance, q4g_guided, _match(aux_rngs[i], a, targets, ccfg)
        )
        losses[f"loss_ce_{i}"] = ccfg.class_weight * loss_labels(
            a.pred_logits, targets, q4g_aux, ccfg
        )
        ml = loss_masks(rngs[1 + i], a.pred_masks, targets, q4g_aux, num_masks, ccfg)
        losses[f"loss_mask_{i}"] = ccfg.mask_weight * ml["loss_mask"]
        losses[f"loss_dice_{i}"] = ccfg.dice_weight * ml["loss_dice"]

    if use_cl:
        cl = reid_loss(track_out["pred_references"], q4g, targets.valid)
        losses["loss_reid"] = 2.0 * cl["loss_reid"]
        losses["loss_aux_reid"] = 3.0 * cl["loss_aux_reid"]
    return losses


def online_post_processing(
    pred_logits: jnp.ndarray,  # (T, Q, K+1)
) -> jnp.ndarray:
    """Mean class logits over frames (:758-772). ids are arange(Q)."""
    return pred_logits.mean(axis=0)


# ---------------------------------------------------------------------------
# Task-specific inference heads
# ---------------------------------------------------------------------------


def inference_video_vis(
    mask_cls, mask_pred, img_size, output_size, padded_size, topk=20, aux_pred_cls=None
):
    """Top-K VIS extraction (:818-867). aux_pred_cls merges refiner/online
    logits via elementwise max of probabilities (:824-826)."""
    if aux_pred_cls is not None:
        scores = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
        aux = jax.nn.softmax(aux_pred_cls.astype(jnp.float32), axis=-1)[:, :-1]
        scores = scores.at[:, :-1].set(jnp.maximum(scores[:, :-1], aux))
        # re-express as logits-compatible input for the shared top-k path
        mask_cls = jnp.log(jnp.clip(scores, 1e-20, 1.0))
    return inference_video(mask_cls, mask_pred, img_size, output_size, padded_size, topk)


def semantic_inference(
    mask_cls: jnp.ndarray,  # (Q, K+1)
    mask_pred: jnp.ndarray,  # (Q, T, H4, W4)
    img_size: Tuple[int, int],
    output_size: Tuple[int, int],
    padded_size: Tuple[int, int],
    aux_pred_cls: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """VSS semantic map (:954-979): per-pixel argmax of qc,qthw->cthw."""
    probs = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[:, :-1]
    if aux_pred_cls is not None:
        aux = jax.nn.softmax(aux_pred_cls.astype(jnp.float32), axis=-1)[:, :-1]
        probs = jnp.maximum(probs, aux)
    Q, T = mask_pred.shape[:2]
    masks = jax.image.resize(
        mask_pred.astype(jnp.float32), (Q, T, *padded_size), method="bilinear"
    )
    masks = jax.nn.sigmoid(masks[:, :, : img_size[0], : img_size[1]])
    masks = jax.image.resize(masks, (Q, T, *output_size), method="bilinear")
    semseg = jnp.einsum("qc,qthw->cthw", probs, masks)
    return jnp.argmax(semseg, axis=0)  # (T, H, W)


def panoptic_probs(
    mask_cls: jnp.ndarray,
    mask_pred: jnp.ndarray,
    img_size: Tuple[int, int],
    output_size: Tuple[int, int],
    padded_size: Tuple[int, int],
    object_mask_threshold: float,
    aux_pred_cls: Optional[jnp.ndarray] = None,
):
    """Device part of VPS inference (:869-917): per-query scores/classes/keep
    plus upsampled sigmoid masks and the per-pixel argmax id map."""
    probs = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
    if aux_pred_cls is not None:
        aux = jax.nn.softmax(aux_pred_cls.astype(jnp.float32), axis=-1)[:, :-1]
        probs = probs.at[:, :-1].set(jnp.maximum(probs[:, :-1], aux))
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    K = mask_cls.shape[-1] - 1
    keep = (labels != K) & (scores > object_mask_threshold)

    Q, T = mask_pred.shape[:2]
    masks = jax.image.resize(
        mask_pred.astype(jnp.float32), (Q, T, *padded_size), method="bilinear"
    )
    masks = jax.nn.sigmoid(masks[:, :, : img_size[0], : img_size[1]])
    masks = jax.image.resize(masks, (Q, T, *output_size), method="bilinear")
    prob_masks = jnp.where(keep[:, None, None, None], scores[:, None, None, None] * masks, 0.0)
    mask_ids = jnp.argmax(prob_masks, axis=0)  # (T, H, W) query index per pixel
    return scores, labels, keep, masks, mask_ids


def panoptic_segments_host(
    scores: np.ndarray,
    labels: np.ndarray,
    keep: np.ndarray,
    masks: np.ndarray,  # (Q, T, H, W) sigmoid probs
    mask_ids: np.ndarray,  # (T, H, W)
    num_thing_classes: int,
    overlap_threshold: float,
):
    """Host-side segment bookkeeping (:918-952): stable segment ids, stuff
    merging, overlap filtering. Returns (panoptic_seg (T,H,W) int32,
    segments_infos, pred_ids)."""
    T, H, W = mask_ids.shape
    panoptic_seg = np.zeros((T, H, W), np.int32)
    segments_infos = []
    out_ids = []
    current_segment_id = 0
    stuff_memory: Dict[int, int] = {}
    for k in range(labels.shape[0]):
        if not keep[k]:
            continue
        pred_class = int(labels[k])
        isthing = pred_class < num_thing_classes
        mask_area = int((mask_ids == k).sum())
        original_area = int((masks[k] >= 0.5).sum())
        mask = (mask_ids == k) & (masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic_seg[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = current_segment_id + 1
            current_segment_id += 1
            panoptic_seg[mask] = current_segment_id
            segments_infos.append(
                {"id": current_segment_id, "isthing": bool(isthing), "category_id": pred_class}
            )
            out_ids.append(k)
    return panoptic_seg, segments_infos, out_ids
