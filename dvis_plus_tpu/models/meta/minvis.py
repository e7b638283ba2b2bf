"""MinVIS meta-architecture: frame-independent segmenter + post-hoc query
matching on embeddings.

Re-designs reference ``MinVIS`` (``DVIS_Plus/dvis_Plus/meta_architecture.py:23-401``):

- training (:199-215 + frame_decoder_loss_reshape :233-253): every frame is an
  independent matching/loss problem — frames fold into the batch dim and the
  criterion runs with T=1 clips; all clip instances (present or absent) are
  candidates in every frame, exactly like the reference's per-frame target
  dicts.
- inference post-processing (:266-301): frame-by-frame Hungarian alignment on
  cosine similarity of query embeddings (match_from_embds :255-264), aligning
  every frame to the previous one, then mean class logits over frames. Here
  it is a jitted ``lax.scan`` with the in-graph Hungarian — no host round
  trips (the reference crosses to scipy per frame).
- ``inference_video`` (:364-401): softmax scores w/o background, flat top-K
  over (Q x K) pairs, masks resized and thresholded at 0.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dvis_plus_tpu.losses.criterion import CriterionConfig, LayerOutputs, video_criterion
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.ops.assignment import auction_lap


def frame_fold_targets(targets: VideoTargets) -> VideoTargets:
    """(B, N, T, ...) clip targets -> (B*T, N, 1, ...) per-frame targets.

    Mirrors frame_decoder_loss_reshape (:243-253): labels/valid are clip-level
    (absent instances still match with empty masks).
    """
    B, N, T = targets.frame_valid.shape
    masks = jnp.swapaxes(targets.masks, 1, 2).reshape(B * T, N, 1, *targets.masks.shape[-2:])
    labels = jnp.repeat(targets.labels, T, axis=0)
    valid = jnp.repeat(targets.valid, T, axis=0)
    frame_valid = jnp.swapaxes(targets.frame_valid, 1, 2).reshape(B * T, N, 1)
    return VideoTargets(labels=labels, masks=masks, valid=valid, frame_valid=frame_valid)


def minvis_train_loss(
    rng: jax.Array,
    decoder_out: Dict[str, jnp.ndarray],  # per-frame dict from the segmenter
    targets: VideoTargets,
    cfg: CriterionConfig,
    num_masks: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-frame matching + losses. decoder_out tensors lead with BT."""
    ft = frame_fold_targets(targets)
    # num_masks follows the reference: #instances x #frames entries... actually
    # the reference counts len(labels) per frame-target, i.e. N_real per frame
    if num_masks is None:
        num_masks = jnp.maximum(ft.num_instances().sum().astype(jnp.float32), 1.0)

    def to_layer(lg, mk):
        return LayerOutputs(pred_logits=lg, pred_masks=mk[:, :, None])

    outputs = to_layer(decoder_out["pred_logits"], decoder_out["pred_masks"])
    aux = [
        to_layer(lg, mk)
        for lg, mk in zip(decoder_out["aux_pred_logits"], decoder_out["aux_pred_masks"])
    ]
    losses, _ = video_criterion(rng, outputs, aux, ft, cfg, num_masks=num_masks)
    return losses


def match_from_embds(
    tgt_embds: jnp.ndarray, cur_embds: jnp.ndarray, solver: str = "jv"
) -> jnp.ndarray:
    """Cosine-cost Hungarian permutation aligning current queries to targets.

    Returns indices such that ``cur[indices]`` aligns with ``tgt``
    (reference match_from_embds :362-371 — scipy on (1 - cos_sim)^T, here the
    in-graph solver on the same cost). ``jv`` (default) is the exact solver
    with reference scipy semantics (oracle-verified,
    tests/test_postproc_reference_parity.py); ``auction`` is the vectorized
    approximate solver — faster at large Q but can pick a different
    permutation on near-degenerate costs.
    """
    cur = cur_embds / (jnp.linalg.norm(cur_embds, axis=1, keepdims=True) + 1e-12)
    tgt = tgt_embds / (jnp.linalg.norm(tgt_embds, axis=1, keepdims=True) + 1e-12)
    cost = 1.0 - tgt @ cur.T  # (Q_tgt, Q_cur)
    if solver == "auction":
        return auction_lap(cost)  # row t -> current query index
    from dvis_plus_tpu.ops.hungarian import hungarian

    return hungarian(cost)[0]


def minvis_alignment(
    pred_logits: jnp.ndarray,  # (T, Q, K+1)
    pred_embds: jnp.ndarray,  # (T, Q, C)
    valid: Optional[jnp.ndarray] = None,  # (T,) bool; False = padded frame
    solver: str = "jv",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-by-frame embedding alignment WITHOUT touching the masks:
    returns (mean logits (Q, K+1), per-frame permutations (T, Q)) where
    ``perms[t]`` reorders frame t's queries into the aligned (frame-0) query
    order — ``aligned_masks[t] = masks[t][perms[t]]``. Splitting the masks
    out keeps the O(T·Q·H·W) tensor off the device during alignment so long
    videos page it through host memory window by window."""

    def step(carry, xs):
        prev_embds = carry
        logits, embds = xs
        # matching runs against the PREVIOUS frame's aligned embds, so idx
        # maps frame t's raw query order straight into the global order
        idx = match_from_embds(prev_embds, embds, solver=solver)
        return embds[idx], (logits[idx], idx)

    Q = pred_embds.shape[1]
    eye = jnp.arange(Q)
    _, (logits_rest, perms_rest) = jax.lax.scan(
        step,
        pred_embds[0],
        (pred_logits[1:], pred_embds[1:]),
    )
    logits_all = jnp.concatenate([pred_logits[:1], logits_rest], axis=0)
    perms = jnp.concatenate([eye[None], perms_rest], axis=0)
    if valid is None:
        mean_logits = logits_all.mean(axis=0)
    else:
        w = valid.astype(logits_all.dtype)[:, None, None]
        mean_logits = (logits_all * w).sum(axis=0) / jnp.maximum(w.sum(), 1.0)
    return mean_logits, perms


def minvis_post_processing(
    pred_logits: jnp.ndarray,  # (T, Q, K+1)
    pred_masks: jnp.ndarray,  # (T, Q, H, W)
    pred_embds: jnp.ndarray,  # (T, Q, C)
    valid: Optional[jnp.ndarray] = None,  # (T,) bool; False = padded frame
    solver: str = "jv",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-by-frame embedding alignment; returns (mean logits (Q, K+1),
    aligned masks (Q, T, H, W)). ``valid`` supports length-bucketed padding:
    the class mean runs over true frames only (alignment is a causal scan, so
    trailing pad frames never affect real frames). ``solver``: see
    :func:`match_from_embds` (jit callers must treat it as static)."""
    mean_logits, perms = minvis_alignment(pred_logits, pred_embds, valid, solver)
    masks_all = jnp.take_along_axis(
        pred_masks, perms[:, :, None, None], axis=1
    )
    return mean_logits, jnp.swapaxes(masks_all, 0, 1)


class VideoInference(NamedTuple):
    scores: jnp.ndarray  # (topk,)
    labels: jnp.ndarray  # (topk,)
    masks: jnp.ndarray  # (topk, T, H_out, W_out) bool


def topk_select(
    mask_cls: jnp.ndarray,  # (Q, K+1)
    topk: int,
    aux_pred_cls: Optional[jnp.ndarray] = None,  # (Q, K+1) online aux logits
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flat top-K over the (Q x K) score matrix (reference inference_video
    :364-380). Returns (scores, labels, query indices), each (topk,).
    ``aux_pred_cls``: element-wise max of the two softmaxes WITHOUT
    renormalization (inference_video_vis :824-826)."""
    Q, K1 = mask_cls.shape
    K = K1 - 1
    topk = min(topk, Q * K)  # small vocabularies / few queries
    scores = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[:, :-1]  # (Q, K)
    if aux_pred_cls is not None:
        aux = jax.nn.softmax(aux_pred_cls.astype(jnp.float32), axis=-1)[:, :-1]
        scores = jnp.maximum(scores, aux)
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, topk)
    return top_scores, top_idx % K, top_idx // K


def upsample_masks(
    masks: jnp.ndarray,  # (N, t, H4, W4) mask logits
    img_size: Tuple[int, int],
    output_size: Tuple[int, int],
    padded_size: Tuple[int, int],
) -> jnp.ndarray:
    """Two-stage upsampling (reference inference_video :381-398: resize to
    the padded model input, crop the valid region, resize to the original
    resolution); returns (N, t, out_h, out_w) bool (> 0 threshold)."""
    N, t = masks.shape[:2]
    masks = masks.astype(jnp.float32)
    masks = jax.image.resize(
        masks, (N, t, padded_size[0], padded_size[1]), method="bilinear"
    )
    masks = masks[:, :, : img_size[0], : img_size[1]]
    masks = jax.image.resize(
        masks, (N, t, output_size[0], output_size[1]), method="bilinear"
    )
    return masks > 0.0


def inference_video(
    mask_cls: jnp.ndarray,  # (Q, K+1)
    mask_pred: jnp.ndarray,  # (Q, T, H4, W4)
    img_size: Tuple[int, int],  # valid region within padded canvas (model scale)
    output_size: Tuple[int, int],  # original video resolution
    padded_size: Tuple[int, int],  # padded model input resolution
    topk: int = 10,
    aux_pred_cls: Optional[jnp.ndarray] = None,  # (Q, K+1) online aux logits
) -> VideoInference:
    """Top-K instance extraction + two-stage mask upsampling (reference
    inference_video :364-401). One-shot variant: materializes the full
    (topk, T, out_h, out_w) tensor — fine for short clips/tests; the eval
    drivers use :func:`dvis_plus_tpu.engine.inference.paged_inference_video`
    which pages the upsampling per time chunk for real video lengths."""
    top_scores, top_labels, top_queries = topk_select(mask_cls, topk, aux_pred_cls)
    masks = upsample_masks(
        mask_pred[top_queries], img_size, output_size, padded_size
    )
    return VideoInference(scores=top_scores, labels=top_labels, masks=masks)
