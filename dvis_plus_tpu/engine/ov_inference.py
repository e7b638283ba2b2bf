"""OV-DVIS++ inference driver: windowed forward + geometric-ensemble logits.

Re-designs the reference OV eval path (``ov_dvis/meta_architecture_ov.py``:
per-frame mask-pooled CLIP out-of-vocab logits + geometric ensemble + void
renormalization :566-645, then MinVIS post-processing / tracker outputs):

- windows stream through the jitted forward with the per-dataset text
  classifier closed over as arrays;
- per window the predicted masks pool the dense CLIP features
  (``pool_clip``), the ensemble runs per frame, and fused log-probs
  accumulate;
- video-level logits = mean of the true frames' log-probs (the reference
  post_processing means the per-frame log-prob matrix — a geometric mean of
  frame probabilities, :1482-1489); masks -> shared ``inference_video``
  top-K path (no aux fusion anywhere in OV, :1344/:2148).
"""
from __future__ import annotations

import logging
from typing import Dict, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.meta.ov import ov_ensemble_inference
from dvis_plus_tpu.models.tracker.referring_tracker import init_tracker_state

logger = logging.getLogger(__name__)


def ov_video_logits_masks_fn(
    cfg: Config,
    model,
    params,
    text_classifier,
    num_templates: Sequence[int],
    category_overlapping,
    void_index=None,  # private void row for this dataset (None = merged row)
):
    """Returns ``f(images) -> (fused_logits, masks)`` — the OV ensemble twin
    of ``engine.inference.video_logits_masks`` — for use by any task driver
    (VIS top-K, VPS panoptic, VSS semantic; reference OV routes all three
    off the same ensembled logits, meta_architecture_ov.py:184-188)."""
    arch = cfg.model.meta_architecture
    from dvis_plus_tpu.engine.inference import resolve_window_size

    W_sz = resolve_window_size(cfg)
    tc = jnp.asarray(text_classifier)
    nt = tuple(num_templates)
    overlap = jnp.asarray(category_overlapping)
    alpha = cfg.model.ov.geometric_ensemble_alpha
    beta = cfg.model.ov.geometric_ensemble_beta
    fns: Dict = {}

    def f(images):
        if arch in ("minvis", "minvis_ov", "ctvis"):
            return _minvis_ov_video(
                cfg, model, params, images, fns, W_sz, tc, nt, overlap, alpha,
                beta, void_index
            )
        if arch in ("dvis_online", "dvis_online_ov"):
            return _online_ov_video(
                cfg, model, params, images, fns, W_sz, tc, nt, overlap, alpha,
                beta, void_index
            )
        return _offline_ov_video(
            cfg, model, params, images, fns, W_sz, tc, nt, overlap, alpha,
            beta, void_index
        )

    return f


def run_ov_inference(
    cfg: Config,
    model,
    params,
    loader: Iterator[dict],
    evaluator,
    text_classifier: np.ndarray,
    num_templates: Sequence[int],
    category_overlapping: np.ndarray,  # (K,) 1 = seen in training vocab
    void_index=None,
):
    from dvis_plus_tpu.engine.inference import (
        paged_inference_video,
        resolve_window_size,
    )

    topk = cfg.test.max_num
    logits_masks = ov_video_logits_masks_fn(
        cfg, model, params, text_classifier, num_templates, category_overlapping,
        void_index=void_index,
    )

    for sample in loader:
        images = sample["images"]
        T, H, W = images.shape[:3]
        logits, masks = logits_masks(images)
        masks = masks[:, :T]
        h, w = [int(v) for v in sample["image_size"]]
        # time-chunked top-K upsampling (inference.paged_inference_video):
        # the (topk, T, out_h, out_w) tensor never materializes on device
        scores, labels, out_masks = paged_inference_video(
            jnp.asarray(logits),
            masks,
            img_size=(h, w),
            output_size=(int(sample["height"]), int(sample["width"])),
            padded_size=(H, W),
            topk=topk,
            chunk=resolve_window_size(cfg),
            # run boundaries / packed bits straight into the evaluator's RLE
            download=getattr(cfg.test, "mask_download", "runs"),
            k_col=getattr(cfg.test, "rle_col_k", 8),
        )
        evaluator.process(
            sample.get("video_id", 0),
            {
                "pred_scores": np.asarray(scores).tolist(),
                "pred_labels": np.asarray(labels).tolist(),
                "pred_masks": out_masks,
            },
        )


def _pad_to(images: np.ndarray, pad_T: int) -> np.ndarray:
    T = images.shape[0]
    if T == pad_T:
        return images
    return np.concatenate([images, np.repeat(images[-1:], pad_T - T, axis=0)], 0)


def _minvis_ov_video(cfg, model, params, images, fns, W_sz, tc, nt, overlap, alpha, beta, vi=None):
    """MinVIS_OV: per-frame ensemble BEFORE embed matching (reference
    :566-645 then post_processing)."""
    if "win" not in fns:

        @jax.jit
        def win(params, imgs):
            out = model.apply(params, imgs, tc, nt, vi)
            pooled = model.apply(
                params, out["clip_vis_dense"], out["pred_masks"],
                method=type(model).pool_clip,
            )
            scale = model.apply(params, method=type(model).clip_logit_scale)
            tc_full = model.apply(
                params, tc, vi, method=type(model).full_classifier
            )
            fused = ov_ensemble_inference(
                out["pred_logits"], pooled, tc_full, nt, scale, overlap, alpha, beta
            )
            return fused, out["pred_masks"], out["pred_embds"]

        fns["win"] = win
    win = fns["win"]

    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz
    images = _pad_to(images, n_windows * W_sz)

    # long videos: page window masks to host fp16 beyond the HBM budget and
    # align host-side with the per-frame permutations (see
    # inference._minvis_video)
    from dvis_plus_tpu.engine.inference import (
        _bucket_windows,
        _pad_time_replicate,
        eval_mask_budget_bytes,
    )

    Him, Wim = images.shape[1:3]
    Q = cfg.model.transformer_decoder.num_queries
    mask_bytes = n_windows * W_sz * Q * (Him // 4) * (Wim // 4) * 4
    page_to_host = mask_bytes > eval_mask_budget_bytes(cfg)

    lg, mk, em = [], [], []
    for i in range(n_windows):
        a, b, c = win(params, jnp.asarray(images[i * W_sz : (i + 1) * W_sz]))
        lg.append(a)
        mk.append(np.asarray(b, np.float16) if page_to_host else b)
        em.append(c)

    # length-bucketed post-processing (see inference._bucket_windows)
    Tb = _bucket_windows(n_windows) * W_sz
    logits = _pad_time_replicate(jnp.concatenate(lg, 0), T, Tb, 0)
    embds = _pad_time_replicate(jnp.concatenate(em, 0), T, Tb, 0)
    valid = jnp.arange(Tb) < T

    if page_to_host:
        from dvis_plus_tpu.models.meta.minvis import minvis_alignment

        if "minvis_align" not in fns:
            fns["minvis_align"] = jax.jit(
                minvis_alignment, static_argnames=("solver",)
            )
        mean_logits, perms = fns["minvis_align"](
            logits, embds, valid, solver=cfg.model.tracker.matcher_solver
        )
        perms = np.asarray(perms)
        masks_host = np.concatenate(mk, axis=0)[:T]  # (T, Q, H4, W4) fp16
        aligned = np.take_along_axis(
            masks_host, perms[:T, :, None, None], axis=1
        ).transpose(1, 0, 2, 3)
        return mean_logits, aligned

    from dvis_plus_tpu.models.meta.minvis import minvis_post_processing

    masks = _pad_time_replicate(jnp.concatenate(mk, 0), T, Tb, 0)
    if "minvis_pp" not in fns:
        fns["minvis_pp"] = jax.jit(
            minvis_post_processing, static_argnames=("solver",)
        )
    mean_logits, aligned = fns["minvis_pp"](
        logits, masks, embds, valid, solver=cfg.model.tracker.matcher_solver
    )
    return mean_logits, aligned


def _online_ov_video(cfg, model, params, images, fns, W_sz, tc, nt, overlap, alpha, beta, vi=None):
    """DVIS_online_OV: tracker logits ensemble per frame with CLIP pooling
    under the tracker's masks; carry streams across windows."""
    if "win" not in fns:

        @jax.jit
        def win(params, imgs, state):
            seg_out, track_out, new_state = model.apply(
                params, imgs[None], tc, nt, state=state, void_index=vi
            )
            t_logits = track_out["pred_logits"][0]  # (Tw, Q, K+1)
            t_masks = track_out["pred_masks"][0]  # (Q, Tw, H4, W4)
            masks_tq = jnp.swapaxes(t_masks, 0, 1)  # (Tw, Q, H4, W4)
            pooled = model.apply(
                params, seg_out["clip_vis_dense"], masks_tq,
                method=type(model).pool_clip,
            )
            scale = model.apply(params, method=type(model).clip_logit_scale)
            tc_full = model.apply(
                params, tc, vi, method=type(model).full_classifier
            )
            fused = ov_ensemble_inference(
                t_logits, pooled, tc_full, nt, scale, overlap, alpha, beta
            )
            return fused, t_masks, new_state

        fns["win"] = win
    win = fns["win"]

    td = cfg.model.transformer_decoder
    state = init_tracker_state(
        1, td.num_queries, td.hidden_dim, jnp.dtype(cfg.model.compute_dtype)
    )
    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz
    images = _pad_to(images, n_windows * W_sz)

    from dvis_plus_tpu.engine.inference import eval_mask_budget_bytes

    Him, Wim = images.shape[1:3]
    Q = cfg.model.transformer_decoder.num_queries
    mask_bytes = n_windows * W_sz * Q * (Him // 4) * (Wim // 4) * 4
    page_to_host = mask_bytes > eval_mask_budget_bytes(cfg)

    lg, mk = [], []
    for i in range(n_windows):
        a, b, state = win(params, jnp.asarray(images[i * W_sz : (i + 1) * W_sz]), state)
        lg.append(a)
        mk.append(np.asarray(b, np.float16) if page_to_host else b)
    logits = jnp.concatenate(lg, 0)[:T]  # (T, Q, K+1) fused log-probs
    if page_to_host:
        masks = np.concatenate(mk, 1)  # (Q, T', H4, W4) host fp16
    else:
        masks = jnp.concatenate(mk, 1)  # (Q, T', H4, W4)
    # video-level logits = MEAN OF LOG-probs over the true frames (the
    # reference post_processing means the per-frame log-prob matrix,
    # meta_architecture_ov.py:1327 + :1482-1489 — a geometric mean of the
    # frame probabilities, renormalized by the downstream softmax)
    return logits.astype(jnp.float32).mean(axis=0), masks


def _offline_ov_video(cfg, model, params, images, fns, W_sz, tc, nt, overlap, alpha, beta, vi=None):
    """DVIS_offline_OV: online streaming + OV refiner. The refiner's video
    -level in-vocab head uses window-accumulated mask pooling (embed_pass +
    ov_classify); out-of-vocab CLIP pooling runs per frame under the refined
    masks; ensemble per frame, mean over frames."""
    if "win" not in fns:

        @jax.jit
        def win(params, imgs, state):
            seg_out, track_out, new_state = model.apply(
                params, imgs[None], tc, nt, state=state, void_index=vi,
                method=type(model).online_forward,
            )
            C = seg_out["pred_embds_without_norm"].shape[-1]
            Tw = imgs.shape[0]
            frame = seg_out["pred_embds_without_norm"].reshape(1, Tw, -1, C)
            mf = seg_out["mask_features"]
            return (
                track_out["pred_logits"][0],
                track_out["pred_embds"],
                frame,
                mf.reshape((1, Tw) + mf.shape[1:]),
                seg_out["clip_vis_dense"],
                new_state,
            )

        @jax.jit
        def refine_embeds(params, inst, frame, time_mask):
            out = model.apply(
                params, inst, frame, time_mask, method=type(model).refine_embeds
            )
            return out["fused"], out["mask_embed"]

        @jax.jit
        def mask_and_pool(params, membd_w, mf_w, clip_w):
            masks_w = model.apply(
                params, membd_w, mf_w, method=type(model).refine_mask_window
            )  # (1, Q, Tw, H4, W4)
            m = (masks_w[0] > 0.0).astype(jnp.float32)
            # in-vocab pooling accumulators over stride-4 mask features
            mf_sum = jnp.einsum("qthw,thwc->qc", m, mf_w[0].astype(jnp.float32))
            mf_cnt = m.sum(axis=(1, 2, 3))
            # out-of-vocab: per-frame CLIP pooling + logits
            masks_tq = jnp.swapaxes(masks_w[0], 0, 1)
            pooled = model.apply(
                params, clip_w, masks_tq, method=type(model).pool_clip
            )
            scale = model.apply(params, method=type(model).clip_logit_scale)
            tc_full = model.apply(
                params, tc, vi, method=type(model).full_classifier
            )
            from dvis_plus_tpu.models.ov.heads import get_classification_logits

            out_logits = get_classification_logits(pooled, tc_full, scale, nt)
            return masks_w[0], mf_sum, mf_cnt, out_logits

        @jax.jit
        def classify(params, fused, mf_sum, mf_cnt):
            pooled = (mf_sum / jnp.maximum(mf_cnt[:, None], 1e-8))[None]
            return model.apply(
                params, fused, pooled.astype(fused.dtype), tc, nt, vi,
                method=type(model).refine_ov_classify,
            )[0]

        fns["win"] = (win, refine_embeds, mask_and_pool, classify)
    win, refine_embeds, mask_and_pool, classify = fns["win"]

    td = cfg.model.transformer_decoder
    state = init_tracker_state(
        1, td.num_queries, td.hidden_dim, jnp.dtype(cfg.model.compute_dtype)
    )
    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz
    images = _pad_to(images, n_windows * W_sz)
    online_lg, inst_l, frame_l, mf_host, clip_host = [], [], [], [], []
    for i in range(n_windows):
        lg, inst, frame, mf, clip_d, state = win(
            params, jnp.asarray(images[i * W_sz : (i + 1) * W_sz]), state
        )
        online_lg.append(lg)
        inst_l.append(inst)
        frame_l.append(frame)
        mf_host.append(np.asarray(mf))
        clip_host.append(np.asarray(clip_d))
    from dvis_plus_tpu.engine.inference import _bucket_windows, _pad_time_replicate

    # length-bucketed T^2 embed pass (see inference._bucket_windows)
    Tb = _bucket_windows(n_windows) * W_sz
    inst = _pad_time_replicate(jnp.concatenate(inst_l, axis=1), T, Tb, 1)
    frame = _pad_time_replicate(jnp.concatenate(frame_l, axis=1), T, Tb, 1)
    time_mask = (jnp.arange(Tb) < T)[None]
    fused, membd = refine_embeds(params, inst, frame, time_mask)

    masks_l, out_lg = [], []
    mf_sum = 0.0
    mf_cnt = 0.0
    for i in range(n_windows):
        membd_w = jax.lax.dynamic_slice_in_dim(membd, i * W_sz, W_sz, axis=1)
        masks_w, s, c, ol = mask_and_pool(
            params, membd_w, jnp.asarray(mf_host[i]), jnp.asarray(clip_host[i])
        )
        masks_l.append(np.asarray(masks_w, np.float16))
        mf_sum = mf_sum + s
        mf_cnt = mf_cnt + c
        out_lg.append(ol)
    masks = np.concatenate(masks_l, axis=1)  # (Q, T', H4, W4)
    in_vocab = classify(params, fused, mf_sum, mf_cnt)  # (1, Q, K+1) -> squeezed below

    out_logits = jnp.concatenate(out_lg, axis=0)  # (T', Q, K+1)
    scale_dummy = jnp.asarray(0.0)
    fused_frames = ov_ensemble_inference(
        jnp.broadcast_to(in_vocab, out_logits.shape),
        None, tc, nt, scale_dummy, overlap, alpha, beta,
        out_vocab_logits=out_logits,
    )
    # video-level logits = mean of the TRUE frames' log-probs (reference OV
    # offline post_processing :2147 means the per-frame log-prob matrix over
    # t — geometric mean; padded tail frames excluded). The reference
    # explicitly DISCARDS the online aux logits for OV offline
    # (``aux_pred_logits = None``, meta_architecture_ov.py:2148), so no
    # max-fusion here. (T = the pre-padding video length from above.)
    del online_lg  # computed by the window fn; unused at inference (:2148)
    return fused_frames.astype(jnp.float32)[:T].mean(axis=0), masks
