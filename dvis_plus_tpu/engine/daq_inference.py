"""DVIS-DAQ streaming inference driver.

Re-designs the reference's DAQ eval path
(``DVIS_DAQ/dvis_daq/track_module.py:606-770`` streaming cutter +
``meta_architecture.py:490-596`` run_window_inference /
``:1169-1366`` offline common_inference / ``:598-697`` VOS):

- the segmenter runs per window (jitted, static shapes);
- the Video Instance Cutter runs per frame with the fixed-capacity
  ``CutterState`` carry on device — two compiled executables (first frame:
  fQ queries; steady state: Qc track slots + nq new-ins queries);
- the reference's ``video_ins_hub`` python-dict bookkeeping becomes host-side
  accumulation of the cutter's **slot-aligned** outputs keyed by the stable
  integer ``seq_id`` carried in the slot table (kick-out after
  ``kick_out_frame_num`` missed frames happens in-graph; a kicked slot simply
  stops appearing);
- sequences shorter than ``noise_frame_num`` that ended before the video end
  are dropped (noise filtering, meta_architecture.py:540-543);
- per-sequence class logits are averaged over recorded frames; full-video
  masks are assembled on host at stride 4 with -1e4 background fill;
- offline: top-K sequences (``offline_topk_num``) feed the temporal refiner —
  absent frames carry the sequence's SGFF pos embed (common_inference
  :1254-1266, padding_embed = identity) — via the HBM-bounded
  ``embed_pass`` + windowed ``mask_window`` head;
- VOS: first-frame GT masks are IoU-matched (Hungarian) to top-K predicted
  tracks; per-frame argmax-merged palette PNGs are written
  (inference_video_vos :598-697).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.daq.cutter import init_cutter_state

logger = logging.getLogger(__name__)


class SeqRecord:
    """Host-side per-sequence accumulator (reference VideoInstanceSequence,
    track_module.py:16-99)."""

    __slots__ = ("start", "frames", "logits", "masks", "embeds", "sg_pos")

    def __init__(self, start: int):
        self.start = start
        self.frames: List[int] = []
        self.logits: List[np.ndarray] = []
        self.masks: List[np.ndarray] = []
        self.embeds: List[np.ndarray] = []
        self.sg_pos: Optional[np.ndarray] = None


def _build_fns(cfg: Config, model, window_fns: Dict):
    """Jitted segmenter-window + cutter-step executables (cached)."""
    if "seg" not in window_fns:

        @jax.jit
        def seg_fn(params, imgs):
            out = model.apply(params, imgs, method=type(model).segment_only)
            return (
                out["pred_logits"],
                out["pred_masks"],
                out["pred_embds_without_norm"],
                out["mask_features"],
                out["query_feat"],
            )

        @jax.jit
        def first_fn(params, state, fe, mf, qf, pm, valid):
            out, new_state = model.apply(
                params, state, fe, mf, qf, pm, valid, True,
                method=type(model).cutter_step,
            )
            return out, new_state

        @jax.jit
        def win_fn(params, state, fe, mf, qf, pm):
            # in-graph lax.scan over the window's frames: one dispatch + one
            # host pull per window instead of per frame
            outs, new_state = model.apply(
                params, state, fe, mf, qf, pm,
                method=type(model).cutter_window,
            )
            return outs, new_state

        window_fns["seg"] = seg_fn
        window_fns["first"] = first_fn
        window_fns["win"] = win_fn
    return window_fns["seg"], window_fns["first"], window_fns["win"]


def stream_video(cfg: Config, model, params, images: np.ndarray, window_fns: Dict):
    """Run the full streaming cutter over one video.

    Returns (records: {seq_id: SeqRecord}, T, (H4, W4))."""
    seg_fn, first_fn, win_fn = _build_fns(cfg, model, window_fns)
    from dvis_plus_tpu.engine.inference import resolve_window_size
    W_sz = resolve_window_size(cfg)
    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz

    td = cfg.model.transformer_decoder
    Qc = cfg.model.daq.max_num_instances
    # carry-dtype contract: the scan carry must round-trip in the compute
    # dtype (a mismatched carry is a trace error inside cutter_window's scan)
    state = init_cutter_state(
        Qc, td.hidden_dim, jnp.dtype(cfg.model.compute_dtype)
    )

    aux_thr = cfg.model.daq.aux_inference_select_thr
    records: Dict[int, SeqRecord] = {}
    shape4 = None

    def record_frames(host_out, t0: int, n: int):
        """Accumulate n frames of stacked slot outputs starting at video
        frame t0 (host side; the reference's video_ins_hub bookkeeping)."""
        alive = host_out["alive"]
        seq_ids = host_out["seq_id"]
        s_logits = host_out["slot_logits"].astype(np.float32)
        s_masks = host_out["slot_masks"].astype(np.float16)
        s_embeds = host_out["slot_embeds"].astype(np.float32)
        s_sg = host_out["slot_sg_pos"].astype(np.float32)
        for j in range(n):
            t = t0 + j
            for slot in np.nonzero(alive[j])[0]:
                sid = int(seq_ids[j, slot])
                rec = records.get(sid)
                if rec is None:
                    rec = records[sid] = SeqRecord(t)
                rec.frames.append(t)
                rec.logits.append(s_logits[j, slot])
                rec.masks.append(s_masks[j, slot])
                rec.embeds.append(s_embeds[j, slot])
                rec.sg_pos = s_sg[j, slot]

    for w in range(n_windows):
        chunk = images[w * W_sz : (w + 1) * W_sz]
        Tw = chunk.shape[0]
        if Tw < W_sz:  # pad tail so every window hits the same executable
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], W_sz - Tw, axis=0)], axis=0
            )
        lg, pm, fe, mf, qf = seg_fn(params, jnp.asarray(chunk))
        shape4 = pm.shape[-2:]
        if w == 0:
            # first frame: its own executable (fQ queries, validity from the
            # segmenter scores); the rest of the window scans steady-state
            prob = jax.nn.softmax(lg[0].astype(jnp.float32), axis=-1)
            valid = prob[:, :-1].max(axis=1) > aux_thr
            out0, state = first_fn(params, state, fe[0], mf[0], qf, pm[0], valid)
            host0 = jax.device_get(out0)
            record_frames(jax.tree.map(lambda x: x[None], host0), 0, 1)
            if W_sz > 1:
                outs, state = win_fn(
                    params, state, fe[1:], mf[1:], qf, pm[1:]
                )
                record_frames(jax.device_get(outs), 1, Tw - 1)
        else:
            # one dispatch + one stacked host pull for the whole window;
            # padded tail frames are computed but never recorded (state
            # after the last real frame is unused)
            outs, state = win_fn(params, state, fe, mf, qf, pm)
            record_frames(jax.device_get(outs), w * W_sz, Tw)
    return records, T, tuple(int(v) for v in shape4)


def collect_sequences(cfg: Config, records: Dict[int, SeqRecord], T: int, shape4):
    """Noise-filter + assemble per-sequence outputs (reference :528-575).

    Returns (pred_cls (N, K+1), full_masks (N, T, H4, W4) f16,
    embeds (N, T, C), time_valid (N, T) bool, seq_ids list)."""
    H4, W4 = shape4
    cls_l, masks_l, emb_l, tv_l, ids = [], [], [], [], []
    nf = cfg.model.daq.noise_frame_num
    for sid, rec in sorted(records.items()):
        if len(rec.frames) < nf and rec.frames[-1] + 1 < T:
            continue
        full = np.full((T, H4, W4), -1e4, np.float16)
        emb = np.tile(rec.sg_pos[None], (T, 1))  # padding = SGFF pos embed
        tv = np.zeros((T,), bool)
        for f, m, e in zip(rec.frames, rec.masks, rec.embeds):
            if f >= T:
                continue
            full[f] = m
            emb[f] = e
            tv[f] = True
        cls_l.append(np.stack(rec.logits, axis=0).mean(axis=0))
        masks_l.append(full)
        emb_l.append(emb)
        tv_l.append(tv)
        ids.append(sid)
    if not cls_l:
        return (
            np.zeros((0, cfg.model.num_classes + 1), np.float32),
            np.zeros((0, T, H4, W4), np.float16),
            np.zeros((0, T, cfg.model.transformer_decoder.hidden_dim), np.float32),
            np.zeros((0, T), bool),
            [],
        )
    return (
        np.stack(cls_l),
        np.stack(masks_l),
        np.stack(emb_l),
        np.stack(tv_l),
        ids,
    )


def _pad_rows(a: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def daq_video_logits_masks(cfg: Config, model, params, images, window_fns: Dict):
    """Per-video (seq mean logits (N', K+1), full masks (N', T, H4, W4)) for
    the shared VPS/VSS post-processing (reference DAQ inference_video_vps/vss
    run on the seq outputs, meta_architecture.py:755/:840). N' is padded to a
    bucket of 16 with -1e4/no-object rows."""
    T = images.shape[0]
    records, _, shape4 = stream_video(cfg, model, params, images, window_fns)
    pred_cls, full_masks, embeds, time_valid, _ = collect_sequences(
        cfg, records, T, shape4
    )
    if cfg.model.meta_architecture == "daq_offline" and pred_cls.shape[0] > 0:
        pred_cls, full_masks = _offline_refine(
            cfg, model, params, window_fns,
            pred_cls, full_masks, embeds, time_valid, records, images,
        )
    N = pred_cls.shape[0]
    bucket = max(16, ((N + 15) // 16) * 16)
    logits = _pad_rows(pred_cls.astype(np.float32), bucket, fill=-1e4)
    logits[N:, -1] = 1.0
    masks = _pad_rows(full_masks.astype(np.float32), bucket, fill=-1e4)
    return logits, masks


def run_daq_inference(cfg: Config, model, params, loader: Iterator[dict], evaluator):
    """DAQ eval loop: streaming cutter -> (optional offline refine) ->
    top-K VIS outputs -> evaluator (or VOS PNGs for test.task == 'vos')."""
    from dvis_plus_tpu.engine.inference import (
        paged_inference_video,
        resolve_window_size,
    )

    offline = cfg.model.meta_architecture == "daq_offline"
    window_fns: Dict = {}

    for sample in loader:
        images = sample["images"]
        T, H, W = images.shape[:3]
        records, _, shape4 = stream_video(cfg, model, params, images, window_fns)
        pred_cls, full_masks, embeds, time_valid, seq_ids = collect_sequences(
            cfg, records, T, shape4
        )

        if offline and pred_cls.shape[0] > 0:
            pred_cls, full_masks = _offline_refine(
                cfg, model, params, window_fns,
                pred_cls, full_masks, embeds, time_valid, records, images,
            )

        if cfg.test.task == "vos":
            _vos_output(cfg, sample, pred_cls, full_masks)
            continue

        # pad N to a bucket so inference_video executables are reused
        N = pred_cls.shape[0]
        bucket = max(16, ((N + 15) // 16) * 16)
        logits = _pad_rows(pred_cls.astype(np.float32), bucket, fill=-1e4)
        logits[N:, -1] = 1.0
        masks = _pad_rows(full_masks.astype(np.float32), bucket, fill=-1e4)

        h, w = [int(v) for v in sample["image_size"]]
        # time-chunked top-K upsampling (host masks stay host; chunks page
        # through the device) — see inference.paged_inference_video
        scores, labels, out_masks = paged_inference_video(
            jnp.asarray(logits),
            masks,
            img_size=(h, w),
            output_size=(int(sample["height"]), int(sample["width"])),
            padded_size=(H, W),
            topk=min(cfg.test.max_num, bucket),
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


def _offline_refine(cfg, model, params, window_fns, pred_cls, full_masks,
                    embeds, time_valid, records, images):
    """Top-K + temporal refiner over tracked slots (common_inference
    :1285-1366 + offline run_window_inference)."""
    topk = cfg.model.daq.offline_topk_num
    scores = _softmax(pred_cls)[:, :-1].max(axis=1)
    order = np.argsort(-scores)[:topk]
    sel_masks = full_masks[order]
    sel_emb = embeds[order]

    N, T, C = sel_emb.shape
    from dvis_plus_tpu.engine.inference import resolve_window_size
    W_sz = resolve_window_size(cfg)
    n_windows = (T + W_sz - 1) // W_sz
    pad_T = n_windows * W_sz

    # frame embeds + mask features re-run per window (the streaming pass does
    # not keep them). Mask features stay DEVICE-resident while the whole
    # video fits the HBM budget — same policy as the close-vocab offline
    # driver (inference.eval_mask_budget_bytes); only beyond it do they page
    # through host (each np.asarray round-trip pays PCIe/relay bandwidth)
    from dvis_plus_tpu.engine.inference import eval_mask_budget_bytes

    Him4, Wim4 = images.shape[1] // 4, images.shape[2] // 4
    mf_bytes = n_windows * W_sz * Him4 * Wim4 * 256 * 4
    keep_on_device = mf_bytes < eval_mask_budget_bytes(cfg)

    seg_fn = window_fns["seg"]
    frame_l, mf_host = [], []
    for w in range(n_windows):
        chunk = images[w * W_sz : (w + 1) * W_sz]
        if chunk.shape[0] < W_sz:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], W_sz - chunk.shape[0], axis=0)], 0
            )
        _, _, fe, mf, _ = seg_fn(params, jnp.asarray(chunk))
        frame_l.append(np.asarray(fe))
        mf_host.append(mf if keep_on_device else np.asarray(mf))
    frame_embeds = np.concatenate(frame_l, axis=0)  # (pad_T, fQ, C)

    Qr = max(topk, 1)
    inst = _pad_rows(sel_emb, Qr)  # (Qr, T, C)
    # length-bucketed T^2 embed pass (inference._bucket_windows): replicate
    # the last REAL frame for both streams and mask padded frames in-graph
    from dvis_plus_tpu.engine.inference import _bucket_windows

    nb = _bucket_windows(n_windows)
    Tb = nb * W_sz
    inst_pad = np.concatenate(
        [inst, np.tile(inst[:, -1:], (1, Tb - T, 1))], axis=1
    )
    frame_embeds = np.concatenate(
        [frame_embeds[:T], np.tile(frame_embeds[T - 1 : T], (Tb - T, 1, 1))], axis=0
    )
    time_mask = np.arange(Tb) < T
    inst_mask = np.zeros((Qr,), bool)
    inst_mask[: N] = True

    if "daq_refine" not in window_fns:

        @jax.jit
        def refine_embeds(params, inst, frame, imask, tmask):
            out = model.apply(
                params, inst, frame, imask, tmask,
                method=type(model).refine_embeds,
            )
            return out["pred_logits"][0], out["mask_embed"][0]

        @jax.jit
        def mask_win(params, membd, mf):
            return model.apply(
                params, membd[None], mf[None],
                method=type(model).refine_mask_window,
            )[0]

        window_fns["daq_refine"] = (refine_embeds, mask_win)
    refine_embeds, mask_win = window_fns["daq_refine"]

    r_logits, membd = refine_embeds(
        params,
        jnp.asarray(inst_pad.swapaxes(0, 1)[None]),  # (1, Tb, Qr, C)
        jnp.asarray(frame_embeds[None]),
        jnp.asarray(inst_mask[None]),
        jnp.asarray(time_mask[None]),
    )
    masks_l = []
    for w in range(n_windows):
        mw = mask_win(
            params,
            jax.lax.dynamic_slice_in_dim(membd, w * W_sz, W_sz, axis=0),
            jnp.asarray(mf_host[w]),
        )
        masks_l.append(mw if keep_on_device else np.asarray(mw, dtype=np.float16))
    if keep_on_device:
        r_masks = np.asarray(jnp.concatenate(masks_l, axis=1)[:, :T], np.float16)
    else:
        r_masks = np.concatenate(masks_l, axis=1)[:, :T]  # (Qr, T, H4, W4)

    # the reference DAQ uses the refiner's logits directly — NO aux fusion
    # with the online sequence logits (DVIS_DAQ/dvis_daq/meta_architecture.py
    # :1349-1357 + the single inference_video_task callsite :399 passes no
    # aux_pred_cls)
    return np.asarray(r_logits, np.float32)[:N], r_masks[:N]


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _vos_output(cfg: Config, sample: dict, pred_cls: np.ndarray, full_masks: np.ndarray):
    """VOS: Hungarian-match first-frame GT objects to predicted tracks by
    mask IoU, write per-frame argmax-merged palette PNGs
    (inference_video_vos :598-697)."""
    gt_masks = sample.get("first_frame_masks")  # (Ng, H, W) bool at model res
    ori_ids = sample.get("first_frame_ids", [])
    if gt_masks is None or len(ori_ids) == 0 or pred_cls.shape[0] == 0:
        logger.warning("VOS sample without first-frame targets; skipping")
        return
    import cv2

    T = full_masks.shape[1]
    H4, W4 = full_masks.shape[-2:]
    max_num = min(cfg.test.max_num, pred_cls.shape[0])
    scores = _softmax(pred_cls)[:, :-1].max(axis=1)
    top = np.argsort(-scores)[:max_num]
    topk_masks = full_masks[top].astype(np.float32)  # (M, T, H4, W4)

    gt4 = np.stack(
        [cv2.resize(m.astype(np.uint8), (W4, H4), interpolation=cv2.INTER_NEAREST)
         for m in gt_masks]
    ).astype(bool)
    pred0 = topk_masks[:, 0] > 0.0
    inter = (pred0[:, None] & gt4[None]).reshape(len(top), len(gt4), -1).sum(-1)
    union = (pred0[:, None] | gt4[None]).reshape(len(top), len(gt4), -1).sum(-1)
    iou = inter / np.maximum(union, 1)  # (M_pred, Ng)
    from dvis_plus_tpu.ops.hungarian import hungarian

    # each GT object (row) gets a distinct predicted track (column); the
    # solver needs n <= m so GT count must not exceed the top-K track count
    ng = min(len(ori_ids), iou.shape[0])
    track4gt = np.asarray(hungarian(jnp.asarray(1.0 - iou.T[:ng], jnp.float32))[0])
    obj_to_track = {int(ori_ids[g]): int(track4gt[g]) for g in range(ng)}

    out_h, out_w = int(sample["height"]), int(sample["width"])
    h, w = [int(v) for v in sample["image_size"]]
    pad_h, pad_w = sample["images"].shape[1:3]
    video_id = sample.get("video_name", str(sample.get("video_id", 0)))
    save_dir = os.path.join(cfg.output_dir, "inference", str(video_id))
    os.makedirs(save_dir, exist_ok=True)

    def resize_out(m4):
        m = cv2.resize(m4, (pad_w, pad_h), interpolation=cv2.INTER_LINEAR)
        m = m[:h, :w]
        return cv2.resize(m, (out_w, out_h), interpolation=cv2.INTER_LINEAR)

    max_id = max(obj_to_track.keys()) if obj_to_track else 0
    for t in range(T):
        merge = np.zeros((out_h, out_w, max_id + 1), np.float32)
        probs = []
        for oid, tr in obj_to_track.items():
            m = resize_out(topk_masks[tr, t])
            merge[:, :, oid] = m
            probs.append(m > 0.0)
        if probs:
            merge[:, :, 0] = np.prod(1.0 - np.stack(probs, -1).astype(np.float32), -1)
        lab = np.argmax(merge, axis=-1).astype(np.uint8)
        name = sample.get("file_names", [f"{t:05d}.jpg"] * T)[t]
        base = os.path.basename(name).rsplit(".", 1)[0] + ".png"
        cv2.imwrite(os.path.join(save_dir, base), lab)
