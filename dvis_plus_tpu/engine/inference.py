"""Inference drivers: windowed streaming eval over whole videos.

Re-designs the reference's eval path (``inference_on_dataset`` +
``run_window_inference``, meta_architecture.py:774-816 online / 1446-1500
offline): frames are chunked into fixed windows (padding the tail window so
every window step hits the same compiled executable), the tracker carry
streams across windows on device, and only the final per-video outputs cross
to host for the evaluator.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.tracker.referring_tracker import init_tracker_state

logger = logging.getLogger(__name__)


def resolve_window_size(cfg: Config) -> int:
    """``test.window_size <= 0`` = auto window: static HBM budgeting replaces
    the reference's retry_if_cuda_oom (memory.py:27-80; SURVEY §5.3). Shared
    by every task driver (VIS/VPS/VSS/OV/DAQ)."""
    W_sz = cfg.test.window_size
    if W_sz <= 0:
        from dvis_plus_tpu.utils.events import pick_window_size

        div = cfg.model.size_divisibility
        H_est = ((cfg.input.min_size_test + div - 1) // div) * div
        W_est = ((cfg.input.max_size_test + div - 1) // div) * div
        W_sz = pick_window_size(
            5, H_est, W_est, cfg.model.transformer_decoder.num_queries
        )
        logger.info("auto window size: %d", W_sz)
    return W_sz


def eval_mask_budget_bytes(cfg: Config) -> float:
    """HBM budget for whole-video eval tensors: videos beyond it page
    window-by-window through host fp16 (``test.offline_mf_budget_gb``; env
    ``DVIS_OFFLINE_MF_BUDGET_GB`` overrides — the knob predates its config
    field)."""
    gb = os.environ.get("DVIS_OFFLINE_MF_BUDGET_GB", "")
    if gb:
        return float(gb) * 1e9
    return float(getattr(cfg.test, "offline_mf_budget_gb", 4.0)) * 1e9


@functools.partial(
    jax.jit, static_argnames=("img_size", "output_size", "padded_size")
)
def _upsample_pack(sel, img_size, output_size, padded_size):
    """Fused upsample -> threshold -> bit-pack: the (n, t, out_h, out_w)
    bool masks leave the device as packed uint8 (8 pixels/byte), an 8x cut
    in device->host bytes on the eval hot path (the reference downloads
    full fp16/bool tensors over PCIe, meta_architecture.py:704 + .cpu())."""
    from dvis_plus_tpu.models.meta.minvis import upsample_masks

    up = upsample_masks(sel, img_size, output_size, padded_size)
    return _packbits(up)


def _packbits(x):
    """MSB-first bit-pack along the last axis (numpy packbits order)."""
    W = x.shape[-1]
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, (-W) % 8)])
    bits = x.reshape(x.shape[:-1] + (-1, 8)).astype(jnp.int32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (bits * weights).sum(axis=-1).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "output_size", "padded_size", "k_col"),
)
def _upsample_runs(sel, img_size, output_size, padded_size, k_col):
    """Fused upsample -> threshold -> RLE RUN-BOUNDARY extraction: instead of
    downloading mask pixels at all, the device finds, per column of the
    (n, t, out_h, out_w) bool masks, the ascending rows where the column's
    value changes (top-k over the transition map), the packed cross-column
    change bits, and pixel (0,0) — everything the COCO column-major RLE
    needs (utils/rle.py::encode_colruns rebuilds exact counts in C++).
    Off-chip bytes drop from out_h/8 per column (bit-packed) to ~2*k_col+2:
    ~6x at 720p with k_col=8 — the eval product loop's device->host
    transfer becomes O(mask boundary), not O(mask area). Columns with more
    than k_col transitions are flagged via m_col and fall back to the packed
    download for that frame (byte-identical either way, tested)."""
    from dvis_plus_tpu.models.meta.minvis import upsample_masks

    up = upsample_masks(sel, img_size, output_size, padded_size)  # bool
    H, W = up.shape[-2], up.shape[-1]
    d = up[..., 1:, :] != up[..., :-1, :]  # (n, t, H-1, W) column transitions
    m_col = d.sum(-2).astype(jnp.uint16)
    # k smallest change rows per column by unrolled min-extraction: pure
    # elementwise selects + reductions on the VPU, laid out along the native
    # H axis (lax.top_k at this batch*row shape is catastrophically slow on
    # TPU, measured minutes vs ms; no transpose, no sort, no scatter).
    pos = jnp.arange(1, H, dtype=jnp.int16)[:, None]  # (H-1, 1); H < 32767
    big = jnp.int16(H + 1)
    keys = jnp.where(d, pos, big)
    picks = []
    for _ in range(min(k_col, H - 1)):
        m = keys.min(-2)  # (n, t, W): next-smallest change row per column
        picks.append(m)
        keys = jnp.where(keys == m[..., None, :], big, keys)
    rows = jnp.stack(picks, axis=-1).astype(jnp.uint16)  # invalid slots H+1
    jump = jnp.concatenate(
        [
            jnp.zeros(up.shape[:2] + (1,), bool),
            up[..., 0, 1:] != up[..., H - 1, :-1],
        ],
        axis=-1,
    )  # (n, t, W): bit c = value change across the c-1 -> c column boundary
    # ONE download buffer per chunk (4 small pulls through the relay cost 4
    # latency round-trips racing the next window's dispatch stream):
    # [..., :k] = change rows, [..., k] = m_col, [..., k+1] = jump bit, with
    # pixel(0,0) stashed in bit 1 of column 0's jump slot (its jump bit is
    # structurally 0).
    payload = jnp.concatenate(
        [rows, m_col[..., None], jump.astype(jnp.uint16)[..., None]], axis=-1
    )
    return payload.at[..., 0, -1].add(up[..., 0, 0].astype(jnp.uint16) * 2)


def paged_inference_video(
    mask_cls,
    mask_pred,  # (Q, T, H4, W4) device array OR host np array
    img_size,
    output_size,
    padded_size,
    topk: int = 10,
    aux_pred_cls=None,
    chunk: int = 16,
    packed: bool = False,
    download: Optional[str] = None,
    k_col: int = 8,
):
    """Top-K extraction with TIME-CHUNKED upsampling: semantics identical to
    ``minvis.inference_video`` but the (topk, T, out_h, out_w) tensor never
    materializes on device — at OVIS-like T=300+ and 720p output it would be
    tens of GB. Chunks of ``chunk`` frames upsample on device and land on the
    host (replacing the reference's retry_if_cuda_oom -> CPU fp32 escape
    hatch around inference_video, meta_architecture.py:704), pipelined one
    chunk deep: chunk i+1's gather+upsample dispatches before chunk i's
    download blocks, so device compute hides behind the transfer.

    ``download`` picks the device->host representation (``test.mask_download``):
      - ``"runs"`` (product default): the device extracts the RLE run
        boundaries themselves (_upsample_runs) and only change positions
        leave the chip (~2*k_col+2 bytes/column); frames where a column
        overflows ``k_col`` transitions transparently re-download bit-packed
        (byte-identical outputs either way). Returns a
        :class:`dvis_plus_tpu.utils.rle.ColRunMasks`.
      - ``"packed"``: bit-packed pixels, 8/byte (_upsample_pack). Returns a
        :class:`dvis_plus_tpu.utils.rle.PackedMasks`.
      - ``None``: legacy flag form — ``packed=True`` = "packed",
        ``packed=False`` = "packed" then unpacked to a (n, T, H, W) bool
        array on the host.
    Either container RLE-encodes straight into the evaluator's rows with no
    host-side unpack (8-50x less host traffic than the reference's full
    bool download, ytvis_eval.py:256-295)."""
    from dvis_plus_tpu.models.meta.minvis import topk_select
    from dvis_plus_tpu.utils.rle import ColRunMasks, PackedMasks

    want_array = download is None and not packed
    mode = download or "packed"
    assert mode in ("runs", "packed"), mode

    scores, labels, queries = topk_select(
        jnp.asarray(mask_cls), topk,
        None if aux_pred_cls is None else jnp.asarray(aux_pred_cls),
    )
    T = mask_pred.shape[1]
    n = int(scores.shape[0])
    oh, ow = int(output_size[0]), int(output_size[1])
    ow_b = (ow + 7) // 8
    host = isinstance(mask_pred, np.ndarray)
    q_host = np.asarray(queries)
    sizes = (tuple(img_size), (oh, ow), tuple(padded_size))
    if oh < 2:  # degenerate: no within-column transitions to extract
        mode = "packed"

    def select(s0: int, s1: int):
        if host:
            return jnp.asarray(mask_pred[:, s0:s1][q_host], jnp.float32)
        return jax.lax.slice_in_dim(mask_pred, s0, s1, axis=1)[queries]

    def issue(s0: int):
        s1 = min(s0 + chunk, T)
        sel = select(s0, s1)
        if mode == "runs":
            return s0, s1, _upsample_runs(sel, *sizes, k_col=k_col)
        return s0, s1, _upsample_pack(sel, *sizes)

    if mode == "runs":
        k_eff = min(k_col, oh - 1)
        rows = np.zeros((n, T, ow, k_eff), np.uint16)
        m_col = np.zeros((n, T, ow), np.uint16)
        jumps = np.zeros((n, T, ow_b), np.uint8)
        first = np.zeros((n, T), bool)
    else:
        bits = np.zeros((n, T, oh, ow_b), np.uint8)

    pending = None
    for s0 in list(range(0, T, chunk)) + [None]:
        nxt = issue(s0) if s0 is not None else None  # dispatch ahead (async)
        if pending is not None:
            p0, p1, dev = pending
            if mode == "runs":
                pay = np.asarray(dev)  # ONE blocking download per chunk
                rows[:, p0:p1] = pay[..., :k_eff]
                m_col[:, p0:p1] = pay[..., k_eff]
                jump_slot = pay[..., k_eff + 1]
                first[:, p0:p1] = (jump_slot[..., 0] & 2) > 0
                jumps[:, p0:p1] = np.packbits(
                    (jump_slot & 1).astype(np.uint8), axis=-1
                )
            else:
                bits[:, p0:p1] = np.asarray(dev)  # blocking download
        pending = nxt

    if mode == "runs":
        fallback = {}
        over = m_col.max(axis=-1) > k_eff  # (n, T) frames needing pixels
        for t0 in sorted({int(t) // chunk * chunk
                          for _, t in np.argwhere(over)}):
            t1 = min(t0 + chunk, T)
            pk = np.asarray(_upsample_pack(select(t0, t1), *sizes))
            for i, t in np.argwhere(over[:, t0:t1]):
                fallback[(int(i), int(t) + t0)] = pk[i, t]
        out = ColRunMasks(rows, m_col, jumps, first, oh, ow, fallback)
    else:
        out = PackedMasks(bits, oh, ow)
    return scores, labels, out.unpack() if want_array else out


def _prefetch(it: Iterator, depth: int = 1) -> Iterator:
    """Pull ``it`` on a daemon thread, ``depth`` items ahead: the loader's
    host work (JPEG decode, resize) overlaps the current video's device
    windows. Exceptions re-raise at the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    done = object()
    err: list = []

    def fill():
        try:
            for x in it:
                q.put(x)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            err.append(e)
        finally:
            q.put(done)

    threading.Thread(target=fill, daemon=True, name="eval-prefetch").start()
    while True:
        x = q.get()
        if x is done:
            if err:
                raise err[0]
            return
        yield x


def run_vis_inference(cfg: Config, model, params, loader: Iterator[dict], evaluator,
                      timings: Optional[dict] = None):
    """VIS eval loop: segmenter(+tracker) windows -> post-processing -> top-K
    masks -> evaluator.process per video.

    ``timings`` (optional dict) accumulates per-phase wall seconds across all
    videos: ``model_s`` (window forwards, sync'd) and ``post_s`` (top-K +
    device upsample + bit-packed download + packed RLE rows) — the e2e bench
    uses it to attribute the product-rate/model-rate gap. With the pipeline
    on (``test.eval_pipeline``, default) post_s overlaps the next video's
    model_s, so the two can sum past the e2e wall.

    Mask pixels never leave the device on the default path
    (test.mask_download="runs"): the device extracts the RLE run boundaries
    (_upsample_runs) and the evaluator rebuilds exact COCO counts from the
    downloaded change positions (rle.encode_colruns) — the
    (topk, T, out_h, out_w) tensor exists NOWHERE, device or host. Each
    video's post phase runs on a worker thread while the main thread
    dispatches the next video's windows."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    arch = cfg.model.meta_architecture
    W_sz = resolve_window_size(cfg)
    topk = cfg.test.max_num

    if arch.startswith("daq"):
        from dvis_plus_tpu.engine.daq_inference import run_daq_inference

        return run_daq_inference(cfg, model, params, loader, evaluator)

    window_fns: Dict = {}

    def post_and_process(sample, logits, masks, aux, H, W):
        t1 = _time.perf_counter()
        h, w = [int(v) for v in sample["image_size"]]
        scores, labels, out_masks = paged_inference_video(
            logits,
            masks,
            img_size=(h, w),
            output_size=(int(sample["height"]), int(sample["width"])),
            padded_size=(H, W),
            topk=topk,
            aux_pred_cls=aux,
            chunk=W_sz,
            download=getattr(cfg.test, "mask_download", "runs"),
            k_col=getattr(cfg.test, "rle_col_k", 8),
        )
        if timings is not None:
            timings["post_s"] = (
                timings.get("post_s", 0.0) + _time.perf_counter() - t1
            )
        evaluator.process(
            sample.get("video_id", 0),
            {
                "pred_scores": np.asarray(scores).tolist(),
                "pred_labels": np.asarray(labels).tolist(),
                "pred_masks": out_masks,
            },
        )

    pipeline = bool(getattr(cfg.test, "eval_pipeline", True))
    executor = ThreadPoolExecutor(max_workers=1) if pipeline else None
    if pipeline:
        loader = _prefetch(loader, depth=1)  # decode overlaps device windows
    pending = None
    try:
        for sample in loader:
            images = sample["images"]  # (T, H, W, 3) numpy
            T, H, W = images.shape[:3]

            t0 = _time.perf_counter()
            if arch in ("minvis", "ctvis"):
                out = _minvis_video(cfg, model, params, images, window_fns, W_sz)
            elif arch in ("maskformer", "video_maskformer"):
                out = _clipformer_video(cfg, model, params, images, window_fns, W_sz)
            else:
                out = _online_video(cfg, model, params, images, window_fns, W_sz)

            logits, masks, aux = out  # (Q, K+1), (Q, T', H4, W4) with T' >= T
            masks = masks[:, :T]
            logits = np.asarray(jax.device_get(logits))  # sync: model phase ends
            if timings is not None:
                timings["model_s"] = (
                    timings.get("model_s", 0.0) + _time.perf_counter() - t0
                )
            if executor is None:
                post_and_process(sample, logits, masks, aux, H, W)
            else:
                if pending is not None:
                    pending.result()  # FIFO depth 1: keeps >=1 video in HBM, not N
                pending = executor.submit(
                    post_and_process, sample, logits, masks, aux, H, W
                )
        if pending is not None:
            pending.result()
    finally:
        if executor is not None:
            executor.shutdown(wait=True)


def video_logits_masks(cfg: Config, model, params, images, window_fns, W_sz):
    """Shared per-video forward: (class logits (Q, K+1),
    masks (Q, T', H4, W4), aux logits (Q, K+1) or None) for any close-vocab
    arch incl. DAQ. Only the offline arch produces aux (the time-meaned
    online tracker logits, fused by the task post-processing exactly like
    reference :824-826/:874-876/:959-961; the online arch passes none,
    :704)."""
    arch = cfg.model.meta_architecture
    if arch.startswith("daq"):
        from dvis_plus_tpu.engine.daq_inference import daq_video_logits_masks

        lg, mk = daq_video_logits_masks(cfg, model, params, images, window_fns)
        return lg, mk, None
    if arch in ("minvis", "ctvis"):
        return _minvis_video(cfg, model, params, images, window_fns, W_sz)
    if arch in ("maskformer", "video_maskformer"):
        return _clipformer_video(cfg, model, params, images, window_fns, W_sz)
    return _online_video(cfg, model, params, images, window_fns, W_sz)


def run_vps_inference(cfg: Config, model, params, loader: Iterator[dict], evaluator,
                      num_thing_classes: int, logits_masks_fn=None):
    """VPS eval loop (reference inference_video_vps :869-952): per-pixel
    argmax panoptic id map on device, segment bookkeeping on host, PNG + json
    rows via the VPS evaluator. ``logits_masks_fn(images) -> (logits, masks)``
    overrides the close-vocab forward (used by the OV driver, whose fused
    log-prob logits go through the same softmax top-K — reference OV
    inference_video_vps, meta_architecture_ov.py:845-918)."""
    from dvis_plus_tpu.models.meta.dvis_online import (
        panoptic_probs,
        panoptic_segments_host,
    )

    W_sz = resolve_window_size(cfg)
    window_fns: Dict = {}
    for sample in loader:
        images = sample["images"]
        T, H, W = images.shape[:3]
        if logits_masks_fn is not None:
            logits, masks = logits_masks_fn(images)
            aux = None
        else:
            logits, masks, aux = video_logits_masks(cfg, model, params, images, window_fns, W_sz)
        masks = masks[:, :T]
        h, w = [int(v) for v in sample["image_size"]]
        out_size = (int(sample["height"]), int(sample["width"]))
        # time-chunked upsampling: the (Q, T, out_h, out_w) tensor would be
        # O(video) HBM at 720p — page W_sz frames at a time (the reference
        # wraps this in retry_if_cuda_oom instead, meta_architecture.py:704)
        sc_l, lb_l, kp_l, mu_l, mi_l = None, None, None, [], []
        for s0 in range(0, T, W_sz):
            chunk = jnp.asarray(np.asarray(masks[:, s0 : s0 + W_sz]))
            scores, labels, keep, masks_up, mask_ids = panoptic_probs(
                jnp.asarray(logits),
                chunk,
                img_size=(h, w),
                output_size=out_size,
                padded_size=(H, W),
                object_mask_threshold=cfg.test.object_mask_threshold,
                aux_pred_cls=None if aux is None else jnp.asarray(aux),
            )
            sc_l, lb_l, kp_l = scores, labels, keep  # per-query, frame-indep
            mu_l.append(np.asarray(masks_up, np.float16))
            mi_l.append(np.asarray(mask_ids))
        panoptic_seg, segments_infos, _ = panoptic_segments_host(
            np.asarray(sc_l),
            np.asarray(lb_l),
            np.asarray(kp_l),
            np.concatenate(mu_l, axis=1),
            np.concatenate(mi_l, axis=0),
            num_thing_classes=num_thing_classes,
            overlap_threshold=cfg.test.overlap_threshold,
        )
        evaluator.process(
            sample.get("video_id", 0),
            sample["file_names"],
            panoptic_seg,
            segments_infos,
        )


def run_vss_inference(cfg: Config, model, params, loader: Iterator[dict], evaluator,
                      logits_masks_fn=None):
    """VSS eval loop (reference inference_video_vss :954-979): per-pixel
    semantic argmax -> per-frame PNGs. ``logits_masks_fn`` as in
    :func:`run_vps_inference` (reference OV inference_video_vss,
    meta_architecture_ov.py:920-943)."""
    from dvis_plus_tpu.models.meta.dvis_online import semantic_inference

    W_sz = resolve_window_size(cfg)
    window_fns: Dict = {}
    for sample in loader:
        images = sample["images"]
        T, H, W = images.shape[:3]
        if logits_masks_fn is not None:
            logits, masks = logits_masks_fn(images)
            aux = None
        else:
            logits, masks, aux = video_logits_masks(cfg, model, params, images, window_fns, W_sz)
        masks = masks[:, :T]
        h, w = [int(v) for v in sample["image_size"]]
        sem_l = []
        for s0 in range(0, T, W_sz):  # time-chunked upsampling (see VPS note)
            sem_l.append(np.asarray(semantic_inference(
                jnp.asarray(logits),
                jnp.asarray(np.asarray(masks[:, s0 : s0 + W_sz])),
                img_size=(h, w),
                output_size=(int(sample["height"]), int(sample["width"])),
                padded_size=(H, W),
                aux_pred_cls=None if aux is None else jnp.asarray(aux),
            )))
        evaluator.process(
            sample.get("video_id", 0), sample["file_names"], np.concatenate(sem_l, 0)
        )


def _bucket_windows(n_windows: int) -> int:
    """Next power-of-two window count. The refiner's full-video embed pass and
    the MinVIS post-processing jit-compile per distinct padded length; a real
    val set has tens of distinct lengths, each a fresh multi-minute XLA
    compile. Bucketing bounds the number of compiles at O(log max_T) — the
    padded frames replicate the last real frame and are masked out in-graph,
    so real-frame results equal the unpadded run (the reference relies on
    torch dynamic shapes instead, meta_architecture.py:1446-1500)."""
    return 1 << max(n_windows - 1, 0).bit_length()


def _pad_time_replicate(x: jnp.ndarray, T_real: int, Tb: int, axis: int) -> jnp.ndarray:
    """Slice to T_real then replicate the last REAL frame out to Tb along
    ``axis``. Replicate (not zero) padding preserves the refiner's
    replicate-conv boundary semantics exactly (temporal_refiner._body)."""
    x = jax.lax.slice_in_dim(x, 0, T_real, axis=axis)
    last = jax.lax.slice_in_dim(x, T_real - 1, T_real, axis=axis)
    reps = jnp.concatenate([last] * (Tb - T_real), axis=axis) if Tb > T_real else None
    return x if reps is None else jnp.concatenate([x, reps], axis=axis)


def _pad_to(images: np.ndarray, pad_T: int) -> np.ndarray:
    T = images.shape[0]
    if T == pad_T:
        return images
    reps = np.repeat(images[-1:], pad_T - T, axis=0)
    return np.concatenate([images, reps], axis=0)


def _minvis_video(cfg, model, params, images, window_fns, W_sz):
    """MinVIS: independent per-window decode, embed matching across all frames
    (reference MinVIS.run_window_inference :304-330 + post_processing)."""
    key = ("minvis", W_sz)
    if key not in window_fns:
        @jax.jit
        def win(params, imgs):
            out = model.apply(params, imgs)
            return out["pred_logits"], out["pred_masks"], out["pred_embds"]

        window_fns[key] = win
    win = window_fns[key]

    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz
    images = _pad_to(images, n_windows * W_sz)

    # long videos: the full (T, Q, H4, W4) stride-4 mask stack would exceed
    # the HBM budget — page each window's masks to host fp16 and align them
    # host-side with the per-frame permutations (the alignment scan itself
    # only needs logits + embds, which are tiny)
    Him, Wim = images.shape[1:3]
    Q = cfg.model.transformer_decoder.num_queries
    mask_bytes = n_windows * W_sz * Q * (Him // 4) * (Wim // 4) * 4
    page_to_host = mask_bytes > eval_mask_budget_bytes(cfg)

    logits_l, masks_l, embds_l = [], [], []
    for i in range(n_windows):
        chunk = jnp.asarray(images[i * W_sz : (i + 1) * W_sz])
        lg, mk, em = win(params, chunk)
        logits_l.append(lg)
        masks_l.append(np.asarray(mk, np.float16) if page_to_host else mk)
        embds_l.append(em)
    logits = jnp.concatenate(logits_l, axis=0)
    embds = jnp.concatenate(embds_l, axis=0)

    # bucket the post-processing length (see _bucket_windows) and mask the
    # mean over the true T; the frame-alignment scan is causal, so replicated
    # pad frames never affect real-frame alignment
    Tb = _bucket_windows(n_windows) * W_sz
    logits = _pad_time_replicate(logits, T, Tb, 0)
    embds = _pad_time_replicate(embds, T, Tb, 0)
    valid = jnp.arange(Tb) < T

    if page_to_host:
        from dvis_plus_tpu.models.meta.minvis import minvis_alignment

        if "minvis_align" not in window_fns:
            window_fns["minvis_align"] = jax.jit(
                minvis_alignment, static_argnames=("solver",)
            )
        mean_logits, perms = window_fns["minvis_align"](
            logits, embds, valid, solver=cfg.model.tracker.matcher_solver
        )
        perms = np.asarray(perms)  # (Tb, Q)
        masks_host = np.concatenate(masks_l, axis=0)[:T]  # (T, Q, H4, W4)
        aligned = np.take_along_axis(
            masks_host, perms[:T, :, None, None], axis=1
        ).transpose(1, 0, 2, 3)  # (Q, T, H4, W4) host fp16
        return mean_logits, aligned, None

    from dvis_plus_tpu.models.meta.minvis import minvis_post_processing

    masks = jnp.concatenate(masks_l, axis=0)
    masks = _pad_time_replicate(masks, T, Tb, 0)
    if "minvis_pp" not in window_fns:
        window_fns["minvis_pp"] = jax.jit(
            minvis_post_processing, static_argnames=("solver",)
        )
    mean_logits, aligned = window_fns["minvis_pp"](
        logits, masks, embds, valid, solver=cfg.model.tracker.matcher_solver
    )
    return mean_logits, aligned, None


def _clipformer_video(cfg, model, params, images, window_fns, W_sz):
    """(Video)MaskFormer clip pretraining models: whole-video joint clip
    decode (the reference evaluates the full video in ONE forward,
    video_maskformer_model.py; queries are shared across frames so no
    cross-frame association step is needed). Video length is bucketed to
    bound compiles; padded frames replicate the last frame and are sliced
    away by the caller."""
    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz
    Tb = _bucket_windows(n_windows) * W_sz
    images = _pad_to(images, Tb)

    key = ("clipformer",)
    if key not in window_fns:
        @jax.jit
        def full(params, imgs):
            out = model.apply(params, imgs[None])
            return out["pred_logits"][0], out["pred_masks"][0]

        window_fns[key] = full
    logits, masks = window_fns[key](params, jnp.asarray(images))
    # (Q, K+1), (Q, Tb, H4, W4)
    return logits, masks[:, :T], None


def _online_video(cfg, model, params, images, window_fns, W_sz):
    """DVIS online: tracker carry streams across windows; offline: embeds
    accumulate per window, then one full-video refiner pass with logits-max
    class fusion (reference :1377 + :824-826)."""
    arch = cfg.model.meta_architecture
    offline = arch == "dvis_offline"
    key = (arch, W_sz)

    if key not in window_fns:
        if offline:
            @jax.jit
            def win(params, imgs, state):
                lg, inst, frame, mf, new_state = model.apply(
                    params, imgs[None], state, method=type(model).online_step
                )
                return lg[0], inst, frame, mf, new_state
        else:
            @jax.jit
            def win(params, imgs, state):
                seg_out, track_out, new_state = model.apply(
                    params, imgs[None], state=state
                )
                return (
                    track_out["pred_logits"][0],
                    track_out["pred_masks"][0],
                    new_state,
                )

        window_fns[key] = win
    win = window_fns[key]

    td = cfg.model.transformer_decoder
    C2 = td.hidden_dim * (2 if td.reid_branch else 1)
    # carry dtype matches the compute dtype: a mismatched carry forces a
    # second trace of the window fn on the first resume
    state = init_tracker_state(1, td.num_queries, C2, jnp.dtype(cfg.model.compute_dtype))

    T = images.shape[0]
    n_windows = (T + W_sz - 1) // W_sz
    images = _pad_to(images, n_windows * W_sz)

    if not offline:
        # page the (Q, T, H4, W4) accumulation to host fp16 beyond the HBM
        # budget — ViT-L Q=200 at 480p is ~10 GB for a 500-frame video (the
        # reference's escape hatch is retry_if_cuda_oom -> CPU fp32,
        # meta_architecture.py:704)
        Him, Wim = images.shape[1:3]
        Q = cfg.model.transformer_decoder.num_queries
        mask_bytes = n_windows * W_sz * Q * (Him // 4) * (Wim // 4) * 4
        page_to_host = mask_bytes > eval_mask_budget_bytes(cfg)

        logits_l, masks_l = [], []
        for i in range(n_windows):
            chunk = jnp.asarray(images[i * W_sz : (i + 1) * W_sz])
            lg, mk, state = win(params, chunk, state)
            logits_l.append(lg)
            masks_l.append(np.asarray(mk, np.float16) if page_to_host else mk)
        logits = jnp.concatenate(logits_l, axis=0)[:T]  # (T, Q, K+1)
        if page_to_host:
            masks = np.concatenate(masks_l, axis=1)[:, :T]  # host fp16
        else:
            masks = jnp.concatenate(masks_l, axis=1)[:, :T]  # (Q, T, H4, W4)
        # reference online post_processing: raw logits mean over t, no aux
        # (:763-772, :704)
        return logits.mean(axis=0), masks, None

    # Offline: embeds accumulate on device (tiny); mask features stay
    # device-resident while the whole video fits the HBM budget, and page to
    # HOST per window beyond it — the TPU-native form of the reference's
    # windowed mask prediction + CPU offload (:1473, refiner.py:169-194),
    # without paying host bandwidth on short/medium videos.
    n_windows_total = n_windows
    Him, Wim = images.shape[1:3]
    mf_bytes_per_window = (Him // 4) * (Wim // 4) * 256 * 4 * W_sz  # ~stride-4 fp32
    keep_on_device = (
        n_windows_total * mf_bytes_per_window < eval_mask_budget_bytes(cfg)
    )

    online_logits_l, inst_l, frame_l, mf_host = [], [], [], []
    for i in range(n_windows):
        chunk = jnp.asarray(images[i * W_sz : (i + 1) * W_sz])
        lg, inst, frame, mf, state = win(params, chunk, state)
        online_logits_l.append(lg)
        inst_l.append(inst)
        frame_l.append(frame)
        mf_host.append(mf if keep_on_device else np.asarray(mf))
    online_logits = jnp.concatenate(online_logits_l, axis=0)[:T]  # (T, Q, K+1)
    inst = jnp.concatenate(inst_l, axis=1)
    frame = jnp.concatenate(frame_l, axis=1)

    # bucket the T^2 embed pass (see _bucket_windows): pad the time axis by
    # replicating the last REAL frame and mask it in-graph — real-frame
    # outputs match the unpadded (true-T) reference run exactly, which also
    # removes the tail-window image-padding frames from the refiner's
    # temporal attention (they previously attended as real frames)
    nb = _bucket_windows(n_windows)
    Tb = nb * W_sz
    inst = _pad_time_replicate(inst, T, Tb, 1)
    frame = _pad_time_replicate(frame, T, Tb, 1)
    time_mask = (jnp.arange(Tb) < T)[None]

    refine_key = ("refine_embeds", nb)
    if refine_key not in window_fns:
        n_sp = getattr(cfg.test, "refiner_shard_devices", 0)
        if n_sp > 1 and len(jax.devices()) >= n_sp:
            # sequence-parallel embed pass: object axis sharded over the mesh
            # (parallel/sp.py) — T^2 attention and activations split n_sp ways
            from dvis_plus_tpu.parallel.mesh import build_mesh
            from dvis_plus_tpu.parallel.sp import refiner_embed_pass_sharded

            sp_mesh = build_mesh(jax.devices()[:n_sp])

            @jax.jit
            def refine_embeds(params, inst, frame, time_mask):
                out = refiner_embed_pass_sharded(
                    model, params, inst, frame, sp_mesh, time_mask=time_mask
                )
                return out["pred_logits"][0], out["mask_embed"][0]
        else:
            @jax.jit
            def refine_embeds(params, inst, frame, time_mask):
                out = model.apply(
                    params, inst, frame, time_mask,
                    method=type(model).refine_embeds,
                )
                return out["pred_logits"][0], out["mask_embed"][0]

        @jax.jit
        def mask_win(params, membd, mf):
            return model.apply(
                params, membd[None], mf, method=type(model).refine_mask_window
            )[0]

        window_fns[refine_key] = (refine_embeds, mask_win)
    refine_embeds, mask_win = window_fns[refine_key]
    r_logits, membd = refine_embeds(params, inst, frame, time_mask)  # (Q,K+1), (Tb,Q,Cm)

    masks_l = []
    for i in range(n_windows):
        mw = mask_win(
            params,
            jax.lax.dynamic_slice_in_dim(membd, i * W_sz, W_sz, axis=0),
            jnp.asarray(mf_host[i]),
        )  # (Q, W_sz, H4, W4)
        masks_l.append(mw if keep_on_device else np.asarray(mw, dtype=np.float16))
    if keep_on_device:
        r_masks = jnp.concatenate(masks_l, axis=1)  # (Q, T', H4, W4) device
    else:
        r_masks = np.concatenate(masks_l, axis=1)  # (Q, T', H4, W4) host

    # aux = online tracker logits, RAW mean over t (reference offline
    # post_processing :1482-1489); the max-of-probabilities fusion happens in
    # the task post-processing AFTER its softmax, without renormalization
    # (:824-826 vis, :874-876 vps, :959-961 vss) — fusing here and
    # re-softmaxing later would renormalize by a per-query factor and change
    # the cross-query top-K ranking
    aux = online_logits.astype(jnp.float32).mean(axis=0)  # (Q, K+1)
    return r_logits, r_masks[:, :T], aux
