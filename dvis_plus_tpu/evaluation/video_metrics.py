"""Offline video segmentation quality metrics: VPQ, STQ, mIoU, VC.

Re-implements the reference's offline scorers
(``DVIS_Plus/utils/eval_vpq_vspw.py:219-295``, ``eval_stq_vspw.py`` /
``segmentation_and_tracking_quality.py:40``, ``eval_miou_vspw.py:7``,
``eval_vc_vspw.py:8``) from the metric definitions, on numpy label maps:

- VPQ^k: panoptic quality over k-frame tubes — segments are (class, id) tubes
  concatenated over a window; TP when tube IoU > 0.5;
  PQ = sum(IoU_TP) / (|TP| + |FP|/2 + |FN|/2), averaged over classes then
  windows;
- STQ: sqrt(AQ x SQ); AQ = association quality over predicted/GT track pairs
  (IoU-weighted), SQ = semantic mIoU;
- mIoU: per-class intersection/union over all frames;
- VC^n: video consistency — fraction of the area where all n GT frames agree
  that the prediction also keeps consistent.

Inputs are (T, H, W) integer maps; 255 (or ``ignore``) is void.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _tube_segments(cls_map: np.ndarray, id_map: np.ndarray, ignore: int):
    """(T,H,W) -> {(cls, id): area} plus flattened key map for a window."""
    key = cls_map.astype(np.int64) * (1 << 32) + id_map.astype(np.int64)
    key = np.where(cls_map == ignore, -1, key)
    return key


def vpq_single_window(
    pred_cls, pred_id, gt_cls, gt_id, num_classes: int, ignore: int = 255
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns per-class (iou_sum, tp, fp, fn) for one tube window."""
    pk = _tube_segments(pred_cls, pred_id, ignore).reshape(-1)
    gk = _tube_segments(gt_cls, gt_id, ignore).reshape(-1)

    valid = gk != -1
    pairs, counts = np.unique(
        np.stack([gk[valid], pk[valid]]), axis=1, return_counts=True
    )
    gt_area = dict(zip(*np.unique(gk[valid], return_counts=True)))
    pred_area = dict(zip(*np.unique(pk[pk != -1], return_counts=True)))

    iou_sum = np.zeros(num_classes)
    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn = np.zeros(num_classes)

    gt_matched = set()
    pred_matched = set()
    for (g, p), inter in sorted(
        zip(pairs.T.tolist(), counts.tolist()), key=lambda x: -x[1]
    ):
        if p == -1 or g == -1:
            continue
        g_cls = g >> 32
        p_cls = p >> 32
        if g_cls != p_cls or g in gt_matched or p in pred_matched:
            continue
        union = gt_area[g] + pred_area.get(p, 0) - inter
        iou = inter / union if union > 0 else 0.0
        if iou > 0.5:
            gt_matched.add(g)
            pred_matched.add(p)
            iou_sum[g_cls] += iou
            tp[g_cls] += 1
    for g, a in gt_area.items():
        if g != -1 and g not in gt_matched:
            fn[g >> 32] += 1
    # FP: predicted tubes not matched and mostly on non-void
    void = gk == -1
    for p, a in pred_area.items():
        if p in pred_matched:
            continue
        void_overlap = np.sum(void & (pk == p))
        if void_overlap / a <= 0.5:
            fp[p >> 32] += 1
    return iou_sum, tp, fp, fn


def _vpq_video(args):
    (pc, pi), (gc, gi), wlen, num_classes, ignore = args
    iou_sum = np.zeros(num_classes)
    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn = np.zeros(num_classes)
    T = pc.shape[0]
    for s in range(0, max(T - wlen + 1, 1)):
        e = min(s + wlen, T)
        i, t, f, n = vpq_single_window(
            pc[s:e], pi[s:e], gc[s:e], gi[s:e], num_classes, ignore
        )
        iou_sum += i
        tp += t
        fp += f
        fn += n
    return iou_sum, tp, fp, fn


def vpq_eval(
    preds: List[Tuple[np.ndarray, np.ndarray]],  # per video (cls, id) (T,H,W)
    gts: List[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    windows: Sequence[int] = (1, 6, 11, 16),  # k=0,5,10,15 -> window len k+1
    ignore: int = 255,
    num_workers: int = 0,
) -> Dict[str, float]:
    """``num_workers > 0`` fans videos out over a process pool (the reference
    scores VPQ with multiprocessing over videos, eval_vpq_vspw.py:219-295)."""
    results = {}
    all_vpq = []
    for wlen in windows:
        jobs = [(p, g, wlen, num_classes, ignore) for p, g in zip(preds, gts)]
        if num_workers > 0 and len(jobs) > 1:
            import multiprocessing as mp

            with mp.Pool(num_workers) as pool:
                parts = pool.map(_vpq_video, jobs)
        else:
            parts = [_vpq_video(j) for j in jobs]
        iou_sum = sum(p[0] for p in parts)
        tp = sum(p[1] for p in parts)
        fp = sum(p[2] for p in parts)
        fn = sum(p[3] for p in parts)
        denom = tp + fp / 2 + fn / 2
        present = denom > 0
        pq = np.where(present, iou_sum / np.maximum(denom, 1e-9), 0.0)
        vpq = pq[present].mean() if present.any() else 0.0
        results[f"VPQ@{wlen}"] = float(vpq * 100)
        all_vpq.append(vpq)
    results["VPQ"] = float(np.mean(all_vpq) * 100)
    return results


def miou_eval(
    preds: List[np.ndarray], gts: List[np.ndarray], num_classes: int, ignore: int = 255
) -> float:
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for p, g in zip(preds, gts):
        valid = g != ignore
        for c in range(num_classes):
            pi = (p == c) & valid
            gi = g == c
            inter[c] += np.logical_and(pi, gi).sum()
            union[c] += np.logical_or(pi, gi).sum()
    present = union > 0
    return float((inter[present] / union[present]).mean() * 100) if present.any() else 0.0


def vc_eval(
    preds: List[np.ndarray], gts: List[np.ndarray], n: int = 8, ignore: int = 255
) -> float:
    """Video consistency VC_n (eval_vc_vspw.py:8): over every n-frame window,
    |pixels where gt constant AND pred constant| / |pixels where gt constant|."""
    num = 0.0
    den = 0.0
    for p, g in zip(preds, gts):
        T = p.shape[0]
        for s in range(0, T - n + 1):
            gw = g[s : s + n]
            pw = p[s : s + n]
            gt_common = np.all(gw == gw[0:1], axis=0) & (gw[0] != ignore)
            pred_common = np.all(pw == pw[0:1], axis=0) & gt_common & (pw[0] == gw[0])
            num += pred_common.sum()
            den += gt_common.sum()
    return float(num / den * 100) if den > 0 else 0.0


def stq_eval(
    preds: List[Tuple[np.ndarray, np.ndarray]],
    gts: List[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    num_things: int,
    ignore: int = 255,
) -> Dict[str, float]:
    """Segmentation and Tracking Quality (segmentation_and_tracking_quality.py:40).

    SQ = semantic mIoU over all frames; AQ = mean over GT tracks of
    sum_{pred tracks p} (|p cap g| / |g|) * IoU(p, g) computed on thing pixels
    with track identity over the whole video. STQ = sqrt(AQ * SQ)."""
    # SQ
    sq = miou_eval([c for c, _ in preds], [c for c, _ in gts], num_classes, ignore) / 100

    # AQ over thing tracks
    aq_terms = []
    for (pc, pi), (gc, gi) in zip(preds, gts):
        is_thing_gt = (gc < num_things) & (gc != ignore)
        gkey = np.where(is_thing_gt, gc.astype(np.int64) * (1 << 32) + gi, -1).reshape(-1)
        pkey = (pc.astype(np.int64) * (1 << 32) + pi).reshape(-1)
        gt_ids, gt_areas = np.unique(gkey[gkey != -1], return_counts=True)
        if len(gt_ids) == 0:
            continue
        pred_ids, pred_areas = np.unique(pkey, return_counts=True)
        pred_area_map = dict(zip(pred_ids.tolist(), pred_areas.tolist()))
        pairs, counts = np.unique(
            np.stack([gkey, pkey])[:, gkey != -1], axis=1, return_counts=True
        )
        inter_by_gt = defaultdict(list)
        for (g, p), c in zip(pairs.T.tolist(), counts.tolist()):
            inter_by_gt[g].append((p, c))
        gt_area_map = dict(zip(gt_ids.tolist(), gt_areas.tolist()))
        for g in gt_ids.tolist():
            ga = gt_area_map[g]
            total = 0.0
            for p, inter in inter_by_gt.get(g, []):
                union = ga + pred_area_map[p] - inter
                tpa = inter / union if union > 0 else 0.0
                total += (inter / ga) * tpa
            aq_terms.append(total)
    aq = float(np.mean(aq_terms)) if aq_terms else 0.0
    return {
        "SQ": sq * 100,
        "AQ": aq * 100,
        "STQ": float(np.sqrt(max(aq * sq, 0.0)) * 100),
    }
