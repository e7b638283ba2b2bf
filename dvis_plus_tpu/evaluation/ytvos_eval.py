"""Video instance segmentation AP evaluation (YTVOS protocol).

Re-implements the reference's vendored evaluation stack
(``DVIS_Plus/dvis_Plus/data_video/datasets/ytvis_api/ytvos.py:54`` +
``ytvoseval.py:13``) from the metric definition, on the native RLE codec:

- a prediction/GT is a *track*: per-frame RLE masks (None = absent);
- track IoU is spatio-temporal: sum of per-frame intersections over sum of
  per-frame unions (crowd GT: denominator = detection area);
- COCO-style matching per (video, category): detections sorted by score,
  greedily matched to the best unmatched GT above each IoU threshold
  (0.50:0.05:0.95), crowd GTs matchable many times and ignored;
- AP = mean precision over 101 recall points, averaged over thresholds and
  categories present in the GT; AR = max recall at maxDets.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from dvis_plus_tpu.utils import rle as rle_codec

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)


def track_iou(
    dt_segs: Sequence[Optional[dict]],
    gt_segs: Sequence[Optional[dict]],
    iscrowd: bool = False,
) -> float:
    inter = 0.0
    union = 0.0
    dt_area = 0.0
    for d, g in zip(dt_segs, gt_segs):
        da = rle_codec.area(d) if d else 0
        ga = rle_codec.area(g) if g else 0
        dt_area += da
        if d and g:
            i = rle_codec.iou([d], [g], [1])[0, 0] * da  # crowd iou = inter/da
            inter += i
            union += da + ga - i
        else:
            union += da + ga
    if iscrowd:
        return inter / dt_area if dt_area > 0 else 0.0
    return inter / union if union > 0 else 0.0


def _match_one(args):
    """Per-(video, category) IoU matrix + greedy threshold matching — the
    multiprocessing work item (the reference vendors C pycocotools for this;
    our per-pair tube IoU is the C++ RLE codec, the pair loop parallelizes
    over videos like the reference VPQ scorer, eval_vpq_vspw.py:219-295)."""
    dt, gt, crowd = args
    T = len(IOU_THRS)
    ious = np.zeros((len(dt), len(gt)))
    for i, d in enumerate(dt):
        for j, g in enumerate(gt):
            ious[i, j] = track_iou(d["segmentations"], g["segmentations"], crowd[j])
    matched = np.zeros((T, len(dt)), bool)
    ignored = np.zeros((T, len(dt)), bool)
    for ti, thr in enumerate(IOU_THRS):
        gt_used = [False] * len(gt)
        for i in range(len(dt)):
            best, best_j = thr, -1
            for j in range(len(gt)):
                if gt_used[j] and not crowd[j]:
                    continue
                if ious[i, j] >= best or (
                    crowd[j] and ious[i, j] >= thr and best_j >= 0 and not crowd[best_j]
                ):
                    if best_j >= 0 and not crowd[best_j] and crowd[j]:
                        continue
                    best, best_j = ious[i, j], j
            if best_j >= 0:
                if crowd[best_j]:
                    ignored[ti, i] = True
                else:
                    gt_used[best_j] = True
                    matched[ti, i] = True
    return matched, ignored


def evaluate_vis(
    gt_annotations: List[dict],
    predictions: List[dict],
    num_frames_per_video: Dict[int, int],
    max_dets: int = 100,
    workers: int = 0,
) -> Dict[str, float]:
    """gt_annotations: [{video_id, category_id, segmentations, iscrowd, id}];
    predictions: [{video_id, category_id, segmentations, score}].
    Returns {AP, AP50, AP75, AR100, ...}. ``workers > 1`` parallelizes the
    per-(video, category) tube-IoU matching over processes."""
    gts = defaultdict(list)
    dts = defaultdict(list)
    cat_ids = set()
    for g in gt_annotations:
        gts[(g["video_id"], g["category_id"])].append(g)
        cat_ids.add(g["category_id"])
    for d in predictions:
        dts[(d["video_id"], d["category_id"])].append(d)
    video_ids = sorted(num_frames_per_video)

    T = len(IOU_THRS)
    # build the (cat, vid) work list, then match serially or in a pool
    work = {}
    for cat in sorted(cat_ids):
        for vid in video_ids:
            gt = gts.get((vid, cat), [])
            dt = sorted(dts.get((vid, cat), []), key=lambda d: -d["score"])[:max_dets]
            if not dt:
                continue
            crowd = [bool(g.get("iscrowd", 0)) for g in gt]
            work[(cat, vid)] = (dt, gt, crowd)
    if workers and workers > 1 and len(work) > 8:
        import multiprocessing as mp

        with mp.get_context("fork").Pool(workers) as pool:
            results = dict(zip(work.keys(), pool.map(_match_one, work.values())))
    else:
        results = {k: _match_one(v) for k, v in work.items()}

    # per category: accumulate match flags over all videos
    ap_per_cat = []
    ar_per_cat = []
    ap50_per_cat, ap75_per_cat = [], []
    for cat in sorted(cat_ids):
        dt_scores_all = []
        dt_matched_all = []  # (T, n_dt) bool
        dt_ignored_all = []
        n_gt = 0
        for vid in video_ids:
            gt = gts.get((vid, cat), [])
            crowd = [bool(g.get("iscrowd", 0)) for g in gt]
            n_gt += sum(1 for c in crowd if not c)
            if (cat, vid) not in work:
                continue
            dt = work[(cat, vid)][0]
            matched, ignored = results[(cat, vid)]
            dt_scores_all.extend(d["score"] for d in dt)
            dt_matched_all.append(matched)
            dt_ignored_all.append(ignored)

        if n_gt == 0:
            continue
        if not dt_scores_all:
            ap_per_cat.append(0.0)
            ap50_per_cat.append(0.0)
            ap75_per_cat.append(0.0)
            ar_per_cat.append(0.0)
            continue
        scores = np.asarray(dt_scores_all)
        order = np.argsort(-scores, kind="mergesort")
        matched = np.concatenate(dt_matched_all, axis=1)[:, order]
        ignored = np.concatenate(dt_ignored_all, axis=1)[:, order]

        ap_t = np.zeros(T)
        ar_t = np.zeros(T)
        for ti in range(T):
            keep = ~ignored[ti]
            m = matched[ti][keep]
            tp = np.cumsum(m)
            fp = np.cumsum(~m)
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # monotone precision envelope
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            # 101-point interpolation
            idx = np.searchsorted(recall, RECALL_THRS, side="left")
            prec_at = np.where(idx < len(precision), precision[np.minimum(idx, max(len(precision) - 1, 0))], 0.0)
            if len(precision) == 0:
                prec_at = np.zeros_like(RECALL_THRS)
            ap_t[ti] = prec_at.mean()
            ar_t[ti] = recall[-1] if len(recall) else 0.0
        ap_per_cat.append(ap_t.mean())
        ap50_per_cat.append(ap_t[0])
        ap75_per_cat.append(ap_t[5])
        ar_per_cat.append(ar_t.mean())

    if not ap_per_cat:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "AR100": 0.0}
    return {
        "AP": float(np.mean(ap_per_cat)),
        "AP50": float(np.mean(ap50_per_cat)),
        "AP75": float(np.mean(ap75_per_cat)),
        "AR100": float(np.mean(ar_per_cat)),
    }
