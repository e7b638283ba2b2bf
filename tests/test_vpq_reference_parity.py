"""VPQ scorer parity: our tube VPQ (evaluation/video_metrics.py::vpq_eval)
vs the ACTUAL reference scorer (DVIS_Plus/utils/eval_vpq_vspw.py::
vpq_compute_single_core + PQStat.pq_average) run as an oracle on randomized
synthetic panoptic videos with void, crowd segments, id switches, and class
confusions.
"""
import os
import sys

import numpy as np
import pytest

# fast enough for the default CI lane (pure-numpy oracles, ~seconds)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dvis_plus_tpu.evaluation.video_metrics import vpq_eval

N_CLASSES = 4  # category ids 0..3; 255 = void in our maps


def _synth_video(rng, T=6, H=18, W=24):
    """Random panoptic (cls, id) maps: GT and a degraded prediction."""
    gt_cls = np.full((T, H, W), 255, np.int64)
    gt_id = np.zeros((T, H, W), np.int64)
    pr_cls = np.full((T, H, W), 255, np.int64)
    pr_id = np.zeros((T, H, W), np.int64)
    crowd = set()
    n_seg = rng.randint(3, 6)
    for s in range(1, n_seg + 1):
        c = rng.randint(0, N_CLASSES)
        h = rng.randint(4, H // 2)
        w = rng.randint(4, W // 2)
        y, x = rng.randint(0, H - h), rng.randint(0, W - w)
        is_crowd = rng.rand() < 0.2
        if is_crowd:
            crowd.add((int(c), int(s)))
        for t in range(T):
            dy, dx = rng.randint(-1, 2), rng.randint(-1, 2)
            yy, xx = np.clip(y + dy, 0, H - h), np.clip(x + dx, 0, W - w)
            gt_cls[t, yy : yy + h, xx : xx + w] = c
            gt_id[t, yy : yy + h, xx : xx + w] = s
            # prediction: jittered box, sometimes wrong class or id switch
            pc = c if rng.rand() < 0.8 else rng.randint(0, N_CLASSES)
            ps = s if rng.rand() < 0.85 else s + 40
            py, px = np.clip(yy + rng.randint(-1, 2), 0, H - h), np.clip(
                xx + rng.randint(-1, 2), 0, W - w
            )
            pr_cls[t, py : py + h, px : px + w] = pc
            pr_id[t, py : py + h, px : px + w] = ps
    return (pr_cls, pr_id), (gt_cls, gt_id), crowd


def _to_reference_inputs(tmp_path, tag, pred, gt, crowd):
    """Write RGB id PNGs + per-frame segments_info jsons in the reference's
    expected layout; label = R + G*256 + B*65536, 0 = void."""
    import cv2

    (pr_cls, pr_id), (gt_cls, gt_id) = pred, gt
    T = pr_cls.shape[0]

    def _label_map(cls_m, id_m):
        # unique positive label per (cls, id); void -> 0
        lab = (cls_m.astype(np.int64) + 1) * 1000 + id_m.astype(np.int64)
        return np.where(cls_m == 255, 0, lab)

    def _write(prefix, cls_m, id_m, crowd_keys):
        labs = _label_map(cls_m, id_m)
        entries = []
        for t in range(T):
            img = np.zeros((*labs[t].shape, 3), np.uint8)
            img[..., 0] = labs[t] % 256
            img[..., 1] = (labs[t] // 256) % 256
            img[..., 2] = labs[t] // 65536
            path = os.path.join(tmp_path, f"{tag}_{prefix}_{t}.png")
            cv2.imwrite(path, img[:, :, ::-1])  # cv2 writes BGR
            segs = []
            for lab in np.unique(labs[t]):
                if lab == 0:
                    continue
                c = int(lab // 1000 - 1)
                i = int(lab % 1000)
                segs.append(
                    {
                        "id": int(lab),
                        "category_id": c,
                        "area": int((labs[t] == lab).sum()),
                        "iscrowd": int((c, i) in crowd_keys),
                    }
                )
            entries.append(({"segments_info": segs}, path))
        return entries

    gt_entries = _write("gt", gt_cls, gt_id, crowd)
    pr_entries = _write("pr", pr_cls, pr_id, set())
    return [
        (gj, pj, gp, pp, None)
        for (gj, gp), (pj, pp) in zip(gt_entries, pr_entries)
    ]


def _reference_vpq(tmp_path, videos, nframes):
    from refshim import load_ref_module

    mod = load_ref_module("DVIS_Plus", "utils.eval_vpq_vspw")
    categories = {c: {"isthing": 1} for c in range(N_CLASSES)}
    stat = mod.PQStat()
    for v, (pred, gt, crowd) in enumerate(videos):
        gt_pred_set = _to_reference_inputs(str(tmp_path), f"v{v}", pred, gt, crowd)
        stat += mod.vpq_compute_single_core(categories, nframes, gt_pred_set)
    res, _ = stat.pq_average(categories, isthing=None)
    return 100.0 * res["pq"]


@pytest.mark.parametrize("seed", [0, 3])
def test_vpq_matches_reference(seed, tmp_path):
    rng = np.random.RandomState(seed)
    videos = [_synth_video(rng) for _ in range(3)]
    preds = [v[0] for v in videos]
    gts = [v[1] for v in videos]
    crowds = [v[2] for v in videos]

    windows = (1, 2, 4)
    ours = vpq_eval(preds, gts, N_CLASSES, windows=windows, gt_crowds=crowds)
    for w in windows:
        ref = _reference_vpq(tmp_path, videos, nframes=w)
        assert ours[f"VPQ@{w}"] == pytest.approx(ref, abs=1e-9), (w, ours, ref)
    assert 0.0 < ours["VPQ"] < 100.0
