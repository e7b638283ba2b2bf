"""AP-scorer parity: our native tube-IoU VIS scorer (evaluation/ytvos_eval.py)
vs the ACTUAL reference YTVOS/YTVOSeval stack (DVIS_Plus/dvis_Plus/data_video/
datasets/ytvis_api/{ytvos,ytvoseval}.py) run as an oracle with
``pycocotools.mask`` backed by our native RLE codec (tools/refshim.py::
load_ytvos_eval_oracle).

This closes the last gap between activation parity and the reported metric:
if the scorer itself disagreed, every AP claim would shift.
"""
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dvis_plus_tpu.evaluation.ytvos_eval import evaluate_vis
from dvis_plus_tpu.utils import rle as rle_codec


def _rle_str(mask):
    e = rle_codec.encode(mask)
    return {"size": e["size"], "counts": e["counts"].decode()}


def _rand_box_mask(rng, H, W):
    h = rng.randint(3, H // 2)
    w = rng.randint(3, W // 2)
    y = rng.randint(0, H - h)
    x = rng.randint(0, W - w)
    m = np.zeros((H, W), bool)
    m[y : y + h, x : x + w] = True
    return m


def _jitter(rng, mask, amp=1):
    # shift the GT box to get predictions with a spread of IoUs
    dy, dx = rng.randint(-amp, amp + 1), rng.randint(-amp, amp + 1)
    return np.roll(np.roll(mask, dy, axis=0), dx, axis=1)


def _synth(seed=0, n_videos=3, n_cats=3, H=24, W=32):
    rng = np.random.RandomState(seed)
    videos, gts, preds = [], [], []
    ann_id = 1
    lengths = {}
    for vid in range(1, n_videos + 1):
        T = int(rng.randint(3, 6))
        lengths[vid] = T
        videos.append(
            {
                "id": vid,
                "height": H,
                "width": W,
                "length": T,
                "file_names": [f"v{vid}/{t}.jpg" for t in range(T)],
            }
        )
        for k in range(rng.randint(2, 4)):
            cat = int(rng.randint(1, n_cats + 1))
            base = _rand_box_mask(rng, H, W)
            segs, areas = [], []
            for t in range(T):
                if rng.rand() < 0.2:  # disappearing frames
                    segs.append(None)
                    areas.append(None)
                else:
                    m = _jitter(rng, base, amp=1)
                    segs.append(_rle_str(m))
                    areas.append(int(m.sum()))
            valid_areas = [a for a in areas if a]
            gts.append(
                {
                    "id": ann_id,
                    "video_id": vid,
                    "category_id": cat,
                    "segmentations": segs,
                    "areas": areas,
                    "avg_area": float(np.mean(valid_areas)) if valid_areas else 0.0,
                    "iscrowd": int(ann_id % 7 == 0),  # one crowd GT in the mix
                }
            )
            ann_id += 1
            # a few predictions per GT at varying IoU + one pure miss per video
            for j in range(rng.randint(1, 4)):
                # j=0: near-exact track; later: progressively sloppier
                psegs = [
                    None if s is None and rng.rand() < 0.5
                    else _rle_str(_jitter(rng, base, amp=1 + 2 * j))
                    for s in segs
                ]
                preds.append(
                    {
                        "video_id": vid,
                        "category_id": int(
                            cat if rng.rand() < 0.8 else rng.randint(1, n_cats + 1)
                        ),
                        "score": float(rng.rand()),
                        "segmentations": psegs,
                    }
                )
        preds.append(
            {
                "video_id": vid,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "score": float(rng.rand()),
                "segmentations": [_rle_str(_rand_box_mask(rng, H, W)) for _ in range(T)],
            }
        )
    cats = [{"id": c, "name": f"c{c}"} for c in range(1, n_cats + 1)]
    gt_json = {"videos": videos, "annotations": gts, "categories": cats}
    return gt_json, gts, preds, lengths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_matches_reference_ytvoseval(seed, tmp_path):
    from refshim import load_ytvos_eval_oracle

    oracle = load_ytvos_eval_oracle()
    gt_json, gts, preds, lengths = _synth(seed=seed)

    gt_path = tmp_path / "gt.json"
    with open(gt_path, "w") as f:
        json.dump(gt_json, f)

    ytvos = oracle["YTVOS"](str(gt_path))
    dt = ytvos.loadRes([dict(p) for p in preds])
    E = oracle["YTVOSeval"](ytvos, dt, "segm")
    E.evaluate()
    E.accumulate()
    E.summarize()
    ref = {"AP": E.stats[0], "AP50": E.stats[1], "AP75": E.stats[2], "AR100": E.stats[8]}

    ours = evaluate_vis(gts, preds, lengths)
    for k, v in ref.items():
        assert ours[k] == pytest.approx(v, abs=1e-9), (k, ours[k], v, ours, ref)
    assert ours["AP"] > 0.01  # non-degenerate scenario
