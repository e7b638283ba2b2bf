"""The offline VPS/VSS scoring CLI (tools/eval_video_metrics.py) on synthetic
output/GT trees in the exact on-disk formats our evaluators and the datasets
use. A perfect prediction must score 100 everywhere; id renumbering between
pred and GT must not matter (tube metrics are relabel-invariant)."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from eval_video_metrics import main as tool_main  # noqa: E402

H, W, T = 24, 32, 5


def _write_pan_png(path, lab):
    import cv2

    img = np.zeros((*lab.shape, 3), np.uint8)
    img[..., 0] = lab % 256
    img[..., 1] = (lab // 256) % 256
    img[..., 2] = lab // 65536
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img[:, :, ::-1])


def _vps_tree(root, tag, seg_ids, crowd_gt=False):
    """One-video panoptic tree: segment A (thing cat 2) moving box, segment B
    (stuff cat 5) bottom band, segment C (thing cat 7, optionally crowd)."""
    a, b, c = seg_ids
    annos = []
    for t in range(T):
        lab = np.zeros((H, W), np.int64)
        lab[2:10, 2 + t : 12 + t] = a
        lab[16:, :] = b
        lab[2:8, 20:30] = c
        _write_pan_png(os.path.join(root, "v1", f"{t:05d}.png"), lab)
        segs = [
            {"id": a, "category_id": 2, "isthing": 1, "area": int((lab == a).sum()),
             "iscrowd": 0},
            {"id": b, "category_id": 5, "isthing": 0, "area": int((lab == b).sum()),
             "iscrowd": 0},
            {"id": c, "category_id": 7, "isthing": 1, "area": int((lab == c).sum()),
             "iscrowd": 1 if crowd_gt else 0},
        ]
        annos.append({"file_name": f"{t:05d}.png", "segments_info": segs})
    return {"video_id": "v1", "annotations": annos}


def test_vps_tool_perfect_prediction(tmp_path):
    gt_dir = tmp_path / "panomasksRGB"
    pred_dir = tmp_path / "pred"
    gt_anno = _vps_tree(str(gt_dir), "gt", (4, 9, 11), crowd_gt=True)
    pred_anno = _vps_tree(str(pred_dir / "pan_pred"), "pr", (70, 3, 12))

    gt_json = tmp_path / "gt.json"
    with open(gt_json, "w") as f:
        json.dump(
            {
                # interleaved thing/stuff dataset ids, like real VIPSeg
                "categories": [
                    {"id": 2, "name": "cat", "isthing": 1},
                    {"id": 5, "name": "sky", "isthing": 0},
                    {"id": 7, "name": "dog", "isthing": 1},
                ],
                "annotations": [gt_anno],
            },
            f,
        )
    with open(pred_dir / "pred.json", "w") as f:
        json.dump({"annotations": [pred_anno]}, f)

    res = tool_main(
        ["vps", "--pred-dir", str(pred_dir), "--gt-json", str(gt_json),
         "--gt-dir", str(gt_dir), "--windows", "1", "2", "4"]
    )
    assert res["videos"] == 1
    for k in ("VPQ", "VPQ@1", "VPQ@2", "VPQ@4", "SQ", "AQ", "STQ"):
        assert res[k] == 100.0, (k, res)


def test_vps_tool_rejects_unknown_category(tmp_path):
    import pytest

    gt_dir = tmp_path / "panomasksRGB"
    pred_dir = tmp_path / "pred"
    gt_anno = _vps_tree(str(gt_dir), "gt", (4, 9, 11))
    pred_anno = _vps_tree(str(pred_dir / "pan_pred"), "pr", (4, 9, 11))
    pred_anno["annotations"][0]["segments_info"][0]["category_id"] = 99

    gt_json = tmp_path / "gt.json"
    with open(gt_json, "w") as f:
        json.dump(
            {
                "categories": [
                    {"id": 2, "name": "cat", "isthing": 1},
                    {"id": 5, "name": "sky", "isthing": 0},
                    {"id": 7, "name": "dog", "isthing": 1},
                ],
                "annotations": [gt_anno],
            },
            f,
        )
    with open(pred_dir / "pred.json", "w") as f:
        json.dump({"annotations": [pred_anno]}, f)

    with pytest.raises(KeyError, match="unknown category_id 99"):
        tool_main(
            ["vps", "--pred-dir", str(pred_dir), "--gt-json", str(gt_json),
             "--gt-dir", str(gt_dir)]
        )


def test_vss_tool_perfect_prediction(tmp_path):
    import cv2

    gt_root = tmp_path / "VSPW"
    pred_dir = tmp_path / "pred"
    names = ["v1", "v2"]
    for vid in names:
        for t in range(T):
            # raw VSPW: 1-based classes, 0 = void
            m = np.full((H, W), 3, np.uint8)
            m[:8] = 1
            m[0, 0] = 0
            p = os.path.join(gt_root, "data", vid, "mask", f"{t:05d}.png")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            cv2.imwrite(p, m)
            # perfect prediction in the shifted 0-based space
            shifted = np.where(m == 0, 255, m.astype(np.int64) - 1)
            q = os.path.join(pred_dir, vid, f"{t:05d}.png")
            os.makedirs(os.path.dirname(q), exist_ok=True)
            cv2.imwrite(q, shifted.astype(np.uint8))
    with open(gt_root / "val.txt", "w") as f:
        f.write("\n".join(names) + "\n")

    res = tool_main(
        ["vss", "--pred-dir", str(pred_dir), "--gt-root", str(gt_root),
         "--num-classes", "8", "--vc-clips", "2", "4"]
    )
    assert res["videos"] == 2
    assert res["mIoU"] == 100.0
    assert res["VC2"] == 100.0 and res["VC4"] == 100.0
