#!/usr/bin/env python
"""Offline VPS / VSS scoring CLI — the tpu-native equivalent of the
reference's standalone scorer scripts (``DVIS_Plus/utils/eval_vpq_vspw.py``,
``eval_stq_vspw.py``, ``eval_miou_vspw.py``, ``eval_vc_vspw.py``), over
:mod:`dvis_plus_tpu.evaluation.offline_scoring` (scorers verified identical
to the reference — tests/test_vpq_reference_parity.py,
tests/test_vspw_metrics_reference_parity.py).

Usage:
  python tools/eval_video_metrics.py vps --pred-dir OUT/inference/<ds> \\
      --gt-json .../panoptic_gt_VIPSeg_val.json --gt-dir .../panomasksRGB
  python tools/eval_video_metrics.py vss --pred-dir OUT/inference/<ds> \\
      --gt-root .../VSPW_480p [--split val] [--num-classes 124]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvis_plus_tpu.evaluation.offline_scoring import score_vps, score_vss


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="task", required=True)

    vps = sub.add_parser("vps", help="VPQ + STQ on VPSEvaluator output")
    vps.add_argument("--pred-dir", required=True)
    vps.add_argument("--gt-json", required=True)
    vps.add_argument("--gt-dir", required=True)
    vps.add_argument("--windows", type=int, nargs="+", default=[1, 2, 4, 6])
    vps.add_argument("--num-workers", type=int, default=0)

    vss = sub.add_parser("vss", help="mIoU + VC on VSSEvaluator output")
    vss.add_argument("--pred-dir", required=True)
    vss.add_argument("--gt-root", required=True)
    vss.add_argument("--split", default="val")
    vss.add_argument("--num-classes", type=int, default=124)
    vss.add_argument("--vc-clips", type=int, nargs="+", default=[8, 16])

    args = ap.parse_args(argv)
    if args.task == "vps":
        res = score_vps(
            args.pred_dir, args.gt_json, args.gt_dir,
            windows=tuple(args.windows), num_workers=args.num_workers,
        )
    else:
        res = score_vss(
            args.pred_dir, args.gt_root, split=args.split,
            num_classes=args.num_classes, vc_clips=tuple(args.vc_clips),
        )
    print(json.dumps({k: res[k] for k in sorted(res)}, indent=2))
    return res


if __name__ == "__main__":
    main()
