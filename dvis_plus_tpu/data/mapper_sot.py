"""SOT / VOS dataset mapper (class-agnostic single-object tracks).

Re-designs reference ``SOTDatasetMapper``
(``DVIS_DAQ/dvis_Plus/data_video/dataset_mapper_sot.py:116``): video object
segmentation clips where every annotated object is class-agnostic
(category 0); at inference the first-frame GT masks are provided and drive
track assignment (semi-supervised VOS — reference
``inference_video_vos`` DVIS_DAQ/dvis_daq/meta_architecture.py:598).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.mapper import YTVISDatasetMapper


class SOTDatasetMapper:
    def __init__(self, cfg: Config, is_train: bool = True):
        self._base = YTVISDatasetMapper(cfg, is_train=is_train)
        self.is_train = is_train

    def __call__(self, record: dict, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        rec = dict(record)
        if rec.get("annotations") is not None:
            rec["annotations"] = [
                [dict(a, category_id=0) for a in frame] for frame in rec["annotations"]
            ]
        out = self._base(rec, seed)
        if self.is_train and "labels" in out:
            out["labels"][:] = 0
        return out


def assign_tracks_to_first_frame_gt(
    pred_masks_f0: np.ndarray,  # (S, H, W) bool predictions at frame 0
    gt_masks_f0: np.ndarray,  # (G, H, W) bool given first-frame masks
) -> np.ndarray:
    """Semi-supervised VOS assignment: each GT object takes the predicted
    track with max first-frame IoU (reference inference_video_vos)."""
    G, S = gt_masks_f0.shape[0], pred_masks_f0.shape[0]
    out = np.full((G,), -1, np.int64)
    used = set()
    ious = np.zeros((G, S))
    for g in range(G):
        for s in range(S):
            inter = np.logical_and(gt_masks_f0[g], pred_masks_f0[s]).sum()
            union = np.logical_or(gt_masks_f0[g], pred_masks_f0[s]).sum()
            ious[g, s] = inter / union if union else 0.0
    for g in np.argsort(-ious.max(axis=1)):
        order = np.argsort(-ious[g])
        for s in order:
            if s not in used:
                out[g] = s
                used.add(s)
                break
    return out
