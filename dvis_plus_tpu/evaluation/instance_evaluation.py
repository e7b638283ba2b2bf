"""COCO-style image instance evaluation + semantic test-time augmentation.

Re-designs reference ``InstanceSegEvaluator``
(``DVIS_Plus/mask2former/evaluation/instance_evaluation.py``) and
``SemanticSegmentorWithTTA`` (``test_time_augmentation.py``):

- image instance AP reuses the video scorer with one-frame tracks (the
  spatio-temporal tube IoU degenerates to mask IoU at T=1);
- semantic TTA averages class probabilities over horizontal flip and a set of
  scales (the reference's flip-based TTA).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

from dvis_plus_tpu.evaluation.ytvos_eval import evaluate_vis
from dvis_plus_tpu.utils import rle as rle_codec


def evaluate_instances(
    gt_annotations: List[dict],  # {image_id, category_id, segmentation, iscrowd}
    predictions: List[dict],  # {image_id, category_id, score, segmentation}
    max_dets: int = 100,
) -> Dict[str, float]:
    """Image instance AP via the T=1 video protocol."""
    gts = [
        {
            "video_id": g["image_id"],
            "category_id": g["category_id"],
            "segmentations": [g["segmentation"]],
            "iscrowd": g.get("iscrowd", 0),
        }
        for g in gt_annotations
    ]
    dts = [
        {
            "video_id": d["image_id"],
            "category_id": d["category_id"],
            "score": d["score"],
            "segmentations": [d["segmentation"]],
        }
        for d in predictions
    ]
    image_ids = {g["video_id"]: 1 for g in gts}
    image_ids.update({d["video_id"]: 1 for d in dts})
    return evaluate_vis(gts, dts, image_ids, max_dets=max_dets)


def semantic_tta(
    predict_probs: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,  # (H, W, 3)
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
) -> np.ndarray:
    """Average class probabilities over flips/scales -> (H, W, K)."""
    import cv2

    H, W = image.shape[:2]
    acc = None
    n = 0
    for s in scales:
        img = (
            image
            if s == 1.0
            else cv2.resize(image, (int(W * s), int(H * s)), interpolation=cv2.INTER_LINEAR)
        )
        variants = [img, img[:, ::-1]] if flip else [img]
        for vi, v in enumerate(variants):
            p = predict_probs(np.ascontiguousarray(v))  # (h, w, K)
            if vi == 1:
                p = p[:, ::-1]
            if p.shape[:2] != (H, W):
                p = cv2.resize(p, (W, H), interpolation=cv2.INTER_LINEAR)
            acc = p if acc is None else acc + p
            n += 1
    return acc / n
