"""COCO image -> pseudo-video clip training support.

Re-designs reference ``CocoClipDatasetMapper``
(``DVIS_Plus/dvis_Plus/data_video/dataset_mapper.py:380+``) and the pseudo
augmentation builder (``augmentation.py`` build_pseudo_augmentation): a single
COCO-style image record is repeated T times and each repeat receives a
*different* geometric jitter (rotation / scale-crop), simulating motion; the
instance identity is the annotation id so the clip has consistent tracks.
Category ids can be remapped into the video dataset's space
(COCO_TO_* tables in :mod:`dvis_plus_tpu.data.datasets.categories`).
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional

import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.augmentation import (
    RandomFlip,
    RandomRotation,
    ResizeShortestEdge,
    apply_clip_transforms,
)
from dvis_plus_tpu.data.mapper import YTVISDatasetMapper, decode_segmentation


class CocoPseudoVideoMapper:
    """COCO image record -> pseudo-video clip arrays (static shapes)."""

    def __init__(self, cfg: Config, is_train: bool = True, category_map: Optional[Dict[int, int]] = None):
        self.base = YTVISDatasetMapper(cfg, is_train=is_train)
        if is_train:
            from dvis_plus_tpu.data.augmentation import build_pseudo_augmentation

            # pseudo-clip recipe: LSJ resize-scale + fixed-size crop when
            # input.lsj_aug (reference build_pseudo_augmentation :507-560)
            self.base.augs = build_pseudo_augmentation(cfg.input)
        self.cfg = cfg
        self.num_frames = cfg.input.sampling_frame_num
        self.category_map = category_map  # official coco id -> contiguous video id
        self.rotation = RandomRotation((-15, 15), prob=0.5)

    def __call__(self, record: dict, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        import cv2

        rng = random.Random(seed)
        img = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
        if img is None:
            img = np.zeros((record.get("height", 480), record.get("width", 640), 3), np.uint8)
        H0, W0 = img.shape[:2]

        raw_anns = record.get("annotations", [])
        if raw_anns and isinstance(raw_anns[0], list):
            raw_anns = raw_anns[0]  # 1-frame video-style record (coco catalog)
        anns = []
        for a in raw_anns:
            cat = a["category_id"]
            if self.category_map is not None:
                if cat not in self.category_map:
                    continue
                cat = self.category_map[cat]
            anns.append(
                {
                    "id": a.get("id", len(anns)),
                    "category_id": cat,
                    "segmentation": a.get("segmentation"),
                    "iscrowd": a.get("iscrowd", 0),
                }
            )

        # synthesize per-frame jitter: same base image, per-frame rotation
        frames, per_frame_anns = [], []
        for t in range(self.num_frames):
            rot = self.rotation.sample(H0, W0, rng)
            f = rot.apply_image(img[:, :, ::-1])
            frame_anns = []
            for a in anns:
                m = decode_segmentation(a["segmentation"], H0, W0)
                m = rot.apply_mask(m)
                frame_anns.append(
                    {
                        "id": a["id"],
                        "category_id": a["category_id"],
                        "segmentation": {"_raw": m},
                        "iscrowd": a["iscrowd"],
                    }
                )
            frames.append(f)  # RGB
            per_frame_anns.append(frame_anns)

        # dimensions may differ per frame after rotation-expansion; unify on
        # the max canvas before handing to the base mapper
        mh = max(f.shape[0] for f in frames)
        mw = max(f.shape[1] for f in frames)
        frames = [
            np.pad(f, ((0, mh - f.shape[0]), (0, mw - f.shape[1]), (0, 0))) for f in frames
        ]
        per_frame_anns = [
            [
                dict(a, segmentation={"_raw": np.pad(
                    a["segmentation"]["_raw"],
                    ((0, mh - a["segmentation"]["_raw"].shape[0]),
                     (0, mw - a["segmentation"]["_raw"].shape[1])),
                )})
                for a in fa
            ]
            for fa in per_frame_anns
        ]

        # rotation may change per-frame canvas sizes; the mapper needs uniform
        # frames — the padding above already unified them
        rec = {
            "file_names": [record["file_name"]] * self.num_frames,
            "height": record.get("height", H0),
            "width": record.get("width", W0),
            "length": self.num_frames,
            "video_id": record.get("image_id", 0),
            "annotations": per_frame_anns,
            "_frames": frames,  # in-memory RGB frames consumed by the mapper
        }
        return self.base(rec, seed=seed)


class CocoPanopticPseudoVideoMapper(CocoPseudoVideoMapper):
    """COCO *panoptic* image record -> pseudo-video clip.

    Re-designs reference ``OpenVocabularyCocoPanoClipDatasetMapper``
    (``DVIS_Plus/ov_dvis/data_video/dataset_mapper.py:135-363``): the panoptic
    PNG is id-decoded and every non-crowd segment — things AND stuff — becomes
    one tracked pseudo-video instance whose class is the things-first
    contiguous id (reference ``_get_coco_panoptic_meta_ov``,
    ``ov_datasets/coco_panoptic_video_ov.py:158-194``; that ordering equals the
    ``coco_panoptic_with_prompt_eng.txt`` vocabulary row order). This is the
    training data path of the zero-shot OV recipes (``FC-CLIP_*`` /
    ``DVIS_*_zero_shot`` configs train on ``coco_panoptic_video_ov``)."""

    def __init__(self, cfg: Config, is_train: bool = True, categories=None):
        super().__init__(cfg, is_train=is_train)
        self.dataset_to_contiguous = None
        if categories:
            from dvis_plus_tpu.data.datasets.vps_vss import panoptic_contiguous_maps

            self.dataset_to_contiguous, _, _ = panoptic_contiguous_maps(categories)

    def __call__(self, record: dict, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        import cv2

        from dvis_plus_tpu.data.datasets.vps_vss import decode_panoptic_png

        pan = cv2.imread(record["pan_seg_file_names"][0], cv2.IMREAD_COLOR)
        segments = record.get("segments_infos", [[]])[0]
        anns = []
        if pan is not None:
            seg_ids = decode_panoptic_png(pan[:, :, ::-1])  # BGR -> RGB
            for s in segments:
                if s.get("iscrowd", 0):
                    continue  # reference keeps non-crowd only (:330-333)
                cat = s["category_id"]
                if self.dataset_to_contiguous is not None:
                    if cat not in self.dataset_to_contiguous:
                        continue
                    cat = self.dataset_to_contiguous[cat]
                mask = (seg_ids == s["id"]).astype(np.uint8)
                if not mask.any():
                    continue
                anns.append({
                    "id": s["id"],
                    "category_id": cat,
                    "segmentation": {"_raw": mask},
                    "iscrowd": 0,
                })
        # records missing the images list carry height/width 0 — fall back
        # to the decoded panoptic PNG's dimensions
        inst_record = {
            "file_name": record["file_names"][0],
            "image_id": record.get("video_id", 0),
            "height": record.get("height", 0) or (pan.shape[0] if pan is not None else 0),
            "width": record.get("width", 0) or (pan.shape[1] if pan is not None else 0),
            "annotations": anns,
        }
        return super().__call__(inst_record, seed=seed)
