"""VPS (VIPSeg) and VSS (VSPW) dataset loading + mappers.

Re-designs reference ``DVIS_Plus/dvis_Plus/data_video/datasets/vps.py:302-340``
(panoptic VIPSeg registration: images + RGB-encoded panoptic masks +
panoptic_gt json) and ``datasets/vss.py:225-257`` (VSPW split txts), plus the
mappers ``dataset_mapper_vps.py:22`` / ``dataset_mapper_vss.py:20``.

Both tasks reduce to the same static target structure as VIS
(:class:`~dvis_plus_tpu.losses.targets.VideoTargets`):
- VPS: every thing *instance* and every present stuff *class* is one target
  slot (the mask2former panoptic-as-instances formulation); panoptic PNGs are
  RGB id maps (id = R + 256 G + 65536 B);
- VSS: every semantic class present in the clip is one target slot.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.catalog import register_dataset


def decode_panoptic_png(img_rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB -> (H, W) int32 segment ids (panopticapi encoding)."""
    img = img_rgb.astype(np.int64)
    return (img[..., 0] + 256 * img[..., 1] + 65536 * img[..., 2]).astype(np.int32)


def load_vipseg_json(json_file: str, image_root: str, mask_root: str) -> List[dict]:
    with open(json_file) as f:
        data = json.load(f)
    cats = data.get("categories", [])
    thing_ids = [c["id"] for c in cats if c.get("isthing", 0) == 1]
    records = []
    for ann in data["annotations"]:
        vid = ann["video_id"]
        frames = ann["annotations"]
        record = {
            "video_id": vid,
            "length": len(frames),
            "file_names": [
                os.path.join(image_root, vid, f["file_name"].replace(".png", ".jpg"))
                for f in frames
            ],
            "pan_seg_file_names": [
                os.path.join(mask_root, vid, f["file_name"]) for f in frames
            ],
            "segments_infos": [f["segments_info"] for f in frames],
            "height": frames[0].get("height", 720) if frames else 720,
            "width": frames[0].get("width", 1280) if frames else 1280,
        }
        records.append(record)
    return records


def register_all_vipseg(root: str = "datasets") -> None:
    base = os.path.join(root, "VIPSeg/VIPSeg_720P")
    for split in ("train", "val", "test"):
        json_file = os.path.join(base, f"panoptic_gt_VIPSeg_{split}.json")
        name = f"panoVSPW_vps_video_{split}"

        def loader(jf=json_file):
            return load_vipseg_json(
                jf, os.path.join(base, "images"), os.path.join(base, "panomasksRGB")
            )

        meta: Dict = {
            "json_file": json_file,
            "evaluator_type": "vps",
            "gt_dir": os.path.join(base, "panomasksRGB"),
        }
        if os.path.exists(json_file):
            with open(json_file) as f:
                cats = json.load(f).get("categories", [])
            meta["thing_classes"] = [c["name"] for c in cats if c.get("isthing")]
            meta["stuff_classes"] = [c["name"] for c in cats if not c.get("isthing")]
            meta["categories"] = cats
        register_dataset(name, loader, **meta)


def load_vspw(image_root: str, split_txt: str) -> List[dict]:
    with open(split_txt) as f:
        video_names = [l.strip() for l in f if l.strip()]
    records = []
    for vn in video_names:
        img_dir = os.path.join(image_root, vn, "origin")
        mask_dir = os.path.join(image_root, vn, "mask")
        if not os.path.isdir(img_dir):
            continue
        frames = sorted(os.listdir(img_dir))
        records.append(
            {
                "video_id": vn,
                "length": len(frames),
                "file_names": [os.path.join(img_dir, f) for f in frames],
                "sem_seg_file_names": [
                    os.path.join(mask_dir, os.path.splitext(f)[0] + ".png")
                    for f in frames
                ],
            }
        )
    return records


def register_all_vspw(root: str = "datasets") -> None:
    base = os.path.join(root, "VSPW_480p")
    for split in ("train", "val", "test"):
        name = f"VSPW_vss_video_{split}"
        register_dataset(
            name,
            lambda s=split: load_vspw(
                os.path.join(base, "data"), os.path.join(base, f"{split}.txt")
            ),
            evaluator_type="vss",
            num_classes=124,
            gt_root=base,
            split=split,
        )


def panoptic_contiguous_maps(categories):
    """Things-first contiguous training-class mapping from a VIPSeg-style
    categories list (reference ``thing/stuff_ids_to_continue_dic``,
    dataset_mapper_vps.py:111-119: sorted thing ids -> [0, #things), sorted
    stuff ids -> #things + idx). Returns
    ``(dataset_to_contiguous, contiguous_to_dataset, num_things)``."""
    thing_ids = sorted(c["id"] for c in categories if c.get("isthing"))
    stuff_ids = sorted(c["id"] for c in categories if not c.get("isthing"))
    d2c = {id_: i for i, id_ in enumerate(thing_ids)}
    d2c.update({id_: len(thing_ids) + i for i, id_ in enumerate(stuff_ids)})
    return d2c, {v: k for k, v in d2c.items()}, len(thing_ids)


class PanopticVideoMapper:
    """VIPSeg record -> static clip arrays. Thing segments become per-id
    instance slots; stuff categories become one slot each (reference
    dataset_mapper_vps.py target construction). With ``categories`` given,
    training classes are the things-first contiguous ids (reference
    dataset_mapper_vps.py:313-320); without it, dataset ids pass through
    and ``thing_ids`` only decides instance-vs-class slotting."""

    def __init__(self, cfg: Config, is_train: bool = True, thing_ids=None,
                 ignore_label: int = 255, categories=None):
        from dvis_plus_tpu.data.mapper import YTVISDatasetMapper

        self._base = YTVISDatasetMapper(cfg, is_train=is_train)
        self.cfg = cfg
        self.is_train = is_train
        if categories:
            self.dataset_to_contiguous, _, n_things = panoptic_contiguous_maps(categories)
            self.thing_ids = {c["id"] for c in categories if c.get("isthing")}
        else:
            self.dataset_to_contiguous = None
            self.thing_ids = set(thing_ids or [])
        self.ignore_label = ignore_label

    def __call__(self, record: dict, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        import cv2

        # build a YTVIS-style record with synthesized per-frame annotations
        rec = dict(record)
        anns_per_frame = []
        for fi, (mask_path, seginfo) in enumerate(
            zip(record["pan_seg_file_names"], record["segments_infos"])
        ):
            img = cv2.imread(mask_path, cv2.IMREAD_COLOR)
            frame_anns = []
            if img is not None:
                ids = decode_panoptic_png(img[:, :, ::-1])
                for seg in seginfo:
                    m = (ids == seg["id"]).astype(np.uint8)
                    if not m.any():
                        continue
                    cat = seg["category_id"]
                    isthing = seg.get("isthing", cat in self.thing_ids)
                    if self.dataset_to_contiguous is not None:
                        cat = self.dataset_to_contiguous[cat]
                    # stuff of the same category merges to one slot id
                    slot_id = seg["id"] if isthing else -1000 - cat
                    frame_anns.append(
                        {
                            "id": slot_id,
                            "category_id": cat,
                            "segmentation": None,
                            "_mask": m,
                            "iscrowd": 0,
                        }
                    )
            anns_per_frame.append(frame_anns)
        rec["annotations"] = anns_per_frame
        return self._map_with_masks(rec, seed)

    def _map_with_masks(self, rec, seed):
        """Like YTVISDatasetMapper.__call__ with pre-decoded {"_raw"} masks."""
        for frame in rec["annotations"]:
            for a in frame:
                if "_mask" in a:
                    a["segmentation"] = {"_raw": a.pop("_mask")}
        return self._base(rec, seed)


class SemanticVideoMapper:
    """VSPW record -> clip arrays; each semantic class present becomes one
    target slot (reference dataset_mapper_vss.py:20)."""

    def __init__(self, cfg: Config, is_train: bool = True, num_classes: int = 124, ignore_label: int = 255):
        from dvis_plus_tpu.data.mapper import YTVISDatasetMapper

        self._pan = PanopticVideoMapper(cfg, is_train=is_train)
        self.num_classes = num_classes
        self.ignore_label = ignore_label

    @staticmethod
    def vspw_preprocess(m: np.ndarray) -> np.ndarray:
        """Raw VSPW masks are 1-based with 0 = void and 255 = ignore; shift to
        0-based classes with 255 void (reference ``_vspw_preprocess``,
        dataset_mapper_vss.py:188-195)."""
        m = m.astype(np.int32)
        m = np.where(m == 0, 255, m) - 1
        return np.where(m == 254, 255, m)

    def __call__(self, record: dict, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        import cv2

        rec = dict(record)
        anns_per_frame = []
        for mask_path in record["sem_seg_file_names"]:
            m = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
            frame_anns = []
            if m is not None:
                m = self.vspw_preprocess(m)
                for c in np.unique(m):
                    if c == self.ignore_label or c >= self.num_classes:
                        continue
                    frame_anns.append(
                        {
                            "id": -1000 - int(c),
                            "category_id": int(c),
                            "segmentation": {"_raw": (m == c).astype(np.uint8)},
                            "iscrowd": 0,
                        }
                    )
            anns_per_frame.append(frame_anns)
        rec["annotations"] = anns_per_frame
        return self._pan._map_with_masks(rec, seed)
