"""COCO / ADE20k / Mapillary image-dataset registration + image mappers.

Replaces the reference's image-dataset catalogs
(``DVIS_Plus/mask2former/data/datasets/*.py``, ~4.7k LoC of which most is
hard-coded category tables): category metadata is read from the dataset's own
annotation json at registration time, so only the loaders ship.

Three uses in the reference pipeline:
  1. segmenter image pretraining (COCO panoptic/instance, ADE, Mapillary) —
     a single-frame "video" through the same static-target machinery;
  2. COCO pseudo-video joint training (``coco2ytvis*`` splits with category
     remapping, datasets/builtin.py:86-122);
  3. OV training on COCO panoptic.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from dvis_plus_tpu.data.catalog import register_dataset
from dvis_plus_tpu.data.datasets.categories import (
    COCO_TO_OVIS,
    COCO_TO_YTVIS_2019,
    COCO_TO_YTVIS_2021,
)


def load_coco_instances(
    json_file: str, image_root: str, category_filter: Optional[Dict[int, int]] = None
) -> List[dict]:
    """COCO instances json -> per-image records shaped like 1-frame videos.

    ``category_filter`` maps official COCO category ids to a target contiguous
    id space (the COCO_TO_YTVIS/OVIS pseudo-video path); images whose
    annotations all fall outside the map are dropped (reference
    load_coco_json + builtin coco2ytvis splits)."""
    with open(json_file) as f:
        data = json.load(f)

    anns_by_img: Dict[int, List[dict]] = {}
    for ann in data.get("annotations", []):
        anns_by_img.setdefault(ann["image_id"], []).append(ann)

    if category_filter is None:
        cat_ids = sorted(c["id"] for c in data.get("categories", []))
        id_map = {cid: i for i, cid in enumerate(cat_ids)}
    else:
        id_map = dict(category_filter)

    records = []
    for img in data["images"]:
        anns = []
        for a in anns_by_img.get(img["id"], []):
            if a["category_id"] not in id_map:
                continue
            anns.append(
                {
                    "id": a["id"],
                    "category_id": id_map[a["category_id"]],
                    "segmentation": a.get("segmentation"),
                    "bbox": a.get("bbox"),
                    "iscrowd": a.get("iscrowd", 0),
                }
            )
        if category_filter is not None and not anns:
            continue
        records.append(
            {
                "file_name": os.path.join(image_root, img["file_name"]),
                "file_names": [os.path.join(image_root, img["file_name"])],
                "height": img["height"],
                "width": img["width"],
                "length": 1,
                "video_id": img["id"],
                "image_id": img["id"],
                "annotations": [anns],  # per-frame list (1 frame)
            }
        )
    return records


def load_coco_panoptic(json_file: str, image_root: str, pan_root: str) -> List[dict]:
    """COCO panoptic json -> records with per-image RGB-id panoptic PNGs
    (consumed by the PanopticVideoMapper as 1-frame clips)."""
    with open(json_file) as f:
        data = json.load(f)
    isthing = {c["id"]: c.get("isthing", 0) for c in data.get("categories", [])}
    by_img = {a["image_id"]: a for a in data["annotations"]}
    records = []
    for img in data.get("images", []) or [
        {"id": a["image_id"], "file_name": a["file_name"].replace(".png", ".jpg"),
         "height": 0, "width": 0}
        for a in data["annotations"]
    ]:
        a = by_img.get(img["id"])
        if a is None:
            continue
        segments = [
            dict(s, isthing=isthing.get(s["category_id"], 0)) for s in a["segments_info"]
        ]
        records.append(
            {
                "file_names": [os.path.join(image_root, img["file_name"])],
                "pan_seg_file_names": [os.path.join(pan_root, a["file_name"])],
                "segments_infos": [segments],
                "height": img.get("height", 0),
                "width": img.get("width", 0),
                "length": 1,
                "video_id": img["id"],
            }
        )
    return records


def _categories_meta(json_file: str) -> Dict:
    meta: Dict = {}
    if os.path.exists(json_file):
        with open(json_file) as f:
            cats = json.load(f).get("categories", [])
        meta["categories"] = cats
        meta["thing_classes"] = [c["name"] for c in cats if c.get("isthing", 1)]
        meta["stuff_classes"] = [c["name"] for c in cats if not c.get("isthing", 1)]
        meta["thing_dataset_id_to_contiguous_id"] = {
            c["id"]: i for i, c in enumerate(sorted(cats, key=lambda c: c["id"]))
        }
    return meta


def register_all_coco(root: str = "datasets") -> None:
    """COCO instances/panoptic + the coco2ytvis pseudo-video splits
    (reference datasets/builtin.py:86-122) + ADE20k/Mapillary panoptic."""
    coco = os.path.join(root, "coco")
    for split in ("train", "val"):
        jf = os.path.join(coco, "annotations", f"instances_{split}2017.json")
        register_dataset(
            f"coco_2017_{split}",
            lambda j=jf, r=os.path.join(coco, f"{split}2017"): load_coco_instances(j, r),
            json_file=jf,
            evaluator_type="coco",
            **_categories_meta(jf),
        )
        pj = os.path.join(coco, "annotations", f"panoptic_{split}2017.json")
        register_dataset(
            f"coco_2017_{split}_panoptic",
            lambda j=pj, r=os.path.join(coco, f"{split}2017"),
            p=os.path.join(coco, f"panoptic_{split}2017"): load_coco_panoptic(j, r, p),
            json_file=pj,
            evaluator_type="coco_panoptic",
            **_categories_meta(pj),
        )

    # pseudo-video category-mapped splits (image_instance dataset_type)
    for name, mapping in (
        ("coco2ytvis2019_train", COCO_TO_YTVIS_2019),
        ("coco2ytvis2021_train", COCO_TO_YTVIS_2021),
        ("coco2ovis_train", COCO_TO_OVIS),
    ):
        jf = os.path.join(coco, "annotations", "instances_train2017.json")
        register_dataset(
            name,
            lambda j=jf, r=os.path.join(coco, "train2017"), m=mapping: load_coco_instances(
                j, r, category_filter={k: v - 1 for k, v in m.items()}
            ),
            json_file=jf,
            evaluator_type="none",
        )

    # COCO panoptic as pseudo-video for the zero-shot OV training recipe,
    # under the reference's split name (ov_datasets/coco_panoptic_video_ov.py
    # :196-199, register_all_coco_video_ov); consumed by
    # dataset_type 'image_panoptic' -> CocoPanopticPseudoVideoMapper
    pj = os.path.join(coco, "annotations", "panoptic_train2017.json")
    register_dataset(
        "coco_panoptic_video_ov",
        lambda j=pj, r=os.path.join(coco, "train2017"),
        p=os.path.join(coco, "panoptic_train2017"): load_coco_panoptic(j, r, p),
        json_file=pj,
        evaluator_type="none",
        **_categories_meta(pj),
    )

    # ADE20k panoptic + Mapillary Vistas panoptic (same panoptic json layout)
    ade = os.path.join(root, "ADEChallengeData2016")
    jf = os.path.join(ade, "ade20k_panoptic_train.json")
    register_dataset(
        "ade20k_panoptic_train",
        lambda j=jf, r=os.path.join(ade, "images", "training"),
        p=os.path.join(ade, "ade20k_panoptic_train"): load_coco_panoptic(j, r, p),
        json_file=jf,
        evaluator_type="coco_panoptic",
        **_categories_meta(jf),
    )
    mapillary = os.path.join(root, "mapillary_vistas")
    jf = os.path.join(mapillary, "training", "panoptic", "panoptic_2018.json")
    register_dataset(
        "mapillary_vistas_panoptic_train",
        lambda j=jf, r=os.path.join(mapillary, "training", "images"),
        p=os.path.join(mapillary, "training", "panoptic"): load_coco_panoptic(j, r, p),
        json_file=jf,
        evaluator_type="coco_panoptic",
        **_categories_meta(jf),
    )
