"""VPS/VSS mappers on synthetic VIPSeg/VSPW-style data."""
import json
import os

import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.datasets.vps_vss import (
    PanopticVideoMapper,
    SemanticVideoMapper,
    decode_panoptic_png,
    load_vipseg_json,
    load_vspw,
)

H, W, T = 48, 64, 3


def make_cfg():
    cfg = Config()
    cfg.input.sampling_frame_num = 2
    cfg.input.sampling_frame_range = 2
    cfg.input.min_size_train = (32,)
    cfg.input.max_size_train = 64
    cfg.model.criterion.max_num_instances = 6
    return cfg


def test_decode_panoptic_png():
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[0, 0] = [7, 1, 0]  # id = 7 + 256
    ids = decode_panoptic_png(rgb)
    assert ids[0, 0] == 263 and ids[1, 1] == 0


@pytest.fixture(scope="module")
def vipseg_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vipseg")
    img_root, mask_root = root / "images", root / "masks"
    vid = "vidA"
    os.makedirs(img_root / vid)
    os.makedirs(mask_root / vid)
    rng = np.random.RandomState(0)
    frames = []
    for t in range(T):
        name = f"{t:05d}.png"
        cv2.imwrite(str(img_root / vid / name.replace(".png", ".jpg")),
                    rng.randint(0, 255, (H, W, 3), np.uint8))
        # two segments: thing id=5 (cat 1), stuff id=9 (cat 10)
        ids = np.zeros((H, W), np.int32)
        ids[8:20, 8 + t : 24 + t] = 5
        ids[30:, :] = 9
        rgb = np.stack([ids % 256, (ids // 256) % 256, ids // 65536], -1).astype(np.uint8)
        cv2.imwrite(str(mask_root / vid / name), rgb[:, :, ::-1])
        frames.append(
            {
                "file_name": name,
                "segments_info": [
                    {"id": 5, "category_id": 1, "isthing": 1},
                    {"id": 9, "category_id": 10, "isthing": 0},
                ],
                "height": H, "width": W,
            }
        )
    data = {
        "annotations": [{"video_id": vid, "annotations": frames}],
        "categories": [
            {"id": 1, "name": "person", "isthing": 1},
            {"id": 10, "name": "sky", "isthing": 0},
        ],
    }
    jf = root / "gt.json"
    with open(jf, "w") as f:
        json.dump(data, f)
    return str(jf), str(img_root), str(mask_root)


def test_vipseg_mapper(vipseg_data):
    jf, img_root, mask_root = vipseg_data
    records = load_vipseg_json(jf, img_root, mask_root)
    assert len(records) == 1 and records[0]["length"] == T
    cfg = make_cfg()
    # legacy path (no categories): dataset ids pass through
    mapper = PanopticVideoMapper(cfg, is_train=True, thing_ids=[1])
    out = mapper(records[0], seed=3)
    assert out["images"].shape[0] == 2
    # two slots valid: the thing instance and the stuff class
    assert out["valid"].sum() == 2
    assert set(out["labels"][np.asarray(out["valid"])].tolist()) == {1, 10}
    assert out["masks"].any()


def test_vipseg_mapper_contiguous_classes(vipseg_data):
    """With categories metadata, training classes are things-first contiguous
    (reference dataset_mapper_vps.py:111-119/313-320): thing cat 1 -> 0,
    stuff cat 10 -> 1."""
    jf, img_root, mask_root = vipseg_data
    records = load_vipseg_json(jf, img_root, mask_root)
    cats = [
        {"id": 1, "name": "person", "isthing": 1},
        {"id": 10, "name": "sky", "isthing": 0},
    ]
    mapper = PanopticVideoMapper(make_cfg(), is_train=True, categories=cats)
    out = mapper(records[0], seed=3)
    assert set(out["labels"][np.asarray(out["valid"])].tolist()) == {0, 1}

    from dvis_plus_tpu.data.datasets.vps_vss import panoptic_contiguous_maps

    d2c, c2d, n_things = panoptic_contiguous_maps(cats)
    assert d2c == {1: 0, 10: 1} and c2d == {0: 1, 1: 10} and n_things == 1


@pytest.fixture(scope="module")
def vspw_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vspw")
    vid = "v1"
    os.makedirs(root / "data" / vid / "origin")
    os.makedirs(root / "data" / vid / "mask")
    rng = np.random.RandomState(1)
    for t in range(T):
        cv2.imwrite(str(root / "data" / vid / "origin" / f"{t:04d}.jpg"),
                    rng.randint(0, 255, (H, W, 3), np.uint8))
        # raw VSPW convention: 1-based classes, 0 = void, 255 = ignore
        m = np.zeros((H, W), np.uint8)
        m[:20] = 3
        m[20:] = 7
        m[0, 0] = 255  # ignore pixel
        m[0, 1] = 0  # void pixel
        cv2.imwrite(str(root / "data" / vid / "mask" / f"{t:04d}.png"), m)
    with open(root / "train.txt", "w") as f:
        f.write(vid + "\n")
    return str(root)


def test_vspw_mapper(vspw_data):
    records = load_vspw(os.path.join(vspw_data, "data"), os.path.join(vspw_data, "train.txt"))
    assert len(records) == 1
    cfg = make_cfg()
    mapper = SemanticVideoMapper(cfg, is_train=True)
    out = mapper(records[0], seed=5)
    # raw 3/7 shift to 0-based classes 2/6 (reference _vspw_preprocess,
    # dataset_mapper_vss.py:188-195); 0 and 255 both map to void
    assert out["valid"].sum() == 2
    assert set(out["labels"][np.asarray(out["valid"])].tolist()) == {2, 6}
