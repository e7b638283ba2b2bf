"""Data pipeline: synthetic YTVIS-style dataset -> mapper -> loader -> batch."""
import json
import os

import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.build import CombinedDataLoader, build_test_loader, build_train_loader
from dvis_plus_tpu.data.catalog import get_dataset, get_metadata, is_registered
from dvis_plus_tpu.data.datasets.ytvis import load_ytvis_json, register_ytvis_instances
from dvis_plus_tpu.data.mapper import YTVISDatasetMapper, select_frames
from dvis_plus_tpu.utils import rle as rle_codec


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytvis")
    return build_synth_dataset(root)


def build_synth_dataset(root):
    """Materialize + register the tiny synthetic YTVIS set under ``root``.
    Plain function (not a fixture) so tools/serving_deviation_ap.py can
    reuse it outside pytest."""
    from pathlib import Path

    root = Path(root)
    img_root = root / "imgs"
    os.makedirs(img_root, exist_ok=True)
    import cv2

    H, W, L = 60, 80, 6
    videos, annotations = [], []
    rng = np.random.RandomState(0)
    for vid in range(1, 3):
        file_names = []
        for f in range(L):
            name = f"v{vid}/{f:03d}.jpg"
            os.makedirs(img_root / f"v{vid}", exist_ok=True)
            cv2.imwrite(str(img_root / name), rng.randint(0, 255, (H, W, 3), np.uint8))
            file_names.append(name)
        videos.append(
            {"id": vid, "file_names": file_names, "height": H, "width": W, "length": L}
        )
        # two instances; one disappears halfway
        for k in range(2):
            segs = []
            for f in range(L):
                if k == 1 and f >= 3:
                    segs.append(None)
                else:
                    m = np.zeros((H, W), np.uint8)
                    m[10 + 5 * k : 30 + 5 * k, 10 + f : 40 + f] = 1
                    e = rle_codec.encode(m)
                    segs.append(
                        {"size": e["size"], "counts": e["counts"].decode("ascii")}
                    )
            annotations.append(
                {
                    "id": vid * 10 + k,
                    "video_id": vid,
                    "category_id": k + 1,
                    "segmentations": segs,
                    "iscrowd": 0,
                }
            )
    data = {
        "videos": videos,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    json_path = root / "train.json"
    with open(json_path, "w") as f:
        json.dump(data, f)
    register_ytvis_instances("synth_train", str(json_path), str(img_root), ["a", "b"])
    return str(json_path), str(img_root)


def make_cfg():
    cfg = Config()
    cfg.input.sampling_frame_num = 3
    cfg.input.sampling_frame_range = 2
    cfg.input.min_size_train = (32, 48)
    cfg.input.max_size_train = 64
    cfg.input.min_size_test = 48
    cfg.input.max_size_test = 64
    cfg.model.criterion.max_num_instances = 4
    cfg.solver.ims_per_batch = 2
    cfg.datasets.train = ("synth_train",)
    return cfg


def test_load_and_catalog(synth_dataset):
    assert is_registered("synth_train")
    records = get_dataset("synth_train")
    assert len(records) == 2
    assert len(records[0]["annotations"]) == 6
    # category remapped to contiguous
    cats = {a["category_id"] for fr in records[0]["annotations"] for a in fr}
    assert cats <= {0, 1}
    md = get_metadata("synth_train")
    assert md.thing_classes == ["a", "b"]


def test_select_frames_contiguous_and_random():
    import random

    rng = random.Random(0)
    idx = select_frames(10, 5, 2, False, rng)  # 2*2+1==5 -> contiguous
    diffs = np.diff(idx)
    assert np.all(diffs == 1) or np.all(diffs == -1)
    idx2 = select_frames(10, 3, 5, False, rng)
    assert len(idx2) == 3 and idx2 == sorted(idx2)


def test_train_mapper_static_shapes(synth_dataset):
    cfg = make_cfg()
    mapper = YTVISDatasetMapper(cfg, is_train=True)
    rec = get_dataset("synth_train")[0]
    out = mapper(rec, seed=7)
    T, H, W = 3, 64, 64  # canvas = (round_up(48,32), round_up(64,32))
    assert out["images"].shape == (T, H, W, 3)
    assert out["masks"].shape == (4, T, H, W)
    assert out["labels"].shape == (4,)
    assert out["valid"].sum() == 2
    # masks land inside the valid region
    h, w = out["image_size"]
    assert not out["masks"][:, :, h:, :].any()
    assert not out["masks"][:, :, :, w:].any()
    # instance 2 absent in frames >= 3 of the source video
    n_valid_frames = out["frame_valid"].sum()
    assert n_valid_frames >= 3


def test_train_loader_batches(synth_dataset):
    cfg = make_cfg()
    it = build_train_loader(cfg, "synth_train", seed=1, num_workers=2)
    batch = next(it)
    assert batch["images"].shape[0] == 2
    assert batch["masks"].shape[:2] == (2, 4)
    batch2 = next(it)
    assert batch2["images"].shape == batch["images"].shape


def test_combined_loader_ratio(synth_dataset):
    a = iter(lambda: "a", None)
    b = iter(lambda: "b", None)
    comb = CombinedDataLoader([a, b], [0.9, 0.1], seed=0)
    picks = [next(comb) for _ in range(200)]
    assert picks.count("a") > 140


def test_test_loader_full_video(synth_dataset):
    cfg = make_cfg()
    it = build_test_loader(cfg, "synth_train")
    sample = next(it)
    assert sample["images"].shape[0] == 6  # all frames
    assert "masks" not in sample
    assert sample["images"].shape[1] % 32 == 0


def test_shard_records_partition():
    """Process-strided eval sharding (reference d2 InferenceSampler):
    shards are disjoint and jointly cover the dataset."""
    from dvis_plus_tpu.data.build import shard_records

    records = [{"video_id": i} for i in range(11)]
    for count in (1, 2, 3, 8, 16):
        shards = [shard_records(records, i, count) for i in range(count)]
        flat = [r["video_id"] for s in shards for r in s]
        assert sorted(flat) == list(range(11))
        assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1
