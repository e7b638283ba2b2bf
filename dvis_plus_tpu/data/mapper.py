"""Dataset mappers: video records -> static-shape training/eval arrays.

Re-designs reference ``YTVISDatasetMapper``
(``DVIS_Plus/dvis_Plus/data_video/dataset_mapper.py:137-379``):

- clip sampling (select_frames :234-289): contiguous window (with optional
  reverse augmentation) when ``range*2+1 == num``, else reference frame +-
  range random choice, sorted;
- per-frame decode (RLE via the native codec, polygons via cv2.fillPoly),
  clip-consistent augmentation, normalization;
- instance table keyed by annotation id across the sampled frames, with
  ``ids == -1`` absence encoding (:300-360).

TPU delta: instead of detectron2's per-batch dynamic padding, every training
clip lands on ONE static canvas (padded to cfg-derived H x W, instances padded
to a fixed capacity N with validity masks) so the train step compiles once.
Portrait clips whose resized height exceeds the canvas are scaled to fit — a
documented deviation that keeps shapes static.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.augmentation import (
    apply_clip_transforms,
    build_test_augmentation,
    build_train_augmentation,
)
from dvis_plus_tpu.utils import rle as rle_codec


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def decode_segmentation(seg, h: int, w: int) -> np.ndarray:
    """RLE dict / polygon list / pre-decoded {"_raw": mask} -> (h, w) uint8."""
    if seg is None:
        return np.zeros((h, w), np.uint8)
    if isinstance(seg, dict):
        if "_raw" in seg:  # pre-decoded (panoptic/semantic mappers)
            return seg["_raw"]
        return rle_codec.decode(seg)
    # polygon: list of [x0, y0, x1, y1, ...]
    mask = np.zeros((h, w), np.uint8)
    polys = [np.asarray(p, np.float64).reshape(-1, 2).astype(np.int32) for p in seg]
    cv2.fillPoly(mask, polys, 1)
    return mask


def select_frames(
    video_length: int,
    num: int,
    frame_range: int,
    shuffle: bool,
    rng: random.Random,
) -> List[int]:
    """Clip frame sampling (dataset_mapper.py:234-289)."""
    if frame_range * 2 + 1 == num:
        # contiguous window, with reverse augmentation
        if num > video_length:
            idx = list(range(video_length)) + [video_length - 1] * (num - video_length)
        else:
            start = rng.randint(0, video_length - num)
            idx = list(range(start, start + num))
        if rng.random() < 0.5:
            idx = idx[::-1]
        return idx
    ref = rng.randrange(video_length)
    lo = max(0, ref - frame_range)
    hi = min(video_length, ref + frame_range + 1)
    pool = [i for i in range(lo, hi) if i != ref]
    if len(pool) >= num - 1:
        picks = rng.sample(pool, num - 1)
    else:
        picks = [rng.choice(pool) if pool else ref for _ in range(num - 1)]
    idx = sorted(picks + [ref])
    if shuffle:
        rng.shuffle(idx)
    return idx


class YTVISDatasetMapper:
    """record -> {"images": (T, H, W, 3) f32 normalized+padded,
    "labels"/"masks"/"valid"/"frame_valid" padded target arrays,
    "image_size": valid (h, w) on the canvas, "height"/"width": original}."""

    def __init__(self, cfg: Config, is_train: bool = True, id_to_contiguous=None):
        self.cfg = cfg
        self.is_train = is_train
        self.num_frames = cfg.input.sampling_frame_num if is_train else None
        self.frame_range = cfg.input.sampling_frame_range
        self.shuffle = cfg.input.sampling_frame_shuffle
        self.augs = (
            build_train_augmentation(cfg.input)
            if is_train
            else build_test_augmentation(cfg.input)
        )
        self.pixel_mean = np.asarray(cfg.model.pixel_mean, np.float32)
        self.pixel_std = np.asarray(cfg.model.pixel_std, np.float32)
        self.div = cfg.model.size_divisibility
        self.max_instances = cfg.model.criterion.max_num_instances
        if is_train:
            self.canvas = (
                _round_up(max(cfg.input.min_size_train), self.div),
                _round_up(cfg.input.max_size_train, self.div),
            )
        else:
            self.canvas = None  # eval pads per-video to divisibility

    def __call__(self, record: dict, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        rng = random.Random(seed)
        length = record["length"]
        if self.is_train:
            frame_idx = select_frames(
                length, self.num_frames, self.frame_range, self.shuffle, rng
            )
        else:
            frame_idx = list(range(length))

        preloaded = record.get("_frames")  # in-memory RGB frames (pseudo-video)
        frames = []
        for fi in frame_idx:
            if preloaded is not None:
                frames.append(preloaded[fi])
                continue
            img = cv2.imread(record["file_names"][fi], cv2.IMREAD_COLOR)
            if img is None:
                img = np.zeros((record["height"], record["width"], 3), np.uint8)
            img = img[:, :, ::-1]  # BGR -> RGB
            frames.append(img)

        H0, W0 = frames[0].shape[:2]

        # gather instances across the sampled frames (train only)
        masks_per_frame: Optional[List[List[np.ndarray]]] = None
        inst_ids: List[int] = []
        inst_labels: Dict[int, int] = {}
        if self.is_train and record.get("annotations") is not None:
            id_set = {}
            for fi in frame_idx:
                for ann in record["annotations"][fi]:
                    if ann["id"] not in id_set:
                        id_set[ann["id"]] = ann["category_id"]
            inst_ids = list(id_set.keys())[: self.max_instances]
            inst_labels = id_set
            masks_per_frame = []
            for fi in frame_idx:
                by_id = {a["id"]: a for a in record["annotations"][fi]}
                ms = []
                for iid in inst_ids:
                    a = by_id.get(iid)
                    ms.append(
                        decode_segmentation(a["segmentation"] if a else None, H0, W0)
                    )
                masks_per_frame.append(ms)

        from dvis_plus_tpu.data.augmentation import sample_clip_transforms

        transforms = sample_clip_transforms(self.augs, H0, W0, rng)
        frames, masks_per_frame = apply_clip_transforms(
            transforms, frames, masks_per_frame
        )
        h, w = frames[0].shape[:2]

        # static canvas fit (train); eval pads to divisibility
        if self.canvas is not None:
            ch, cw = self.canvas
            scale = min(1.0, ch / h, cw / w)
            if scale < 1.0:
                nh, nw = int(h * scale), int(w * scale)
                frames = [
                    cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
                    for f in frames
                ]
                if masks_per_frame is not None:
                    masks_per_frame = [
                        [
                            cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
                            for m in ms
                        ]
                        for ms in masks_per_frame
                    ]
                h, w = nh, nw
        else:
            ch, cw = _round_up(h, self.div), _round_up(w, self.div)

        T = len(frames)
        images = np.zeros((T, ch, cw, 3), np.float32)
        for t, f in enumerate(frames):
            images[t, :h, :w] = (f.astype(np.float32) - self.pixel_mean) / self.pixel_std

        out: Dict[str, np.ndarray] = {
            "images": images,
            "image_size": np.asarray([h, w], np.int32),
            "height": record.get("height", H0),
            "width": record.get("width", W0),
            "video_id": record.get("video_id", 0),
            "file_names": record["file_names"],
            "frame_indices": np.asarray(frame_idx, np.int32),
        }

        if self.is_train:
            N = self.max_instances
            labels = np.zeros((N,), np.int32)
            masks = np.zeros((N, T, ch, cw), bool)
            frame_valid = np.zeros((N, T), bool)
            for n, iid in enumerate(inst_ids):
                labels[n] = inst_labels[iid]
                for t in range(T):
                    m = masks_per_frame[t][n]
                    if m.any():
                        masks[n, t, :h, :w] = m.astype(bool)
                        frame_valid[n, t] = True
            out.update(
                labels=labels,
                masks=masks,
                valid=frame_valid.any(axis=1),
                frame_valid=frame_valid,
            )
        return out
