"""Clip-consistent augmentations (host-side numpy/cv2).

Re-designs the reference's clip transform stack
(``DVIS_Plus/dvis_Plus/data_video/augmentation.py:21-507``: ResizeShortestEdge,
RandomFlip with ``flip_by_clip``, RandomRotationClip, crop variants,
build_augmentation/build_pseudo_augmentation): one set of random parameters is
drawn per clip and applied to every frame + its masks, preserving temporal
consistency. Images HWC uint8/float32; masks HW uint8.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np


class ClipTransform:
    """Deterministic transform (parameters already sampled) applied per frame."""

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_mask(self, mask: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def out_size(self, h: int, w: int):
        """Output (h, w) given input size — size-dependent augs sampled later
        in the chain need it (LSJ resize-then-crop)."""
        return h, w


class ResizeTransform(ClipTransform):
    def __init__(self, new_h: int, new_w: int):
        self.new_h, self.new_w = new_h, new_w

    def apply_image(self, img):
        return cv2.resize(img, (self.new_w, self.new_h), interpolation=cv2.INTER_LINEAR)

    def apply_mask(self, mask):
        return cv2.resize(mask, (self.new_w, self.new_h), interpolation=cv2.INTER_NEAREST)

    def out_size(self, h, w):
        return self.new_h, self.new_w


class FlipTransform(ClipTransform):
    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    apply_mask = apply_image


class RotationTransform(ClipTransform):
    """Rotate about the image center, expanding the canvas (reference
    RandomRotationClip with expand=True)."""

    def __init__(self, h: int, w: int, angle: float):
        self.angle = angle
        center = ((w - 1) / 2, (h - 1) / 2)
        M = cv2.getRotationMatrix2D(center, angle, 1.0)
        cos, sin = abs(M[0, 0]), abs(M[0, 1])
        nw = int(round(h * sin + w * cos))
        nh = int(round(h * cos + w * sin))
        M[0, 2] += (nw - 1) / 2 - center[0]
        M[1, 2] += (nh - 1) / 2 - center[1]
        self.M, self.new_h, self.new_w = M, nh, nw

    def apply_image(self, img):
        return cv2.warpAffine(img, self.M, (self.new_w, self.new_h), flags=cv2.INTER_LINEAR)

    def apply_mask(self, mask):
        return cv2.warpAffine(mask, self.M, (self.new_w, self.new_h), flags=cv2.INTER_NEAREST)


class CropTransform(ClipTransform):
    def __init__(self, y0: int, x0: int, h: int, w: int):
        self.y0, self.x0, self.h, self.w = y0, x0, h, w

    def apply_image(self, img):
        return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]

    apply_mask = apply_image

    def out_size(self, h, w):
        return self.h, self.w


class Identity(ClipTransform):
    def apply_image(self, img):
        return img

    apply_mask = apply_image


class ClipAugmentation:
    """Samples a transform once per clip."""

    def sample(self, h: int, w: int, rng: random.Random) -> ClipTransform:
        raise NotImplementedError


class ResizeShortestEdge(ClipAugmentation):
    def __init__(self, min_sizes: Sequence[int], max_size: int, sample_style: str = "choice"):
        self.min_sizes = list(min_sizes)
        self.max_size = max_size
        self.sample_style = sample_style

    def sample(self, h, w, rng):
        if self.sample_style == "range":
            size = rng.randint(min(self.min_sizes), max(self.min_sizes))
        else:
            size = rng.choice(self.min_sizes)
        scale = size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        return ResizeTransform(int(round(h * scale)), int(round(w * scale)))


class RandomFlip(ClipAugmentation):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def sample(self, h, w, rng):
        return FlipTransform() if rng.random() < self.prob else Identity()


class RandomRotation(ClipAugmentation):
    def __init__(self, angles: Sequence[float], prob: float = 0.5):
        self.angles = list(angles)
        self.prob = prob

    def sample(self, h, w, rng):
        if rng.random() >= self.prob:
            return Identity()
        lo, hi = min(self.angles), max(self.angles)
        return RotationTransform(h, w, rng.uniform(lo, hi))


class RandomCrop(ClipAugmentation):
    """Relative-range crop (d2 RandomCrop 'relative_range')."""

    def __init__(self, crop_size: Tuple[float, float]):
        self.crop_size = crop_size

    def sample(self, h, w, rng):
        ch = int(h * (self.crop_size[0] + rng.random() * (1 - self.crop_size[0])))
        cw = int(w * (self.crop_size[1] + rng.random() * (1 - self.crop_size[1])))
        y0 = rng.randint(0, max(h - ch, 0))
        x0 = rng.randint(0, max(w - cw, 0))
        return CropTransform(y0, x0, ch, cw)


def build_train_augmentation(cfg_input) -> List[ClipAugmentation]:
    """Reference build_augmentation (augmentation.py:~450-507): shortest-edge
    resize + clip flip (+ optional crop)."""
    augs: List[ClipAugmentation] = []
    if cfg_input.random_flip != "none":
        augs.append(RandomFlip())
    augs.append(
        ResizeShortestEdge(cfg_input.min_size_train, cfg_input.max_size_train)
    )
    if cfg_input.crop_enabled:
        augs.append(RandomCrop((0.8, 0.8)))
    return augs


def build_test_augmentation(cfg_input) -> List[ClipAugmentation]:
    return [ResizeShortestEdge([cfg_input.min_size_test], cfg_input.max_size_test)]


def apply_clip_transforms(
    transforms: List[ClipTransform],
    frames: List[np.ndarray],
    masks_per_frame: Optional[List[List[np.ndarray]]] = None,
):
    """Apply the sampled per-clip transforms to every frame (and masks)."""
    out_frames = []
    out_masks = [] if masks_per_frame is not None else None
    for fi, img in enumerate(frames):
        for t in transforms:
            img = t.apply_image(img)
        out_frames.append(img)
        if masks_per_frame is not None:
            ms = []
            for m in masks_per_frame[fi]:
                for t in transforms:
                    m = t.apply_mask(m)
                ms.append(m)
            out_masks.append(ms)
    return out_frames, out_masks


class PadCropTransform(ClipTransform):
    """Crop to a fixed window then pad bottom/right to the window size
    (reference FixedSizeCropClip: images pad 128, masks pad 0)."""

    def __init__(self, y0: int, x0: int, out_h: int, out_w: int, pad_value: int = 128):
        self.y0, self.x0, self.out_h, self.out_w = y0, x0, out_h, out_w
        self.pad_value = pad_value

    def _crop_pad(self, arr, pad_value):
        crop = arr[self.y0 : self.y0 + self.out_h, self.x0 : self.x0 + self.out_w]
        ph = self.out_h - crop.shape[0]
        pw = self.out_w - crop.shape[1]
        if ph or pw:
            pads = ((0, ph), (0, pw)) + ((0, 0),) * (arr.ndim - 2)
            crop = np.pad(crop, pads, constant_values=pad_value)
        return crop

    def apply_image(self, img):
        return self._crop_pad(img, self.pad_value)

    def apply_mask(self, mask):
        return self._crop_pad(mask, 0)

    def out_size(self, h, w):
        return self.out_h, self.out_w


class ResizeScaleClip(ClipAugmentation):
    """LSJ resize part (reference ResizeScaleClip, augmentation.py:128-190):
    one scale in [min, max] per clip; the image is resized to fit inside the
    scaled target box, aspect preserved."""

    def __init__(self, min_scale: float, max_scale: float,
                 target_height: int, target_width: int):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.target_h = target_height
        self.target_w = target_width

    def sample(self, h, w, rng):
        scale = rng.uniform(self.min_scale, self.max_scale)
        out_scale = min(self.target_h * scale / h, self.target_w * scale / w)
        return ResizeTransform(
            max(int(round(h * out_scale)), 1), max(int(round(w * out_scale)), 1)
        )


class FixedSizeCropClip(ClipAugmentation):
    """LSJ crop part (reference FixedSizeCropClip): one random fixed-size
    window per clip, padded when the image is smaller."""

    def __init__(self, crop_size, pad_value: int = 128):
        self.crop_h, self.crop_w = crop_size
        self.pad_value = pad_value

    def sample(self, h, w, rng):
        y0 = rng.randint(0, max(h - self.crop_h, 0)) if h > self.crop_h else 0
        x0 = rng.randint(0, max(w - self.crop_w, 0)) if w > self.crop_w else 0
        return PadCropTransform(y0, x0, self.crop_h, self.crop_w, self.pad_value)


class ColorJitterTransform(ClipTransform):
    """Image-only linear intensity transform (masks untouched)."""

    def __init__(self, scale: float = 1.0, offset: float = 0.0, saturation: float = 1.0):
        self.scale = scale
        self.offset = offset
        self.saturation = saturation

    def apply_image(self, img):
        out = img.astype(np.float32) * self.scale + self.offset
        if self.saturation != 1.0:
            gray = out.mean(axis=-1, keepdims=True)
            out = gray + (out - gray) * self.saturation
        return np.clip(out, 0, 255).astype(img.dtype)

    def apply_mask(self, mask):
        return mask


class RandomBrightness(ClipAugmentation):
    """d2 T.RandomBrightness(lo, hi): multiply intensities by U(lo, hi)."""

    def __init__(self, lo: float = 0.9, hi: float = 1.1):
        self.lo, self.hi = lo, hi

    def sample(self, h, w, rng):
        return ColorJitterTransform(scale=rng.uniform(self.lo, self.hi))


class RandomContrast(ClipAugmentation):
    """d2 T.RandomContrast: blend with the mean intensity."""

    def __init__(self, lo: float = 0.9, hi: float = 1.1):
        self.lo, self.hi = lo, hi

    def sample(self, h, w, rng):
        f = rng.uniform(self.lo, self.hi)
        # out = mean + f * (img - mean) == img * f + mean * (1 - f); the mean
        # is per-clip-constant enough for jitter purposes (128 midpoint)
        return ColorJitterTransform(scale=f, offset=128.0 * (1.0 - f))


class RandomSaturation(ClipAugmentation):
    """d2 T.RandomSaturation: blend with grayscale."""

    def __init__(self, lo: float = 0.9, hi: float = 1.1):
        self.lo, self.hi = lo, hi

    def sample(self, h, w, rng):
        return ColorJitterTransform(saturation=rng.uniform(self.lo, self.hi))


def sample_clip_transforms(augs, h: int, w: int, rng: random.Random):
    """Sample the chain sequentially, threading the evolving image size
    (LSJ's crop must see the resized size, not the original)."""
    ts = []
    for aug in augs:
        t = aug.sample(h, w, rng)
        ts.append(t)
        h, w = t.out_size(h, w)
    return ts


def build_pseudo_augmentation(cfg_input) -> List[ClipAugmentation]:
    """Pseudo-video recipe (reference build_pseudo_augmentation
    augmentation.py:507-560): flip + rotation handled by the pseudo mapper;
    LSJ resize-scale + fixed-size crop when enabled, else shortest-edge."""
    augs: List[ClipAugmentation] = []
    if cfg_input.random_flip != "none":
        augs.append(RandomFlip())
    # PSEUDO.AUGMENTATIONS color jitter (reference augmentation.py:534-539)
    extra = set(cfg_input.augmentations or ())
    if "brightness" in extra:
        augs.append(RandomBrightness())
    if "contrast" in extra:
        augs.append(RandomContrast())
    if "saturation" in extra:
        augs.append(RandomSaturation())
    if cfg_input.lsj_aug:
        size = cfg_input.max_size_train
        augs.append(ResizeScaleClip(0.1, 2.0, size, size))
        augs.append(FixedSizeCropClip((size, size)))
    else:
        augs.append(ResizeShortestEdge(cfg_input.min_size_train, cfg_input.max_size_train))
    return augs
