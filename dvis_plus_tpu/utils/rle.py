"""ctypes bindings for the native C++ RLE mask codec (native/rle/rle.cpp).

Drop-in replacement for the pycocotools mask API surface the reference
evaluators use (``mask_util.encode/decode/area/iou/merge`` in
``DVIS_Plus/dvis_Plus/data_video/ytvis_eval.py:256-295`` and the vendored
``DVIS_DAQ/.../pycocotools/_mask.pyx``). Host-side only (evaluation / data
tooling), built on demand with g++ — no pip dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Union

import numpy as np

_LIB: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "rle", "rle.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "rle", "librle.so")


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so, src], check=True
        )
    lib = ctypes.CDLL(so)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u32p]
    lib.rle_encode_packed.restype = ctypes.c_int64
    lib.rle_encode_packed.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u32p
    ]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.rle_from_colruns.restype = ctypes.c_int64
    lib.rle_from_colruns.argtypes = [
        u16p, u16p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, u32p,
    ]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, ctypes.c_int64]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [u32p, ctypes.c_int64, u32p, ctypes.c_int64, ctypes.c_int32]
    lib.rle_merge.restype = ctypes.c_int64
    lib.rle_merge.argtypes = [u32p, ctypes.c_int64, u32p, ctypes.c_int64, u32p, ctypes.c_int32]
    lib.rle_to_string.restype = ctypes.c_int64
    lib.rle_to_string.argtypes = [u32p, ctypes.c_int64, ctypes.c_char_p]
    lib.rle_from_string.restype = ctypes.c_int64
    lib.rle_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int64, u32p]
    _LIB = lib
    return lib


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def encode(mask: np.ndarray) -> Dict:
    """Binary mask (H, W) [C-order input] -> COCO RLE dict
    {"size": [H, W], "counts": bytes}."""
    H, W = mask.shape
    fmask = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    fmask = np.ascontiguousarray(fmask)
    lib = _load()
    cnts = np.empty(H * W + 1, np.uint32)
    m = lib.rle_encode(
        fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, _u32p(cnts)
    )
    buf = ctypes.create_string_buffer(int(6 * m + 1))
    n = lib.rle_to_string(_u32p(cnts), m, buf)
    return {"size": [int(H), int(W)], "counts": buf.raw[:n]}


def encode_packed(packed_rows: np.ndarray, h: int, w: int) -> Dict:
    """ROW-major MSB-first bit-packed mask (h, ceil(w/8)) uint8 (numpy
    packbits order — what the device's fused upsample->pack emits) -> COCO
    RLE dict, byte-identical to ``encode(unpackbits(...))`` without ever
    unpacking: the C++ codec walks columns over the packed bits directly,
    skipping the h*w bool materialization AND the Fortran-order transpose
    copy (the two dominant host costs of the eval RLE path)."""
    lib = _load()
    packed_rows = np.ascontiguousarray(packed_rows, np.uint8)
    assert packed_rows.ndim == 2 and packed_rows.shape[0] == h
    cnts = np.empty(h * w + 1, np.uint32)
    m = lib.rle_encode_packed(
        packed_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, packed_rows.shape[1], _u32p(cnts),
    )
    buf = ctypes.create_string_buffer(int(6 * m + 1))
    n = lib.rle_to_string(_u32p(cnts), m, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:n]}


def _counts_to_rle(cnts: np.ndarray, m: int, h: int, w: int) -> Dict:
    lib = _load()
    buf = ctypes.create_string_buffer(int(6 * m + 1))
    n = lib.rle_to_string(_u32p(cnts), m, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:n]}


def encode_colruns(rows: np.ndarray, m_col: np.ndarray, jumps: np.ndarray,
                   first: bool, h: int, w: int) -> Optional[Dict]:
    """Per-column change rows (w, k) uint16 + per-column counts (w,) uint16 +
    MSB-first packed column-boundary bits + pixel(0,0) value -> COCO RLE
    dict, byte-identical to ``encode`` on the mask they describe (the device
    extracts them in engine/inference.py::_upsample_runs). Returns None when
    some column overflows k transitions (caller falls back to the packed
    row download for this frame)."""
    lib = _load()
    rows = np.ascontiguousarray(rows, np.uint16)
    m_col = np.ascontiguousarray(m_col, np.uint16)
    jumps = np.ascontiguousarray(jumps, np.uint8)
    cnts = np.empty(h * w + 1, np.uint32)
    m = lib.rle_from_colruns(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        m_col.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        jumps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(bool(first)), h, w, rows.shape[-1], _u32p(cnts),
    )
    if m < 0:
        return None
    return _counts_to_rle(cnts, m, h, w)


class ColRunMasks:
    """A (n, T, H, W) bool mask stack stored as per-column RUN BOUNDARIES:
    for each (instance, frame, column) the ascending rows (1..H-1) where the
    column's value changes (``rows`` (n, T, W, k) uint16, valid prefix length
    ``m_col`` (n, T, W)), the packed cross-column change bits ``jumps``
    (n, T, ceil(W/8)), and pixel (0,0) in ``first`` (n, T). Produced by the
    eval drivers' device-side run extraction (~k*2 bytes/column off-chip vs
    H/8 bit-packed vs H bool — the reference downloads full fp16/bool mask
    tensors, meta_architecture.py:704 + ytvis_eval.py:256-295) and consumed
    by the evaluator via :func:`encode_colruns` without ever materializing
    the mask. Frames where a column overflows k transitions carry a packed
    (H, ceil(W/8)) row in ``fallback`` and encode via :func:`encode_packed`
    — output bytes are identical either way (tested)."""

    def __init__(self, rows: np.ndarray, m_col: np.ndarray, jumps: np.ndarray,
                 first: np.ndarray, height: int, width: int,
                 fallback: Optional[Dict] = None):
        assert rows.ndim == 4 and rows.dtype == np.uint16
        self.rows, self.m_col, self.jumps = rows, m_col, jumps
        self.first = first
        self.height, self.width = int(height), int(width)
        self.k = rows.shape[-1]
        self.fallback = fallback or {}  # {(i, t): (H, ceil(W/8)) uint8}
        self._any = (
            first.astype(bool)
            | (m_col.sum(-1, dtype=np.int64) > 0)
            | (jumps != 0).any(-1)
        )

    @property
    def shape(self):
        return (self.rows.shape[0], self.rows.shape[1], self.height, self.width)

    def frame_any(self, i: int, t: int) -> bool:
        return bool(self._any[i, t])

    def encode_frame(self, i: int, t: int) -> Dict:
        fb = self.fallback.get((i, t))
        if fb is not None:
            return encode_packed(fb, self.height, self.width)
        e = encode_colruns(
            self.rows[i, t], self.m_col[i, t], self.jumps[i, t],
            bool(self.first[i, t]), self.height, self.width,
        )
        assert e is not None, "overflow frame missing its packed fallback row"
        return e

    def unpack(self) -> np.ndarray:
        """Full (n, T, H, W) bool array (compat/debug path only)."""
        n, T = self.rows.shape[:2]
        out = np.zeros((n, T, self.height, self.width), bool)
        for i in range(n):
            for t in range(T):
                if self._any[i, t]:
                    out[i, t] = decode(self.encode_frame(i, t)).astype(bool)
        return out

    def __getitem__(self, i):
        """Per-instance (T, H, W) bool view (demo/tests)."""
        T = self.rows.shape[1]
        out = np.zeros((T, self.height, self.width), bool)
        for t in range(T):
            if self._any[i, t]:
                out[t] = decode(self.encode_frame(i, t)).astype(bool)
        return out

    def __len__(self) -> int:
        return self.rows.shape[0]


class PackedMasks:
    """A (n, T, H, W) bool mask stack stored bit-packed along W (MSB-first,
    numpy packbits order): ``bits`` is (n, T, H, ceil(W/8)) uint8. Produced by
    the eval drivers' fused device-side upsample->threshold->pack download
    (engine.inference._upsample_pack) and consumed zero-copy by the VIS
    evaluator via :func:`encode_packed` — masks never unpack on the host on
    the product eval path (the reference downloads and RLE-encodes full bool
    tensors, ytvis_eval.py:256-295)."""

    def __init__(self, bits: np.ndarray, height: int, width: int):
        assert bits.ndim == 4 and bits.dtype == np.uint8
        self.bits = bits
        self.height = int(height)
        self.width = int(width)

    @property
    def shape(self):
        return (self.bits.shape[0], self.bits.shape[1], self.height, self.width)

    def frame_any(self, i: int, t: int) -> bool:
        return bool(self.bits[i, t].any())

    def encode_frame(self, i: int, t: int) -> Dict:
        return encode_packed(self.bits[i, t], self.height, self.width)

    def unpack(self) -> np.ndarray:
        """Full (n, T, H, W) bool array (compat/debug path only)."""
        return np.unpackbits(self.bits, axis=-1)[..., : self.width].astype(bool)

    def __getitem__(self, i):
        """Per-instance (T, H, W) bool view — keeps the container list-like
        for consumers that index ``pred_masks`` (demo, tests)."""
        return np.unpackbits(self.bits[i], axis=-1)[..., : self.width].astype(bool)

    def __len__(self) -> int:
        return self.bits.shape[0]


def decode(rle: Dict) -> np.ndarray:
    """COCO RLE dict -> binary mask (H, W) uint8 (C-order)."""
    H, W = rle["size"]
    counts = rle["counts"]
    lib = _load()
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, (bytes, bytearray)):
        cnts = np.empty(len(counts) + 2, np.uint32)
        m = lib.rle_from_string(bytes(counts), len(counts), _u32p(cnts))
    else:  # uncompressed list
        cnts = np.asarray(counts, np.uint32)
        m = len(cnts)
    mask = np.zeros(H * W, np.uint8)
    lib.rle_decode(
        _u32p(cnts), m, mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H * W
    )
    return mask.reshape(W, H).T.copy()  # column-major -> C order


def _counts_of(rle: Dict) -> np.ndarray:
    lib = _load()
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, (bytes, bytearray)):
        cnts = np.empty(len(counts) + 2, np.uint32)
        m = lib.rle_from_string(bytes(counts), len(counts), _u32p(cnts))
        return cnts[:m].copy()
    return np.asarray(counts, np.uint32)


def area(rle: Dict) -> int:
    c = _counts_of(rle)
    return int(_load().rle_area(_u32p(c), len(c)))


def iou(dt: List[Dict], gt: List[Dict], iscrowd: List[int]) -> np.ndarray:
    """Pairwise IoU matrix (len(dt), len(gt)) matching pycocotools semantics."""
    lib = _load()
    out = np.zeros((len(dt), len(gt)), np.float64)
    dts = [_counts_of(d) for d in dt]
    gts = [_counts_of(g) for g in gt]
    for i, dc in enumerate(dts):
        for j, gc in enumerate(gts):
            out[i, j] = lib.rle_iou(
                _u32p(dc), len(dc), _u32p(gc), len(gc), int(iscrowd[j]) if iscrowd else 0
            )
    return out


def merge(rles: List[Dict], intersect: bool = False) -> Dict:
    """Union (or intersection) of several RLEs."""
    lib = _load()
    assert rles
    acc = _counts_of(rles[0])
    H, W = rles[0]["size"]
    for r in rles[1:]:
        b = _counts_of(r)
        out = np.empty(len(acc) + len(b) + 2, np.uint32)
        m = lib.rle_merge(_u32p(acc), len(acc), _u32p(b), len(b), _u32p(out), int(intersect))
        acc = out[:m].copy()
    buf = ctypes.create_string_buffer(int(6 * len(acc) + 1))
    n = lib.rle_to_string(_u32p(acc), len(acc), buf)
    return {"size": [int(H), int(W)], "counts": buf.raw[:n]}


def frPyObjects(rle_or_poly, h: int, w: int):
    """Minimal frPyObjects: uncompressed RLE dict -> compressed RLE."""
    if isinstance(rle_or_poly, dict) and "counts" in rle_or_poly:
        c = _counts_of(rle_or_poly)
        lib = _load()
        buf = ctypes.create_string_buffer(int(6 * len(c) + 1))
        n = lib.rle_to_string(_u32p(c), len(c), buf)
        return {"size": [h, w], "counts": buf.raw[:n]}
    raise NotImplementedError("polygon -> RLE not implemented (masks ship as RLE)")
