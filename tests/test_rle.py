"""Native C++ RLE codec vs naive numpy reference."""
import numpy as np

from dvis_plus_tpu.utils import rle


def random_mask(rng, H=37, W=23, p=0.3):
    return (rng.rand(H, W) < p).astype(np.uint8)


def test_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = random_mask(rng)
        enc = rle.encode(m)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(m, dec)


def test_empty_and_full():
    for m in [np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)]:
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_area():
    rng = np.random.RandomState(1)
    m = random_mask(rng)
    assert rle.area(rle.encode(m)) == int(m.sum())


def test_iou_matches_numpy():
    rng = np.random.RandomState(2)
    dts = [random_mask(rng) for _ in range(3)]
    gts = [random_mask(rng) for _ in range(4)]
    got = rle.iou([rle.encode(m) for m in dts], [rle.encode(m) for m in gts], [0] * 4)
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            inter = np.logical_and(d, g).sum()
            union = np.logical_or(d, g).sum()
            expect = inter / union if union else 0.0
            np.testing.assert_allclose(got[i, j], expect, rtol=1e-9)


def test_iou_crowd():
    rng = np.random.RandomState(3)
    d, g = random_mask(rng), random_mask(rng)
    got = rle.iou([rle.encode(d)], [rle.encode(g)], [1])
    inter = np.logical_and(d, g).sum()
    np.testing.assert_allclose(got[0, 0], inter / d.sum(), rtol=1e-9)


def test_merge_union_intersect():
    rng = np.random.RandomState(4)
    a, b = random_mask(rng), random_mask(rng)
    u = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], intersect=False))
    i = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], intersect=True))
    np.testing.assert_array_equal(u, np.logical_or(a, b).astype(np.uint8))
    np.testing.assert_array_equal(i, np.logical_and(a, b).astype(np.uint8))


def test_string_counts_codec_large_runs():
    """Delta/sign-extension paths: long runs and alternating tiny runs."""
    H, W = 300, 400
    m = np.zeros((H, W), np.uint8)
    m[:, 100:300] = 1
    m[::2, 0:10] = 1
    enc = rle.encode(m)
    assert isinstance(enc["counts"], bytes)
    np.testing.assert_array_equal(rle.decode(enc), m)


def _pack_rows(m: np.ndarray) -> np.ndarray:
    """numpy packbits along width, MSB-first — mirrors the device's fused
    upsample->pack layout (engine.inference._upsample_pack)."""
    return np.packbits(m.astype(np.uint8), axis=-1)


def test_encode_packed_matches_encode():
    """encode_packed must be BYTE-identical to encode on the unpacked mask —
    the eval product path ships its output into results.json."""
    rng = np.random.RandomState(5)
    for H, W in [(37, 23), (16, 16), (7, 8), (9, 1), (1, 9), (64, 65), (720, 1283)]:
        m = (rng.rand(H, W) < 0.3).astype(np.uint8)
        ref = rle.encode(m)
        got = rle.encode_packed(_pack_rows(m), H, W)
        assert got["size"] == ref["size"]
        assert got["counts"] == ref["counts"], (H, W)


def test_encode_packed_empty_full():
    for m in [np.zeros((12, 19), np.uint8), np.ones((12, 19), np.uint8)]:
        assert rle.encode_packed(_pack_rows(m), 12, 19)["counts"] == \
            rle.encode(m)["counts"]


def test_packed_masks_container():
    rng = np.random.RandomState(6)
    masks = (rng.rand(3, 4, 21, 30) < 0.4)
    pm = rle.PackedMasks(np.packbits(masks, axis=-1), 21, 30)
    assert pm.shape == (3, 4, 21, 30)
    np.testing.assert_array_equal(pm.unpack(), masks)
    np.testing.assert_array_equal(pm[1], masks[1])
    assert len(pm) == 3
    for i in range(3):
        for t in range(4):
            assert pm.frame_any(i, t) == masks[i, t].any()
            assert pm.encode_frame(i, t)["counts"] == \
                rle.encode(masks[i, t].astype(np.uint8))["counts"]


def _colruns_of(m: np.ndarray, k: int):
    """Numpy twin of the device run extraction
    (engine.inference._upsample_runs) for codec tests."""
    H, W = m.shape
    m = m.astype(bool)
    rows = np.zeros((W, k), np.uint16)
    m_col = np.zeros(W, np.uint16)
    for c in range(W):
        ch = np.flatnonzero(m[1:, c] != m[:-1, c]) + 1
        m_col[c] = len(ch)
        rows[c, : min(len(ch), k)] = ch[:k]
    jumps = np.zeros(W, np.uint8)
    jumps[1:] = m[0, 1:] != m[H - 1, :-1]
    return rows, m_col, np.packbits(jumps), bool(m[0, 0])


def test_encode_colruns_matches_encode():
    """encode_colruns must be BYTE-identical to encode on the mask the run
    boundaries describe — the product eval path downloads only these
    boundaries from the device and ships the result into results.json."""
    rng = np.random.RandomState(7)
    for H, W in [(37, 23), (16, 16), (7, 8), (9, 1), (64, 65), (240, 427)]:
        for p in (0.02, 0.3, 0.7):
            m = (rng.rand(H, W) < p).astype(np.uint8)
            ref = rle.encode(m)
            got = rle.encode_colruns(*_colruns_of(m, H), H, W)
            assert got is not None
            assert got["size"] == ref["size"]
            assert got["counts"] == ref["counts"], (H, W, p)
    for m in [np.zeros((12, 19), np.uint8), np.ones((12, 19), np.uint8)]:
        got = rle.encode_colruns(*_colruns_of(m, 8), 12, 19)
        assert got["counts"] == rle.encode(m)["counts"]


def test_encode_colruns_overflow_returns_none():
    m = (np.arange(32)[:, None] % 2 == 0).astype(np.uint8) * np.ones((1, 5), np.uint8)
    rows, m_col, jumps, first = _colruns_of(m, 8)  # 31 transitions per column
    assert m_col.max() > 8
    assert rle.encode_colruns(rows[:, :8], m_col, jumps, first, 32, 5) is None


def test_colrun_masks_container():
    rng = np.random.RandomState(8)
    masks = rng.rand(3, 4, 21, 30) < 0.4
    k = 24  # >= max transitions per column here
    n, T, H, W = masks.shape
    rows = np.zeros((n, T, W, k), np.uint16)
    m_col = np.zeros((n, T, W), np.uint16)
    jumps = np.zeros((n, T, (W + 7) // 8), np.uint8)
    first = np.zeros((n, T), bool)
    for i in range(n):
        for t in range(T):
            rows[i, t], m_col[i, t], jumps[i, t], first[i, t] = _colruns_of(
                masks[i, t], k
            )
    cm = rle.ColRunMasks(rows, m_col, jumps, first, H, W)
    assert cm.shape == (n, T, H, W)
    np.testing.assert_array_equal(cm.unpack(), masks)
    np.testing.assert_array_equal(cm[1], masks[1])
    assert len(cm) == n
    for i in range(n):
        for t in range(T):
            assert cm.frame_any(i, t) == masks[i, t].any()
            assert cm.encode_frame(i, t)["counts"] == \
                rle.encode(masks[i, t].astype(np.uint8))["counts"]
    # a frame with its packed fallback row encodes identically through it
    fb = {(0, 0): np.packbits(masks[0, 0], axis=-1)}
    cm2 = rle.ColRunMasks(rows, m_col, jumps, first, H, W, fallback=fb)
    assert cm2.encode_frame(0, 0)["counts"] == \
        rle.encode(masks[0, 0].astype(np.uint8))["counts"]


def test_uncompressed_counts_accepted():
    m = np.zeros((4, 4), np.uint8)
    m[1:3, 1:3] = 1
    enc = rle.encode(m)
    cnts = rle._counts_of(enc)
    dec = rle.decode({"size": [4, 4], "counts": cnts.tolist()})
    np.testing.assert_array_equal(dec, m)
