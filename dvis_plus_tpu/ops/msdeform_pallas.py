"""Pallas TPU kernel for multi-scale deformable attention (local-window form).

The XLA path (:func:`dvis_plus_tpu.ops.msdeform.ms_deform_attn`) is gather
bound (~37 GB/s effective on v5e — TPU gathers issue small descriptors). This
kernel removes the gather entirely by exploiting the *encoder* structure:
queries sit on a regular grid and sampling locations are reference + learned
offset, so with offsets clamped to a radius R the samples of a 16x8 query
tile fall inside a static window around that tile. Per (query-tile, head,
level) the kernel

  1. DMAs the corner-stacked table window (built once in XLA, same layout as
     the fast XLA op) from HBM into VMEM;
  2. builds a one-hot(ish) selection tile in VMEM via iota comparisons
     (never materialized to HBM — this is the whole win over an XLA one-hot);
  3. one MXU matmul (tile_rows x window) @ (window x 4D) fetches all corner
     values; corner/attention weights reduce on the VPU.

Semantics: identical to the exact op *given* sampling locations clamped to
+-R pixels of the reference point (R=16 default — the learned offsets of the
shipped models stay well inside; the polar-grid init tops out at P=4 px).
``ms_deform_attn_local`` applies the clamp itself, so it is a well-defined
standalone op; the exact XLA op remains the default where full parity is
required.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MXU precision for the selection matmuls: on TPU an fp32 matmul lowers to a
# single bf16 pass by default (~1e-2 abs error on unit-scale values — the
# same numeric class as the serving config's bf16 sampling values). HIGHEST
# synthesizes fp32 from bf16 passes when strict parity is needed (measured
# v5e, stride-8 pair: DEFAULT 28.8 ms / HIGHEST 46.4 ms vs exact op 57.7 ms).
PRECISION = jax.lax.Precision.DEFAULT  # module default; kernels take a param


def _build_corner_table(value_l: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, H*W, M, D) -> (B, M, H+1, W+1, 4D) zero-padded corner stack."""
    B, _, M, D = value_l.shape
    v = value_l.reshape(B, H, W, M, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    v4 = jnp.stack(
        [vp[:, : H + 1, : W + 1], vp[:, : H + 1, 1:], vp[:, 1:, : W + 1], vp[:, 1:, 1:]],
        axis=4,
    )  # (B, H+1, W+1, M, 4, D)
    return v4.transpose(0, 3, 1, 2, 4, 5).reshape(B, M, H + 1, W + 1, 4 * D)


def _single_level_kernel(
    idx_ref,  # (TQ, P) int32 local window row indices, VMEM
    w_ref,  # (TQ, P*4) f32 combined corner*attention weights (p-major), VMEM
    tab_ref,  # (WIN, 4D) window table slice, VMEM (auto-blocked)
    out_ref,  # (TQ, D)
    *,
    WIN: int,
    P: int,
    precision=None,
):
    """Weighted-selection formulation: instead of one-hot gather rows per
    (query, point), fold the bilinear/attention weights INTO the selection
    matrix — S_c[q, idx[q,p]] += w[q,p,c] — then one (TQ, WIN) @ (WIN, D)
    matmul per corner. Strictly 2D ops throughout: Mosaic crashes on
    sublane<->lane reshapes inside kernels (probed on v5e), and lane slicing
    + iota compares lower cleanly."""
    idx = idx_ref[0]  # (TQ, P)
    w = w_ref[0]  # (TQ, P*4)
    tab = tab_ref[0]  # (WIN, 4D)
    TQ = idx.shape[0]
    D4 = tab.shape[1]
    D = D4 // 4

    cols = jax.lax.broadcasted_iota(jnp.int32, (TQ, WIN), 1)
    sels = [jnp.zeros((TQ, WIN), jnp.float32) for _ in range(4)]
    for p in range(P):
        onehot = (cols == idx[:, p : p + 1]).astype(jnp.float32)
        for c in range(4):
            sels[c] = sels[c] + onehot * w[:, p * 4 + c : p * 4 + c + 1]
    out = jnp.dot(sels[0], tab[:, 0:D], preferred_element_type=jnp.float32,
                  precision=precision or PRECISION)
    for c in range(1, 4):
        out = out + jnp.dot(
            sels[c], tab[:, c * D : (c + 1) * D], preferred_element_type=jnp.float32,
            precision=precision or PRECISION,
        )
    out_ref[0] = out.astype(out_ref.dtype)


def deform_sample_level_pallas(
    table: jnp.ndarray,  # (B, M, H+1, W+1, 4D) corner table for ONE level
    loc: jnp.ndarray,  # (B, Lq, M, P, 2) normalized locations (this level)
    attn: jnp.ndarray,  # (B, Lq, M, P)
    grid_hw: Tuple[int, int],  # query grid (Hq, Wq), Lq == Hq*Wq
    radius: int = 16,
    tile: Tuple[int, int] = (16, 8),
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Local-window sampling of one level by grid queries -> (B, Lq, M, D)."""
    B, M, H1, W1, D4 = table.shape
    H, W = H1 - 1, W1 - 1
    D = D4 // 4
    Hq, Wq = grid_hw
    Lq = Hq * Wq
    P = loc.shape[3]
    th, tw = tile
    assert Hq % th == 0 and Wq % tw == 0, (Hq, Wq, tile)
    nth, ntw = Hq // th, Wq // tw
    TQ = th * tw

    # map tile -> window in table coords. query (i, j) on the Hq x Wq grid has
    # reference pixel at level scale: y = (i + .5) * H / Hq. Window must cover
    # all samples of the tile: [min_ref - R - 1, max_ref + R + 1].
    sy = H / Hq
    sx = W / Wq
    win_h = int(np.ceil((th - 1) * sy + 2 * radius + 4))
    win_w = int(np.ceil((tw - 1) * sx + 2 * radius + 4))
    win_h = min(win_h, H1)
    win_w = min(win_w, W1)
    WIN = win_h * win_w

    # window origin per tile (static table of offsets, scalar-prefetched)
    oy = np.clip(
        (np.arange(nth) * th * sy - radius - 1).astype(np.int32), 0, max(H1 - win_h, 0)
    )
    ox = np.clip(
        (np.arange(ntw) * tw * sx - radius - 1).astype(np.int32), 0, max(W1 - win_w, 0)
    )

    # --- compute local indices + combined weights in XLA (cheap, fused) -----
    cdt = jnp.float32
    x = loc[..., 0].astype(cdt) * W - 0.5
    y = loc[..., 1].astype(cdt) * H - 0.5
    # clamp to the window (this IS the documented semantics of the local op)
    qi = jnp.arange(Lq) // Wq  # (Lq,)
    qj = jnp.arange(Lq) % Wq
    ref_y = (qi.astype(cdt) + 0.5) * sy
    ref_x = (qj.astype(cdt) + 0.5) * sx
    y = jnp.clip(y, (ref_y - radius)[None, :, None, None], (ref_y + radius)[None, :, None, None])
    x = jnp.clip(x, (ref_x - radius)[None, :, None, None], (ref_x + radius)[None, :, None, None])

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    inb = (x0i >= -1) & (x0i < W) & (y0i >= -1) & (y0i < H)
    yi = jnp.clip(y0i + 1, 0, H)
    xi = jnp.clip(x0i + 1, 0, W)

    oy_q = jnp.asarray(oy)[(qi // th)]  # (Lq,)
    ox_q = jnp.asarray(ox)[(qj // tw)]
    ly = yi - oy_q[None, :, None, None]
    lx = xi - ox_q[None, :, None, None]
    ly = jnp.clip(ly, 0, win_h - 1)
    lx = jnp.clip(lx, 0, win_w - 1)
    lidx = ly * win_w + lx  # (B, Lq, M, P) local row in the window

    cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    cw = cw * (inb & True)[..., None].astype(cdt) * attn.astype(cdt)[..., None]

    # reorder queries into tiles: (B, M, ntiles, TQ, ...)
    def tileize(a):
        # (B, Lq, M, ...) -> (B, M, nth, ntw, th, tw, ...)
        s = a.shape
        a = a.reshape(B, Hq, Wq, M, *s[3:])
        a = a.reshape(B, nth, th, ntw, tw, M, *s[3:])
        a = jnp.moveaxis(a, 5, 1)  # (B, M, nth, th, ntw, tw, ...)
        a = jnp.swapaxes(a, 3, 4)  # (B, M, nth, ntw, th, tw, ...)
        return a.reshape(B, M, nth * ntw, TQ, *s[3:][1:] if False else a.shape[6:])

    lidx_t = tileize(lidx).astype(jnp.int32)  # (B, M, nt, TQ, P)
    cw_t = tileize(cw)  # (B, M, nt, TQ, P, 4)

    # window tables per tile: (B, M, nt, WIN, 4D) via XLA dynamic slices
    def window_for(ti, tj):
        sl = jax.lax.dynamic_slice(
            table,
            (0, 0, int(oy[ti]), int(ox[tj]), 0),
            (B, M, win_h, win_w, D4),
        )
        return sl.reshape(B, M, WIN, D4)

    wins = jnp.stack(
        [window_for(ti, tj) for ti in range(nth) for tj in range(ntw)], axis=2
    )  # (B, M, nt, WIN, 4D)

    nt = nth * ntw
    kern = functools.partial(_single_level_kernel, WIN=WIN, P=P, precision=precision)
    out = pl.pallas_call(
        kern,
        grid=(B * M * nt,),
        in_specs=[
            pl.BlockSpec((1, TQ, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, P * 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIN, D4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * M * nt, TQ, D), jnp.float32),
        interpret=interpret,
    )(
        lidx_t.reshape(B * M * nt, TQ, P),
        cw_t.reshape(B * M * nt, TQ, P * 4),
        wins.reshape(B * M * nt, WIN, D4),
    )

    # back to (B, Lq, M, D)
    out = out.reshape(B, M, nth, ntw, th, tw, D)
    out = jnp.swapaxes(out, 3, 4).reshape(B, M, Hq, Wq, D)
    out = out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3)
    return out


def _tile_for(Hq: int, Wq: int, sy: float = 1.0, sx: float = 1.0,
              radius: int = 8, H1: int = 10**9, W1: int = 10**9,
              vmem_budget: float = 4.5e6) -> Tuple[int, int]:
    """Pick a (th, tw) tile dividing the query grid with TQ in a VMEM-friendly
    range, subject to the selection-matrix VMEM budget (4 corner accumulators
    of (TQ, WIN) fp32 + the (WIN, 4D) table block must fit)."""

    def divisors(n):
        return [d for d in range(1, n + 1) if n % d == 0]

    def vmem(th, tw):
        win_h = min(int(np.ceil((th - 1) * sy + 2 * radius + 4)), H1)
        win_w = min(int(np.ceil((tw - 1) * sx + 2 * radius + 4)), W1)
        WIN = win_h * win_w
        tq = th * tw
        return 4 * tq * WIN * 4 + WIN * 128 * 4 * 2  # sel accum + 2x table buf

    best = None
    for th in divisors(Hq):
        for tw in divisors(Wq):
            tq = th * tw
            if not 16 <= tq <= 512:
                continue
            if vmem(th, tw) > vmem_budget:
                continue
            # prefer wide tiles (lane-friendly) with tq near 128
            score = (abs(tq - 128), -tw)
            if best is None or score < best[0]:
                best = (score, (th, tw))
    if best is None:
        # smallest viable tile
        for th in divisors(Hq):
            for tw in divisors(Wq):
                if vmem(th, tw) <= vmem_budget:
                    return (th, tw)
        return (1, 1)
    return best[1]


def ms_deform_attn_local(
    value: jnp.ndarray,  # (B, Len, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2), Lq == Len
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    radius: int = 8,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Drop-in encoder-path replacement for :func:`ms_deform_attn` using the
    in-kernel-DMA local-window Pallas kernel for every (query-level,
    value-level) pair where the query grid is at least as fine.

    Queries must be the concatenated level grids themselves (the encoder
    self-attention structure, msdeformattn.py:92-131). Sampling locations are
    clamped to ``radius`` pixels (of the value level) around each query's
    reference point — the documented deviation from the exact op; trained
    offsets stay well inside for the shipped models.
    """
    B, Len, M, D = value.shape
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sampling_locations.shape[1] == Len, "queries must be the level grids"

    # per-level corner tables (built once per call; shared by all query levels)
    tables = []
    starts = []
    start = 0
    # tables stay fp32: bf16 tables halve DMA bytes but bf16 in-kernel
    # constructs crash the Mosaic compiler on this toolchain (probed);
    # precision= controls the MXU pass count instead
    for (H, W) in spatial_shapes:
        value_l = jax.lax.dynamic_slice_in_dim(value, start, H * W, axis=1)
        tables.append(_build_corner_table(value_l.astype(jnp.float32), H, W))
        starts.append(start)
        start += H * W

    from dvis_plus_tpu.ops.msdeform import _bilinear_gather_level

    outs = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        s = starts[lq]
        Lq = Hq * Wq
        loc_q = jax.lax.dynamic_slice_in_dim(sampling_locations, s, Lq, axis=1)
        attn_q = jax.lax.dynamic_slice_in_dim(attention_weights, s, Lq, axis=1)
        acc = None
        for lv, (Hv, Wv) in enumerate(spatial_shapes):
            if Hv <= Hq and Wv <= Wq:
                # query grid at least as fine as the value grid: local windows
                # stay VMEM-sized (span ~ tile * stride_ratio <= tile)
                tile = _tile_for(
                    Hq, Wq, sy=Hv / Hq, sx=Wv / Wq, radius=radius,
                    H1=Hv + 1, W1=Wv + 1,
                )
                o = deform_sample_level_pallas_dma(
                    tables[lv],
                    loc_q[:, :, :, lv],
                    attn_q[:, :, :, lv],
                    (Hq, Wq),
                    radius=radius,
                    tile=tile,
                    interpret=interpret,
                    precision=precision,
                )  # (B, Lq, M, D)
            else:
                # coarse queries sampling a finer level: few queries, the
                # window would cover most of the level — plain gather wins
                value_l = jax.lax.dynamic_slice_in_dim(
                    value, starts[lv], Hv * Wv, axis=1
                )
                sampled = _bilinear_gather_level(
                    value_l, Hv, Wv, loc_q[:, :, :, lv]
                )  # (B, Lq, M, P, D)
                o = jnp.einsum(
                    "blmpd,blmp->blmd",
                    sampled.astype(jnp.float32),
                    attn_q[:, :, :, lv].astype(jnp.float32),
                )
            acc = o if acc is None else acc + o
        outs.append(acc)
    out = jnp.concatenate(outs, axis=1)  # (B, Len, M, D)
    return out.reshape(B, Len, M * D).astype(value.dtype)


def _dma_level_kernel(
    oy_ref,  # scalar-prefetch (nth,) int32 window row origins
    ox_ref,  # scalar-prefetch (ntw,) int32 window col origins
    idx_ref,  # (1, TQ, P) int32 local window row indices, VMEM
    w_ref,  # (1, TQ, P*4) f32 combined weights, VMEM
    tab_hbm,  # (B, M, H1, W1, 4D) corner table, HBM (ANY)
    out_ref,  # (1, TQ, D) VMEM
    tab_vmem,  # scratch (win_h, win_w, 4D) VMEM
    sem,  # DMA semaphore
    *,
    M: int,
    nth: int,
    ntw: int,
    win_h: int,
    win_w: int,
    P: int,
    precision=None,
):
    """Same math as :func:`_single_level_kernel` but the window table is
    DMA'd straight from the full HBM table per grid step — no XLA-side
    window materialization (the round-1 prototype's 'wins' stack wrote+read
    the windows through HBM, ~9x the table bytes at tile (4, 32))."""
    i = pl.program_id(0)
    nt = nth * ntw
    t = i % nt
    bm = i // nt
    m = bm % M
    b = bm // M
    ti = t // ntw
    tj = t % ntw

    copy = pltpu.make_async_copy(
        tab_hbm.at[b, m, pl.ds(oy_ref[ti], win_h), pl.ds(ox_ref[tj], win_w), :],
        tab_vmem,
        sem,
    )
    copy.start()
    copy.wait()

    idx = idx_ref[0]
    w = w_ref[0]
    TQ = idx.shape[0]
    D4 = tab_vmem.shape[-1]
    D = D4 // 4
    WIN = win_h * win_w
    tab = tab_vmem[...].reshape(WIN, D4)  # leading-dim merge (lane dim kept)

    cdt = tab.dtype  # bf16 tables halve DMA bytes + run the MXU natively
    cols = jax.lax.broadcasted_iota(jnp.int32, (TQ, WIN), 1)
    sels = [jnp.zeros((TQ, WIN), cdt) for _ in range(4)]
    for p in range(P):
        onehot = (cols == idx[:, p : p + 1]).astype(cdt)
        for c in range(4):
            sels[c] = sels[c] + onehot * w[:, p * 4 + c : p * 4 + c + 1].astype(cdt)
    out = jnp.dot(sels[0], tab[:, 0:D], preferred_element_type=jnp.float32,
                  precision=precision or PRECISION)
    for c in range(1, 4):
        out = out + jnp.dot(
            sels[c], tab[:, c * D : (c + 1) * D], preferred_element_type=jnp.float32,
            precision=precision or PRECISION,
        )
    out_ref[0] = out.astype(out_ref.dtype)


def deform_sample_level_pallas_dma(
    table: jnp.ndarray,  # (B, M, H+1, W+1, 4D) corner table for ONE level
    loc: jnp.ndarray,  # (B, Lq, M, P, 2)
    attn: jnp.ndarray,  # (B, Lq, M, P)
    grid_hw: Tuple[int, int],
    radius: int = 8,
    tile: Tuple[int, int] = (16, 8),
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """In-kernel-DMA variant of :func:`deform_sample_level_pallas`.

    v5e-probed constraint: dynamic-offset window DMAs fault the TPU worker
    unless the window AND table spatial dims are multiples of 8 (sublane
    tiling) — both are rounded up here (zero padding)."""
    B, M, H1, W1, D4 = table.shape
    H, W = H1 - 1, W1 - 1
    D = D4 // 4
    Hq, Wq = grid_hw
    Lq = Hq * Wq
    P = loc.shape[3]
    th, tw = tile
    assert Hq % th == 0 and Wq % tw == 0, (Hq, Wq, tile)
    nth, ntw = Hq // th, Wq // tw
    TQ = th * tw

    # sublane tiling unit: 8 rows for 4-byte dtypes, 16 for bf16 (2-byte) —
    # unaligned dynamic-offset window DMAs fault the worker (v5e-probed)
    unit = 8 * (4 // jnp.dtype(table.dtype).itemsize)

    def rup8(v):
        return (v + unit - 1) // unit * unit

    H1p, W1p = rup8(H1), rup8(W1)
    if (H1p, W1p) != (H1, W1):
        table = jnp.pad(table, ((0, 0), (0, 0), (0, H1p - H1), (0, W1p - W1), (0, 0)))

    sy = H / Hq
    sx = W / Wq
    win_h = min(rup8(int(np.ceil((th - 1) * sy + 2 * radius + 4))), H1p)
    win_w = min(rup8(int(np.ceil((tw - 1) * sx + 2 * radius + 4))), W1p)

    oy = np.clip(
        (np.arange(nth) * th * sy - radius - 1).astype(np.int32), 0, max(H1p - win_h, 0)
    )
    ox = np.clip(
        (np.arange(ntw) * tw * sx - radius - 1).astype(np.int32), 0, max(W1p - win_w, 0)
    )

    # local indices + combined weights (same XLA prologue as the non-DMA op)
    cdt = jnp.float32
    x = loc[..., 0].astype(cdt) * W - 0.5
    y = loc[..., 1].astype(cdt) * H - 0.5
    qi = jnp.arange(Lq) // Wq
    qj = jnp.arange(Lq) % Wq
    ref_y = (qi.astype(cdt) + 0.5) * sy
    ref_x = (qj.astype(cdt) + 0.5) * sx
    y = jnp.clip(y, (ref_y - radius)[None, :, None, None], (ref_y + radius)[None, :, None, None])
    x = jnp.clip(x, (ref_x - radius)[None, :, None, None], (ref_x + radius)[None, :, None, None])
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    inb = (x0i >= -1) & (x0i < W) & (y0i >= -1) & (y0i < H)
    yi = jnp.clip(y0i + 1, 0, H)
    xi = jnp.clip(x0i + 1, 0, W)
    oy_q = jnp.asarray(oy)[(qi // th)]
    ox_q = jnp.asarray(ox)[(qj // tw)]
    ly = jnp.clip(yi - oy_q[None, :, None, None], 0, win_h - 1)
    lx = jnp.clip(xi - ox_q[None, :, None, None], 0, win_w - 1)
    lidx = ly * win_w + lx
    cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    cw = cw * inb[..., None].astype(cdt) * attn.astype(cdt)[..., None]

    def tileize(a):
        s = a.shape
        a = a.reshape(B, Hq, Wq, M, *s[3:])
        a = a.reshape(B, nth, th, ntw, tw, M, *s[3:])
        a = jnp.moveaxis(a, 5, 1)
        a = jnp.swapaxes(a, 3, 4)
        return a.reshape(B, M, nth * ntw, TQ, *a.shape[6:])

    nt = nth * ntw
    lidx_t = tileize(lidx).astype(jnp.int32).reshape(B * M * nt, TQ, P)
    cw_t = tileize(cw).reshape(B * M * nt, TQ, P * 4)

    kern = functools.partial(
        _dma_level_kernel, M=M, nth=nth, ntw=ntw, win_h=win_h, win_w=win_w, P=P,
        precision=precision,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * M * nt,),
            in_specs=[
                pl.BlockSpec((1, TQ, P), lambda i, oy, ox: (i, 0, 0)),
                pl.BlockSpec((1, TQ, P * 4), lambda i, oy, ox: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # full table, HBM
            ],
            out_specs=pl.BlockSpec((1, TQ, D), lambda i, oy, ox: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((win_h, win_w, D4), table.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * M * nt, TQ, D), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(oy), jnp.asarray(ox), lidx_t, cw_t, table)

    out = out.reshape(B, M, nth, ntw, th, tw, D)
    out = jnp.swapaxes(out, 3, 4).reshape(B, M, Hq, Wq, D)
    return out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3)
