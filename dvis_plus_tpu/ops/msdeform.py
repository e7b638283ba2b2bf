"""Multi-scale deformable attention core op (TPU-native).

Numerical spec: the reference's pure-PyTorch oracle
``ms_deform_attn_core_pytorch`` (reference
``DVIS_Plus/mask2former/modeling/pixel_decoder/ops/functions/ms_deform_attn_func.py:52-72``),
which is ``F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)`` per level, weighted by softmaxed attention weights and
summed over (level, point). The reference's CUDA kernel
(``ms_deform_im2col_cuda.cuh``) implements the same math; here the forward is a
vectorized 4-corner gather that XLA lowers to TPU gather ops, and the backward
comes from JAX autodiff (exact, matching the CUDA col2im analytically).

Layouts are chosen TPU-first: the head dim stays last (lane dim = channels),
gathers are batched along the flattened spatial axis.

Shapes (matching the reference API):
  value:              (B, Len_in, n_heads, d_head)
  spatial_shapes:     static tuple ((H_0,W_0), ..., (H_{L-1},W_{L-1})),
                      sum(H_l*W_l) == Len_in
  sampling_locations: (B, Len_q, n_heads, n_levels, n_points, 2) in [0,1] (x,y)
  attention_weights:  (B, Len_q, n_heads, n_levels, n_points), softmaxed over
                      the flattened (level, point) axis by the caller
  returns:            (B, Len_q, n_heads * d_head)
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(
    value_l: jnp.ndarray,  # (B, H*W, M, D)
    H: int,
    W: int,
    loc: jnp.ndarray,  # (B, Lq, M, P, 2) in [0,1]
) -> jnp.ndarray:
    """grid_sample(align_corners=False, padding_mode='zeros') on one level.

    Returns (B, Lq, M, P, D).
    """
    B, _, M, D = value_l.shape
    Lq, P = loc.shape[1], loc.shape[3]

    # align_corners=False: pixel-center coords
    x = loc[..., 0] * W - 0.5  # (B, Lq, M, P)
    y = loc[..., 1] * H - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # corner weights
    wx1 = x - x0  # weight of x1
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)

    # value as (B, M, H*W, D) for take_along_axis over the spatial axis
    v = jnp.swapaxes(value_l, 1, 2)  # (B, M, H*W, D)

    def corner(yi, xi, wy, wx):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # (B, Lq, M, P)
        # -> (B, M, Lq*P, 1)
        idx_b = jnp.swapaxes(idx, 1, 2).reshape(B, M, Lq * P, 1)
        g = jnp.take_along_axis(v, idx_b, axis=2)  # (B, M, Lq*P, D)
        g = g.reshape(B, M, Lq, P, D).transpose(0, 2, 1, 3, 4)  # (B, Lq, M, P, D)
        w = (wy * wx * valid.astype(value_l.dtype))[..., None]  # (B, Lq, M, P, 1)
        return g * w

    out = (
        corner(y0i, x0i, wy0, wx0)
        + corner(y0i, x1i, wy0, wx1)
        + corner(y1i, x0i, wy1, wx0)
        + corner(y1i, x1i, wy1, wx1)
    )
    return out


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Straightforward 4-corner-gather implementation (correctness oracle)."""
    B, Len_in, M, D = value.shape
    Lq = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sampling_locations.shape == (B, Lq, M, L, P, 2), sampling_locations.shape
    assert attention_weights.shape == (B, Lq, M, L, P)
    assert sum(h * w for h, w in spatial_shapes) == Len_in

    splits = []
    start = 0
    for (H, W) in spatial_shapes:
        splits.append((start, H, W))
        start += H * W

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    for lid, (start, H, W) in enumerate(splits):
        value_l = jax.lax.dynamic_slice_in_dim(value, start, H * W, axis=1)
        loc_l = sampling_locations[:, :, :, lid]  # (B, Lq, M, P, 2)
        sampled = _bilinear_gather_level(value_l, H, W, loc_l)  # (B, Lq, M, P, D)
        w_l = attention_weights[:, :, :, lid][..., None]  # (B, Lq, M, P, 1)
        out = out + jnp.sum(sampled * w_l, axis=3)

    return out.reshape(B, Lq, M * D)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention forward (differentiable).

    TPU-tuned formulation: per level, the four bilinear corners are
    pre-stacked into one zero-padded table row ((H+1)*(W+1), 4*D per head), so
    one flat axis-0 gather fetches all corners of a sample at once — 4x fewer
    gather descriptors and 4x larger rows than the naive form (~2x faster on
    v5e than per-corner ``take_along_axis``; see ``ms_deform_attn_reference``
    for the oracle both are tested against). Zero borders reproduce
    grid_sample's zero padding; fully out-of-range corners are killed via the
    per-corner validity weights.
    """
    B, Len_in, M, D = value.shape
    Lq = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert sampling_locations.shape == (B, Lq, M, L, P, 2), sampling_locations.shape
    assert attention_weights.shape == (B, Lq, M, L, P)
    assert sum(h * w for h, w in spatial_shapes) == Len_in

    # head-major layout throughout: the gathered tensor (B, M, Lq, P*4, D) is
    # ~100 MB at 720p — transposing it to query-major before weighting costs
    # more than the gather itself (measured v5e: take 4.0 ms, +transpose
    # 7.8 ms, +transpose+einsum 19.9 ms vs batched-dot in gather layout
    # 6.6 ms). Weight with a batched (1, P*4) @ (P*4, D) dot in the gather
    # layout and only transpose the small (B, M, Lq, D) output at the end.
    out = jnp.zeros((B, M, Lq, D), dtype=value.dtype)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, start, H * W, axis=1)
        start += H * W
        v = value_l.reshape(B, H, W, M, D)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        # corner stack: (y0,x0), (y0,x1), (y1,x0), (y1,x1)
        v4 = jnp.stack(
            [vp[:, : H + 1, : W + 1], vp[:, : H + 1, 1:], vp[:, 1:, : W + 1], vp[:, 1:, 1:]],
            axis=4,
        )  # (B, H+1, W+1, M, 4, D)
        tab = v4.transpose(0, 3, 1, 2, 4, 5).reshape(
            B * M * (H + 1) * (W + 1), 4 * D
        )

        loc_l = sampling_locations[:, :, :, lid]  # (B, Lq, M, P, 2)
        cdt = jnp.promote_types(sampling_locations.dtype, jnp.float32)
        x = loc_l[..., 0].astype(cdt) * W - 0.5
        y = loc_l[..., 1].astype(cdt) * H - 0.5
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
        idx = (yi * (W + 1) + xi).transpose(0, 2, 1, 3)  # (B, M, Lq, P)
        base = (
            jnp.arange(B)[:, None, None, None] * M + jnp.arange(M)[None, :, None, None]
        ) * ((H + 1) * (W + 1))
        g = jnp.take(tab, (idx + base).reshape(-1), axis=0)
        g = g.reshape(B, M, Lq, P * 4, D)  # gather layout, no transpose

        cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
        cw = cw * inb[..., None].astype(cw.dtype)
        aw = attention_weights[:, :, :, lid].astype(cdt)  # (B, Lq, M, P)
        wts = (cw * aw[..., None]).astype(g.dtype)  # (B, Lq, M, P, 4)
        w = wts.transpose(0, 2, 1, 3, 4).reshape(B, M, Lq, 1, P * 4)  # small
        o = jax.lax.dot_general(
            w, g, (((4,), (3,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=value.dtype,
        )  # (B, M, Lq, 1, D)
        out = out + o.reshape(B, M, Lq, D)

    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)
