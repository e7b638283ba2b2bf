"""Point sampling for point-supervised mask losses.

Re-implements detectron2's point_rend sampling used by the reference criterion
(``DVIS_Plus/mask2former_video/modeling/criterion.py:160-180``):
``point_sample`` = grid_sample(bilinear, align_corners=False, zero padding) at
normalized [0,1] coords, and ``get_uncertain_point_coords_with_randomness`` =
oversampled random coords refined by top-k uncertainty (-|logit|) plus random
fill, with identical oversample/importance ratios (3.0 / 0.75, 12544 points).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample mask maps at normalized coordinates.

    Args:
      masks: (..., H, W)
      coords: (..., P, 2) in [0, 1], (x, y) order, broadcastable to masks' batch.
    Returns:
      (..., P) sampled values.

    TPU note: uses the same stacked-corner-table trick as the deformable
    attention op — all four bilinear corners of a sample live in one gathered
    row, so one ``take_along_axis`` replaces four (TPU gathers are
    descriptor-bound). bool masks are cast after the gather so no full-res
    float copy of the GT volume is materialized.
    """
    H, W = masks.shape[-2], masks.shape[-1]
    coords = coords.astype(jnp.float32)
    x = coords[..., 0] * W - 0.5
    y = coords[..., 1] * H - 0.5
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

    is_float = jnp.issubdtype(masks.dtype, jnp.floating)
    out_dtype = masks.dtype if is_float else jnp.float32

    if is_float:
        # corner-stacked table: one gather fetches all 4 bilinear corners
        # (4x fewer gather descriptors; 4x the mask memory transiently)
        lead = masks.shape[:-2]
        pad_width = [(0, 0)] * len(lead) + [(1, 1), (1, 1)]
        mp = jnp.pad(masks, pad_width)
        tab = jnp.stack(
            [
                mp[..., : H + 1, : W + 1],
                mp[..., : H + 1, 1:],
                mp[..., 1:, : W + 1],
                mp[..., 1:, 1:],
            ],
            axis=-1,
        ).reshape(*lead, (H + 1) * (W + 1), 4)
        idx = yi * (W + 1) + xi  # (..., P)
        g = jnp.take_along_axis(tab, idx[..., None], axis=-2)  # (..., P, 4)
        cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
        cw = cw * inb[..., None].astype(jnp.float32)
        return jnp.einsum("...pc,...pc->...p", g, cw.astype(out_dtype))

    # bool / integer masks (full-res GT volumes): per-corner scalar gathers —
    # a 4x-stacked table risks XLA materializing a float copy of 4x the GT
    # volume, which OOMs at full resolution
    flat = masks.reshape(*masks.shape[:-2], H * W)

    def corner(yc, xc, wy, wx):
        valid = (yc >= 1) & (yc <= H) & (xc >= 1) & (xc <= W)
        idx = jnp.clip(yc - 1, 0, H - 1) * W + jnp.clip(xc - 1, 0, W - 1)
        g = jnp.take_along_axis(flat, idx, axis=-1).astype(out_dtype)
        return g * ((wy * wx) * (valid & inb).astype(jnp.float32)).astype(out_dtype)

    return (
        corner(yi, xi, wy0, wx0)
        + corner(yi, xi + 1, wy0, wx1)
        + corner(yi + 1, xi, wy1, wx0)
        + corner(yi + 1, xi + 1, wy1, wx1)
    )


def uncertain_point_coords_with_randomness(
    rng: jax.Array,
    logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jnp.ndarray:
    """Importance sampling of point coordinates from mask logits.

    Args:
      rng: PRNG key.
      logits: (N, H, W) predicted mask logits (uncertainty = -|logit|).
      num_points: number of points to return per mask.
    Returns:
      (N, num_points, 2) coords in [0, 1], (x, y).
    """
    N = logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain

    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (N, num_sampled, 2), dtype=jnp.float32)
    point_logits = point_sample(logits, coords)  # (N, num_sampled)
    uncertainty = -jnp.abs(point_logits)
    _, idx = jax.lax.top_k(uncertainty, num_uncertain)  # (N, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if num_random > 0:
        rand = jax.random.uniform(k2, (N, num_random, 2), dtype=jnp.float32)
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
