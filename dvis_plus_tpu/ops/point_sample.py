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
    """
    H, W = masks.shape[-2], masks.shape[-1]
    coords = coords.astype(jnp.float32)
    x = coords[..., 0] * W - 0.5
    y = coords[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1.0, y0 + 1.0
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    flat = masks.reshape(*masks.shape[:-2], H * W)
    # bool / low-precision masks are cast AFTER the gather so a full-resolution
    # float copy of the (possibly huge) GT mask volume is never materialized
    out_dtype = masks.dtype if jnp.issubdtype(masks.dtype, jnp.floating) else jnp.float32

    def corner(yi, xi, wy, wx):
        yi_i = yi.astype(jnp.int32)
        xi_i = xi.astype(jnp.int32)
        valid = (xi_i >= 0) & (xi_i < W) & (yi_i >= 0) & (yi_i < H)
        idx = jnp.clip(yi_i, 0, H - 1) * W + jnp.clip(xi_i, 0, W - 1)
        g = jnp.take_along_axis(flat, idx, axis=-1).astype(out_dtype)
        return g * ((wy * wx) * valid.astype(jnp.float32)).astype(out_dtype)

    return (
        corner(y0, x0, wy0, wx0)
        + corner(y0, x1, wy0, wx1)
        + corner(y1, x0, wy1, wx0)
        + corner(y1, x1, wy1, wx1)
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
