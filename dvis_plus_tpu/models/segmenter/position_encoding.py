"""Sine position encodings (2D image, 3D video, 1D temporal).

Specs: reference ``DVIS_Plus/mask2former/modeling/transformer_decoder/position_encoding.py:12``
(PositionEmbeddingSine) and
``mask2former_video/modeling/transformer_decoder/position_encoding.py:12,59``
(PositionEmbeddingSine3D / SineTime). No padding masks on TPU (static shapes),
so the cumsum over a no-pad mask reduces to index grids. Channel-last output.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def _sine_embed(coord: jnp.ndarray, num_pos_feats: int, temperature: float) -> jnp.ndarray:
    """coord (...,) -> (..., num_pos_feats) interleaved sin/cos."""
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos = coord[..., None] / dim_t
    # interleave: even indices sin, odd indices cos (torch stack+flatten order)
    return jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1).reshape(
        *pos.shape[:-1], -1
    )


def position_embedding_sine_2d(
    H: int,
    W: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2.0 * math.pi,
) -> jnp.ndarray:
    """(H, W, 2*num_pos_feats) with [pos_y, pos_x] channel concat."""
    y = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    x = jnp.arange(1, W + 1, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    if normalize:
        eps = 1e-6
        y = y / (H + eps) * scale
        x = x / (W + eps) * scale
    pos_y = _sine_embed(y, num_pos_feats, temperature)
    pos_x = _sine_embed(x, num_pos_feats, temperature)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def position_embedding_sine_3d(
    T: int,
    H: int,
    W: int,
    channels: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2.0 * math.pi,
) -> jnp.ndarray:
    """(T, H, W, channels) video sine PE: concat(pos_y, pos_x) at channels/2
    each, plus an additive temporal embedding pos_z over the full channel width
    (reference PositionEmbeddingSine3D: ``cat((pos_y, pos_x)) + pos_z``)."""
    n_spatial = channels // 2
    z = jnp.broadcast_to(jnp.arange(1, T + 1, dtype=jnp.float32)[:, None, None], (T, H, W))
    y = jnp.broadcast_to(jnp.arange(1, H + 1, dtype=jnp.float32)[None, :, None], (T, H, W))
    x = jnp.broadcast_to(jnp.arange(1, W + 1, dtype=jnp.float32)[None, None, :], (T, H, W))
    if normalize:
        eps = 1e-6
        z = z / (T + eps) * scale
        y = y / (H + eps) * scale
        x = x / (W + eps) * scale
    pos_z = _sine_embed(z, channels, temperature)
    pos_y = _sine_embed(y, n_spatial, temperature)
    pos_x = _sine_embed(x, n_spatial, temperature)
    return jnp.concatenate([pos_y, pos_x], axis=-1) + pos_z


def position_embedding_sine_time(
    T: int,
    channels: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2.0 * math.pi,
) -> jnp.ndarray:
    """(T, channels) pure temporal sine PE (PositionEmbeddingSineTime :59)."""
    t = jnp.arange(1, T + 1, dtype=jnp.float32)
    if normalize:
        eps = 1e-6
        t = t / (T + eps) * scale
    return _sine_embed(t, channels, temperature)
