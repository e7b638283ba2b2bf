"""Blockwise (flash) self-attention for long token sequences on TPU.

The dense attention path (``transformer_decoder._attention``) materializes
the (B, H, L, L) score matrix in HBM; for the DINOv2 ViT-L trunk at
736x1280 (L = 46*80+1 = 3681 tokens/frame, 16 heads, T=5 frames) that is
~4.3 GB of score traffic per block — the trunk is HBM-bound, not
MXU-bound (reference runs the same dense math on CUDA,
``mask2former/modeling/backbones_vitAdapter/layers/attention.py``; on TPU
the idiomatic fix is a fused VMEM-resident kernel, not a translation).

This wraps ``jax.experimental.pallas.ops.tpu.flash_attention`` with the
padding/masking plumbing our shapes need:

- token counts are rarely MXU-aligned (3681 = 46*80 grid + cls token), so
  inputs are padded to a multiple of 1024 and padded KEYS are masked via
  segment ids (padded queries compute garbage that is sliced off);
- block sizes (512 q / 1024 k) measured best on v5e at ViT-L scale:
  10.4 ms vs 18.3 ms dense per layer (see
  ``tools/profiling/flash_attn_probe.py``);
- short sequences fall back to the dense path — blockwise attention only
  pays above a couple thousand tokens, and tiny CI shapes would be all
  padding.

Serving-only knob (``backbone.vit_flash_attention``), mirroring the
``swin_fast_softmax`` policy: parity runs keep the fp32 dense softmax
island; flash is bf16 with fp32 accumulation (measured 2e-3 max-abs vs
dense bf16 at ViT-L scale — the same order as bf16 reduction noise).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# below this many tokens the dense path wins (padding + kernel overhead)
_MIN_FLASH_TOKENS = 2048
_PAD_MULTIPLE = 1024


def flash_self_attention(
    q: jnp.ndarray,  # (B, L, H, Dh)
    k: jnp.ndarray,  # (B, L, H, Dh)
    v: jnp.ndarray,  # (B, L, H, Dh)
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fused blockwise self-attention; falls back to dense off-TPU or for
    short sequences. Same contract as ``_attention`` without a mask."""
    from dvis_plus_tpu.models.segmenter.transformer_decoder import _attention

    B, L, H, Dh = q.shape
    if L < _MIN_FLASH_TOKENS or jax.default_backend() != "tpu":
        return _attention(q, k, v)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    if sm_scale is None:
        sm_scale = 1.0 / float(Dh) ** 0.5

    Lp = -(-L // _PAD_MULTIPLE) * _PAD_MULTIPLE
    pad = Lp - L

    def to_bhld(x):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)

    segment_ids = None
    if pad:
        kv_seg = jnp.concatenate(
            [jnp.ones((B, L), jnp.int32), jnp.zeros((B, pad), jnp.int32)], axis=1
        )
        # padded q rows keep segment 1: they attend real keys and produce
        # finite garbage (sliced off below) instead of fully-masked NaNs
        segment_ids = fa.SegmentIds(q=jnp.ones((B, Lp), jnp.int32), kv=kv_seg)

    block = fa.BlockSizes(
        block_q=min(512, Lp),
        block_k_major=min(1024, Lp),
        block_k=min(1024, Lp),
        block_b=1,
    )
    out = fa.flash_attention(
        to_bhld(q), to_bhld(k), to_bhld(v),
        segment_ids=segment_ids,
        sm_scale=sm_scale,
        block_sizes=block,
    )
    return out[:, :, :L].transpose(0, 2, 1, 3)
