"""Vanilla DETR encoder/decoder transformer (legacy path).

Re-designs reference ``transformer.py``
(``DVIS_Plus/mask2former/modeling/transformer_decoder/transformer.py``, 369
LoC): the original pre/post-norm encoder-decoder used by the
``TransformerEncoderPixelDecoder`` MaskFormer variant. Kept for architecture
completeness; the shipped DVIS configs use the masked-attention decoder.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dvis_plus_tpu.models.segmenter.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    MultiHeadAttention,
    SelfAttentionLayer,
)


class DETRTransformer(nn.Module):
    """Encoder over flattened features + decoder over learned queries.

    Returns (decoder outputs per layer (L, B, Q, C), encoded memory)."""

    d_model: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    return_intermediate: bool = True

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # (B, L, C) flattened features
        pos: jnp.ndarray,  # (B|1, L, C) positional encodings
        query_embed: jnp.ndarray,  # (Q, C) learned query pos
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, L, C = src.shape
        Q = query_embed.shape[0]
        pos = jnp.broadcast_to(pos, (B, L, C)).astype(src.dtype)

        memory = src
        for i in range(self.num_encoder_layers):
            memory = SelfAttentionLayer(C, self.num_heads, name=f"enc_self_{i}")(
                memory, pos
            )
            memory = FFNLayer(C, self.dim_feedforward, name=f"enc_ffn_{i}")(memory)

        qpos = jnp.broadcast_to(query_embed[None], (B, Q, C)).astype(src.dtype)
        tgt = jnp.zeros((B, Q, C), src.dtype)
        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="dec_norm")  # shared across layers
        inter = []
        for i in range(self.num_decoder_layers):
            tgt = SelfAttentionLayer(C, self.num_heads, name=f"dec_self_{i}")(tgt, qpos)
            tgt = CrossAttentionLayer(C, self.num_heads, name=f"dec_cross_{i}")(
                tgt, memory, pos, qpos
            )
            tgt = FFNLayer(C, self.dim_feedforward, name=f"dec_ffn_{i}")(tgt)
            inter.append(decoder_norm(tgt))
        outs = jnp.stack(inter, axis=0) if self.return_intermediate else inter[-1][None]
        return outs, memory
