"""Clip-joint masked-attention decoder (VITA-style video Mask2Former).

Re-designs reference ``VideoMultiScaleMaskedTransformerDecoder``
(``DVIS_Plus/mask2former_video/modeling/transformer_decoder/
video_mask2former_transformer_decoder.py:208-474``): one query set decodes the
WHOLE clip jointly — cross-attention memory is the (T*H_l*W_l) token stack per
level with the 3D (t, y, x) sine PE, class logits are clip-level (B, Q, K+1),
masks are (B, Q, T, H4, W4) via ``bqc,bthwc->bqthw``. Used by the
``VideoMaskFormer`` pretraining meta-arch (video_maskformer_model.py:24).
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.models.segmenter.position_encoding import position_embedding_sine_3d
from dvis_plus_tpu.models.segmenter.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    MLP,
    SelfAttentionLayer,
)


class ClipMaskedTransformerDecoder(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    dim_feedforward: int = 2048
    num_layers: int = 9
    num_levels: int = 3
    mask_dim: int = 256

    @nn.compact
    def __call__(
        self,
        multi_scale: Sequence[jnp.ndarray],  # 3 x (B*T, H_l, W_l, C)
        mask_features: jnp.ndarray,  # (B*T, H4, W4, mask_dim)
        num_frames: int,
    ) -> Dict[str, jnp.ndarray]:
        BT = multi_scale[0].shape[0]
        T = num_frames
        B = BT // T
        C = self.hidden_dim
        dtype = multi_scale[0].dtype

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_levels, C)
        )
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, C)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, C)
        )

        srcs, poss, sizes = [], [], []
        for i, x in enumerate(multi_scale):
            _, Hl, Wl, _ = x.shape
            proj = x if x.shape[-1] == C else nn.Conv(C, (1, 1), dtype=x.dtype, name=f"input_proj_{i}")(x)
            # (B, T*Hl*Wl, C) token stack per level
            srcs.append(
                proj.reshape(B, T * Hl * Wl, C) + level_embed[i][None, None].astype(dtype)
            )
            pe = position_embedding_sine_3d(T, Hl, Wl, C)
            poss.append(pe.reshape(1, T * Hl * Wl, C).astype(dtype))
            sizes.append((Hl, Wl))

        mf = mask_features.reshape(B, T, *mask_features.shape[1:])  # (B,T,H4,W4,Cm)
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=dtype, name="class_embed")
        mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")

        def prediction_heads(output, attn_size):
            x = decoder_norm(output)
            logits = class_embed(x)  # (B, Q, K+1) clip-level
            membd = mask_embed(x)
            masks = jnp.einsum(
                "bqc,bthwc->bqthw", membd, mf, preferred_element_type=jnp.float32
            )
            am = jax.image.resize(
                masks, (B, self.num_queries, T) + attn_size, method="bilinear", antialias=False
            )
            am = jax.nn.sigmoid(am.reshape(B, self.num_queries, -1)) < 0.5
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = jnp.where(all_blocked, False, am)
            additive = jnp.where(am, -1e9, 0.0)[:, None]  # (B, 1, Q, T*HW)
            return logits, masks, jax.lax.stop_gradient(additive)

        output = jnp.broadcast_to(query_feat[None], (B, self.num_queries, C)).astype(dtype)
        qpos = jnp.broadcast_to(query_embed[None], (B, self.num_queries, C)).astype(dtype)

        logits0, masks0, attn_mask = prediction_heads(output, sizes[0])
        pred_logits, pred_masks = [logits0], [masks0]
        for i in range(self.num_layers):
            li = i % self.num_levels
            output = CrossAttentionLayer(C, self.num_heads, name=f"cross_{i}")(
                output, srcs[li], poss[li], qpos, attn_mask
            )
            output = SelfAttentionLayer(C, self.num_heads, name=f"self_{i}")(output, qpos)
            output = FFNLayer(C, self.dim_feedforward, name=f"ffn_{i}")(output)
            lg, mk, attn_mask = prediction_heads(output, sizes[(i + 1) % self.num_levels])
            pred_logits.append(lg)
            pred_masks.append(mk)

        return {
            "pred_logits": pred_logits[-1],  # (B, Q, K+1)
            "pred_masks": pred_masks[-1],  # (B, Q, T, H4, W4)
            "aux_pred_logits": pred_logits[:-1],
            "aux_pred_masks": pred_masks[:-1],
            "pred_embds": decoder_norm(output),
        }
