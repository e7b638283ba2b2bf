"""Open-vocabulary decoder variants: CLIP-space class heads.

Re-designs ``DVIS_Plus/ov_dvis/video_mask2former_transformer_decoder_ov.py``
(``_dvis_OV`` :69, ``_minvis_OV`` :368) and the head sharing in
``video_dvis_modules_ov.py``: the fixed (K+1)-way class head is replaced by
  class_embed( maskpool_proj(mask_pool(mask_features, pred_mask)) + x )
projected into CLIP space and scored against the per-dataset text classifier
via :func:`~dvis_plus_tpu.models.ov.heads.get_classification_logits`
(reference decoder :331-343). The reference shares one head across segmenter /
tracker / refiner; here each module owns a structurally-identical head (tied
at weight-conversion time).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.models.ov.heads import get_classification_logits, mask_pooling
from dvis_plus_tpu.models.segmenter.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    MLP,
    SelfAttentionLayer,
)
from dvis_plus_tpu.models.segmenter.position_encoding import position_embedding_sine_2d


class OVClassHead(nn.Module):
    """FC-CLIP class head: mask-pooled features + query embed -> CLIP space."""

    hidden_dim: int
    clip_embed_dim: int = 768

    @nn.compact
    def __call__(
        self,
        query_embeds: jnp.ndarray,  # (B', Q, C) decoder outputs (normed)
        mask_features: jnp.ndarray,  # (B', H, W, C) per-frame mask features
        pred_masks: jnp.ndarray,  # (B', Q, H, W) mask logits
        text_classifier: jnp.ndarray,  # (R, Cc)
        num_templates: Sequence[int],
    ) -> jnp.ndarray:
        pooled = mask_pooling(mask_features, pred_masks)  # (B', Q, C)
        d = query_embeds.dtype  # AMP follows the caller's cast (params fp32)
        pooled = pooled.astype(d)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=d, name="maskpool_norm")(pooled)
        pooled = nn.Dense(self.hidden_dim, dtype=d, name="maskpool_proj")(pooled)
        x = self.param("logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ())
        class_embed = MLP(
            self.hidden_dim, self.clip_embed_dim, num_layers=3, name="class_embed"
        )(pooled + query_embeds)
        return get_classification_logits(class_embed, text_classifier, x, num_templates)


class OVMaskedTransformerDecoder(nn.Module):
    """Per-frame masked-attention decoder with the CLIP class head
    (reference ``_dvis_OV`` / ``_minvis_OV``)."""

    hidden_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    dim_feedforward: int = 2048
    num_layers: int = 9
    num_levels: int = 3
    mask_dim: int = 256
    clip_embed_dim: int = 768

    @nn.compact
    def __call__(
        self,
        multi_scale: Sequence[jnp.ndarray],
        mask_features: jnp.ndarray,  # (BT, H4, W4, mask_dim)
        text_classifier: jnp.ndarray,
        num_templates: Sequence[int],
    ) -> Dict[str, jnp.ndarray]:
        BT = multi_scale[0].shape[0]
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
            proj = x if x.shape[-1] == C else nn.Conv(C, (1, 1), dtype=dtype, name=f"input_proj_{i}")(x)
            srcs.append(proj.reshape(BT, Hl * Wl, C) + level_embed[i][None, None].astype(dtype))
            poss.append(
                position_embedding_sine_2d(Hl, Wl, C // 2).reshape(1, Hl * Wl, C).astype(dtype)
            )
            sizes.append((Hl, Wl))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="decoder_norm")
        mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")
        ov_head = OVClassHead(C, self.clip_embed_dim, name="ov_head")

        def prediction_heads(output, attn_size):
            x = decoder_norm(output)
            membd = mask_embed(x)
            masks = jnp.einsum(
                "bqc,bhwc->bqhw", membd, mask_features, preferred_element_type=jnp.float32
            )
            logits = ov_head(x, mask_features, masks, text_classifier, num_templates)
            am = jax.image.resize(masks, (BT, self.num_queries) + attn_size, method="bilinear", antialias=False)
            am = jax.nn.sigmoid(am.reshape(BT, self.num_queries, -1)) < 0.5
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = jnp.where(all_blocked, False, am)
            additive = jnp.where(am, -1e9, 0.0)[:, None]
            return logits, masks, jax.lax.stop_gradient(additive)

        output = jnp.broadcast_to(query_feat[None], (BT, self.num_queries, C)).astype(dtype)
        qpos = jnp.broadcast_to(query_embed[None], (BT, self.num_queries, C)).astype(dtype)

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

        embds = decoder_norm(output)
        return {
            "pred_logits": pred_logits[-1],
            "pred_masks": pred_masks[-1],
            "aux_pred_logits": pred_logits[:-1],
            "aux_pred_masks": pred_masks[:-1],
            "pred_embds_without_norm": output,
            "pred_embds": embds,
            "mask_features": mask_features,
            "query_feat": query_feat,
        }
