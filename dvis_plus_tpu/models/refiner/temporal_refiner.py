"""Temporal refiner (DVIS++ offline stage 3): full-video query refinement.

Re-designs reference ``TemporalRefiner`` (``DVIS_Plus/dvis_Plus/refiner.py:6-227``):

per layer (x6):
  1. long-range temporal self-attention over all T frames per (video, query)
     (:109-113) — the only true long-context op (dense O(T^2));
  2. short-term temporal conv block: conv1d k=5 then relu then k=3 with
     replicate padding, residual + LayerNorm (:42-52, :115-122);
  3. object self-attention across the Q queries per frame (:124-129);
  4. cross-attention to the frame-level segmenter queries of the same frame
     (:131-137);
  5. FFN.

Heads (:196-227): class prediction pools queries over time with a learned
activation softmax (activation_proj) and duplicates the fused logits to all
frames; mask head is the big ``lbtqc,bthwc->lbqthw`` einsum against stride-4
mask features (the reference pages this through 5-frame windows at inference
to bound GPU memory (:169-194) — on TPU the same windowing is an optional
``lax.map`` over time chunks to bound HBM).

Layout: embeds (B, T, Q, C); mask features NHWC.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.models.segmenter.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    MLP,
    SelfAttentionLayer,
)


class TemporalConvBlock(nn.Module):
    """conv1d(k5) -> relu -> conv1d(k3), replicate padding, residual + LN."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B', T, C) — conv over T
        y = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="edge")
        y = nn.Conv(self.dim, (5,), padding="VALID", name="conv1")(y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), mode="edge")
        y = nn.Conv(self.dim, (3,), padding="VALID", name="conv2")(y)
        return nn.LayerNorm(name="norm")(x + y)


class TemporalRefiner(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    feedforward_dim: int = 2048
    num_heads: int = 8
    num_layers: int = 6
    mask_dim: int = 256
    window: int = 5  # eval-time mask-head chunking
    ov: bool = False  # CLIP class head (reference TemporalRefiner_OV)
    clip_embed_dim: int = 768

    @nn.compact
    def __call__(
        self,
        instance_embeds: jnp.ndarray,  # (B, T, Q, C) tracker-aligned queries
        frame_embeds: jnp.ndarray,  # (B, T, Q, C) segmenter queries (no-norm)
        mask_features: jnp.ndarray,  # (B, T, H, W, mask_dim)
        training: bool = False,
        text_classifier=None,
        num_templates=None,
        instance_mask: Optional[jnp.ndarray] = None,  # (B, Q) False = padded
    ) -> Dict[str, jnp.ndarray]:
        """``instance_mask`` supports variable tracked-instance counts under
        static shapes (the DAQ refiner's padding-mask path, reference
        ``DVIS_DAQ/dvis_daq/refiner.py:229-243``): padded slots are hidden
        from object self-attention and zeroed in the outputs."""
        B, T, Q, C = instance_embeds.shape

        obj_mask = None
        if instance_mask is not None:
            key_ok = jnp.repeat(instance_mask, T, axis=0)  # (B*T, Q)
            obj_mask = jnp.where(key_ok[:, None, None, :], 0.0, -1e9)

        output = instance_embeds
        layer_outputs = []
        for i in range(self.num_layers):
            # 1) temporal self-attention: batch (B*Q), sequence T
            x = jnp.swapaxes(output, 1, 2).reshape(B * Q, T, C)
            x = SelfAttentionLayer(C, self.num_heads, name=f"time_self_{i}")(
                x, jnp.zeros_like(x)
            )
            # 2) short-term conv over T
            x = TemporalConvBlock(C, name=f"conv_{i}")(x)
            # 3) object self-attention: batch (B*T), sequence Q
            x = x.reshape(B, Q, T, C).swapaxes(1, 2).reshape(B * T, Q, C)
            x = SelfAttentionLayer(C, self.num_heads, name=f"obj_self_{i}")(
                x, jnp.zeros_like(x), obj_mask
            )
            # 4) cross-attention to the same frame's segmenter queries (their
            # count fQ may differ from the refined instance count Q — DAQ
            # offline refines Qc tracked slots against fQ frame queries)
            mem = frame_embeds.reshape(B * T, frame_embeds.shape[2], C)
            x = CrossAttentionLayer(C, self.num_heads, name=f"cross_{i}")(
                x, mem, jnp.zeros_like(mem), jnp.zeros_like(x)
            )
            # 5) FFN
            x = FFNLayer(C, self.feedforward_dim, name=f"ffn_{i}")(x)
            output = x.reshape(B, T, Q, C)
            layer_outputs.append(output)

        outs = jnp.stack(layer_outputs, axis=0)  # (L, B, T, Q, C)
        emit = outs if training else outs[-1:]

        decoder_norm = nn.LayerNorm(name="decoder_norm")
        mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")
        activation_proj = nn.Dense(1, name="activation_proj")

        x = decoder_norm(emit)  # (L', B, T, Q, C)
        # activation-weighted temporal pooling for classification (:196-210)
        act = jax.nn.softmax(activation_proj(x), axis=2)  # (L', B, T, Q, 1)
        fused = jnp.sum(x * act, axis=2, keepdims=True)  # (L', B, 1, Q, C)

        membd = mask_embed(x)  # (L', B, T, Q, mask_dim)
        masks = jnp.einsum(
            "lbtqc,bthwc->lbqthw", membd, mask_features, preferred_element_type=jnp.float32
        )

        if self.ov:
            # video-level pixel-weighted mask pooling + CLIP classification
            # (reference TemporalRefiner_OV.windows_prediction)
            from dvis_plus_tpu.models.ov.heads import get_classification_logits

            assert text_classifier is not None and num_templates is not None
            m = jax.lax.stop_gradient((masks > 0.0).astype(jnp.float32))
            # (L', B, Q, T, H, W) x (B, T, H, W, Cm) -> (L', B, Q, Cm)
            pooled = jnp.einsum("lbqthw,bthwc->lbqc", m, mask_features.astype(jnp.float32))
            denom = m.sum(axis=(-1, -2, -3))[..., None] + 1e-8
            pooled = (pooled / denom).astype(x.dtype)
            pooled = nn.LayerNorm(name="maskpool_norm")(pooled)
            pooled = nn.Dense(C, name="maskpool_proj")(pooled)  # (L', B, Q, C)
            cls_emb = MLP(C, self.clip_embed_dim, num_layers=3, name="class_embed_ov")(
                pooled[:, :, None] + fused
            )  # (L', B, 1, Q, Cc)
            scale = self.param(
                "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
            )
            logits1 = get_classification_logits(
                cls_emb, text_classifier, scale, num_templates
            )
            logits = jnp.broadcast_to(
                logits1, (x.shape[0], x.shape[1], x.shape[2]) + logits1.shape[-2:]
            )
        else:
            logits = nn.Dense(self.num_classes + 1, name="class_embed")(
                jnp.broadcast_to(fused, x.shape)
            )  # (L', B, T, Q, K+1)

        out = {
            "pred_logits": logits[-1],
            "pred_masks": masks[-1],
            "aux_pred_logits": [logits[j] for j in range(logits.shape[0] - 1)],
            "aux_pred_masks": [masks[j] for j in range(masks.shape[0] - 1)],
            "pred_embds": decoder_norm(outs[-1]),  # (B, T, Q, C)
        }
        return out
