"""Temporal refiner (DVIS++ offline stage 3): full-video query refinement.

Re-designs reference ``TemporalRefiner`` (``DVIS_Plus/dvis_Plus/refiner.py:6-227``
and the padding-mask DAQ variant ``DVIS_DAQ/dvis_daq/refiner.py:6-247``):

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
mask features.

Windowed mask prediction (reference ``windows_prediction`` :169-194 pages mask
features GPU<->CPU in 5-frame chunks): the TPU-native equivalent splits the
refiner into :meth:`embed_pass` (runs once over the whole video's embeds —
tiny tensors, O(T) HBM) and :meth:`mask_window` (the parameter-bearing mask
head applied to one time chunk). The inference driver keeps full-video mask
features **on host** and pages one window at a time through
``mask_window`` — HBM use is bounded by the window size, not the video length.

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
    """conv1d(k5) -> relu -> conv1d(k3), replicate padding, residual + LN.

    ``time_ok`` (B', T) supports length-bucketed eval: before EACH conv the
    pad region is overwritten with the last real frame's values, so every
    conv sees exactly the replicate boundary the reference sees at the true
    length (`padding_mode='replicate'`, refiner.py:42-52). The reset must
    happen between the two convs as well — conv1's outputs at pad positions
    straddle the real/pad boundary and are NOT replicas of the last real
    output."""

    dim: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_ok: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # x: (B', T, C) — conv over T; AMP follows the caller's cast
        d = x.dtype

        if time_ok is not None:
            last_idx = jnp.sum(time_ok, axis=1).astype(jnp.int32) - 1

            def fix(z):
                last = jnp.take_along_axis(z, last_idx[:, None, None], axis=1)
                return jnp.where(time_ok[:, :, None], z, last)
        else:
            fix = lambda z: z

        y = fix(x)
        y = jnp.pad(y, ((0, 0), (2, 2), (0, 0)), mode="edge")
        y = nn.Conv(self.dim, (5,), padding="VALID", dtype=d, name="conv1")(y)
        y = nn.relu(y)
        y = fix(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), mode="edge")
        y = nn.Conv(self.dim, (3,), padding="VALID", dtype=d, name="conv2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=d, name="norm")(x + y)


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
    dtype: object = None  # compute dtype of the head layers (params fp32)

    def setup(self):
        C = self.hidden_dim
        self.time_self_layers = [
            SelfAttentionLayer(C, self.num_heads, name=f"time_self_{i}")
            for i in range(self.num_layers)
        ]
        self.conv_layers = [
            TemporalConvBlock(C, name=f"conv_{i}") for i in range(self.num_layers)
        ]
        self.obj_self_layers = [
            SelfAttentionLayer(C, self.num_heads, name=f"obj_self_{i}")
            for i in range(self.num_layers)
        ]
        self.cross_layers = [
            CrossAttentionLayer(C, self.num_heads, name=f"cross_{i}")
            for i in range(self.num_layers)
        ]
        self.ffn_layers = [
            FFNLayer(C, self.feedforward_dim, name=f"ffn_{i}")
            for i in range(self.num_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        self.mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")
        self.activation_proj = nn.Dense(1, dtype=self.dtype, name="activation_proj")
        if self.ov:
            self.maskpool_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="maskpool_norm")
            self.maskpool_proj = nn.Dense(C, dtype=self.dtype, name="maskpool_proj")
            self.class_embed_ov = MLP(
                C, self.clip_embed_dim, num_layers=3, name="class_embed_ov"
            )
            self.logit_scale = self.param(
                "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
            )
        else:
            self.class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="class_embed")

    # ------------------------------------------------------------------
    # transformer body (shared by training forward and eval embed pass)
    # ------------------------------------------------------------------

    def _body(
        self,
        instance_embeds: jnp.ndarray,  # (B, T, Q, C)
        frame_embeds: jnp.ndarray,  # (B, T, fQ, C)
        instance_mask: Optional[jnp.ndarray] = None,  # (B, Q) False = padded
        axis_name: Optional[str] = None,  # sequence-parallel: Q is a shard
        time_mask: Optional[jnp.ndarray] = None,  # (B, T) False = padded frame
    ) -> jnp.ndarray:
        """Returns stacked per-layer outputs (L, B, T, Q, C).

        ``time_mask`` supports length-bucketed eval under static shapes: pad
        frames are excluded as KEYS in the temporal self-attention. Callers
        must pad the time axis by REPLICATING the frame at the last valid
        index — then the replicate-padded temporal conv sees exactly the
        reference's `padding_mode='replicate'` boundary (refiner.py:42-52)
        and every real-frame activation equals the unpadded run bit-for-bit
        (pointwise ops preserve the "pad == last frame" invariant, and a pad
        query identical to the last frame's produces its exact attention
        output).

        With ``axis_name`` set (inside ``shard_map``), ``instance_embeds``
        holds this device's OBJECT shard: the temporal attention, conv, FFN
        and heads are object-local, so T^2 compute and O(T*Q*C) memory split
        across the mesh; only the per-frame object self-attention all-gathers
        its keys/values over ICI. ``instance_mask`` must then be the FULL
        (B, Q_total) mask (replicated), marking padded/invalid objects."""
        B, T, Q, C = instance_embeds.shape

        obj_mask = None
        if instance_mask is not None:
            key_ok = jnp.repeat(instance_mask, T, axis=0)  # (B*T, Q_total)
            obj_mask = jnp.where(key_ok[:, None, None, :], 0.0, -1e9)

        tmask_bias = None
        key_ok_t = None
        if time_mask is not None:
            key_ok_t = jnp.repeat(time_mask, Q, axis=0)  # (B*Q, T)
            tmask_bias = jnp.where(key_ok_t[:, None, None, :], 0.0, -1e9)

        output = instance_embeds
        layer_outputs = []
        for i in range(self.num_layers):
            # 1) temporal self-attention: batch (B*Q), sequence T
            x = jnp.swapaxes(output, 1, 2).reshape(B * Q, T, C)
            x = self.time_self_layers[i](x, jnp.zeros_like(x), tmask_bias)
            # 2) short-term conv over T (replicate-boundary reset inside)
            x = self.conv_layers[i](x, key_ok_t)
            # 3) object self-attention: batch (B*T), sequence Q
            x = x.reshape(B, Q, T, C).swapaxes(1, 2).reshape(B * T, Q, C)
            if axis_name is None:
                x = self.obj_self_layers[i](x, jnp.zeros_like(x), obj_mask)
            else:
                kv = jax.lax.all_gather(x, axis_name, axis=1, tiled=True)
                x = self.obj_self_layers[i](
                    x, jnp.zeros_like(x), obj_mask, kv=kv
                )
            # 4) cross-attention to the same frame's segmenter queries (their
            # count fQ may differ from the refined instance count Q — DAQ
            # offline refines Qc tracked slots against fQ frame queries)
            mem = frame_embeds.reshape(B * T, frame_embeds.shape[2], C)
            x = self.cross_layers[i](x, mem, jnp.zeros_like(mem), jnp.zeros_like(x))
            # 5) FFN
            x = self.ffn_layers[i](x)
            output = x.reshape(B, T, Q, C)
            layer_outputs.append(output)
        return jnp.stack(layer_outputs, axis=0)

    def _pred_class(
        self, x: jnp.ndarray, time_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Activation-weighted temporal pooling -> per-frame duplicated logits
        (reference pred_class :196-210). x: normalized (L', B, T, Q, C);
        padded frames (time_mask False) are excluded from the softmax."""
        a = self.activation_proj(x)  # (L', B, T, Q, 1)
        if time_mask is not None:
            a = jnp.where(time_mask[None, :, :, None, None], a, -1e9)
        act = jax.nn.softmax(a, axis=2)  # (L', B, T, Q, 1)
        fused = jnp.sum(x * act, axis=2, keepdims=True)  # (L', B, 1, Q, C)
        return fused

    # ------------------------------------------------------------------
    # public entry points
    # ------------------------------------------------------------------

    def __call__(
        self,
        instance_embeds: jnp.ndarray,  # (B, T, Q, C) tracker-aligned queries
        frame_embeds: jnp.ndarray,  # (B, T, fQ, C) segmenter queries (no-norm)
        mask_features: jnp.ndarray,  # (B, T, H, W, mask_dim)
        training: bool = False,
        text_classifier=None,
        num_templates=None,
        instance_mask: Optional[jnp.ndarray] = None,  # (B, Q) False = padded
    ) -> Dict[str, jnp.ndarray]:
        """Full in-graph forward (training, and eval when the whole video's
        mask features fit in HBM). ``instance_mask`` supports variable tracked
        -instance counts under static shapes (the DAQ refiner's padding-mask
        path, reference ``DVIS_DAQ/dvis_daq/refiner.py:229-243``)."""
        outs = self._body(instance_embeds, frame_embeds, instance_mask)
        emit = outs if training else outs[-1:]

        x = self.decoder_norm(emit)  # (L', B, T, Q, C)
        fused = self._pred_class(x)

        membd = self.mask_embed(x)  # (L', B, T, Q, mask_dim)
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
            pooled = self.maskpool_norm(pooled)
            pooled = self.maskpool_proj(pooled)  # (L', B, Q, C)
            cls_emb = self.class_embed_ov(pooled[:, :, None] + fused)  # (L', B, 1, Q, Cc)
            logits1 = get_classification_logits(
                cls_emb, text_classifier, self.logit_scale, num_templates
            )
            logits = jnp.broadcast_to(
                logits1, (x.shape[0], x.shape[1], x.shape[2]) + logits1.shape[-2:]
            )
        else:
            logits = self.class_embed(jnp.broadcast_to(fused, x.shape))
            # (L', B, T, Q, K+1)

        out = {
            "pred_logits": logits[-1],
            "pred_masks": masks[-1],
            "aux_pred_logits": [logits[j] for j in range(logits.shape[0] - 1)],
            "aux_pred_masks": [masks[j] for j in range(masks.shape[0] - 1)],
            "pred_embds": self.decoder_norm(outs[-1]),  # (B, T, Q, C)
        }
        return out

    def embed_pass(
        self,
        instance_embeds: jnp.ndarray,  # (B, T, Q, C)
        frame_embeds: jnp.ndarray,  # (B, T, fQ, C)
        instance_mask: Optional[jnp.ndarray] = None,  # (B, Q)
        axis_name: Optional[str] = None,  # see _body: Q-sharded under shard_map
        time_mask: Optional[jnp.ndarray] = None,  # (B, T) — see _body
    ) -> Dict[str, jnp.ndarray]:
        """Eval-time pass over embeds only — no mask features touched, so HBM
        is O(T·Q·C). Returns the final-layer class logits and the mask-head
        embeddings to feed :meth:`mask_window` per time chunk (the TPU
        replacement for reference ``windows_prediction`` refiner.py:169-194).
        For long videos on a mesh use
        :func:`dvis_plus_tpu.parallel.sp.refiner_embed_pass_sharded`."""
        outs = self._body(
            instance_embeds, frame_embeds, instance_mask, axis_name, time_mask
        )
        x = self.decoder_norm(outs[-1:])  # (1, B, T, Q, C)
        fused = self._pred_class(x, time_mask)
        if self.ov:
            membd = self.mask_embed(x)
            # OV classification needs mask pooling; return the pieces and let
            # the driver accumulate pooled features over windows.
            return {
                "fused": fused[0],  # (B, 1, Q, C)
                "mask_embed": membd[0],  # (B, T, Q, mask_dim)
                "pred_embds": self.decoder_norm(outs[-1]),
            }
        logits = self.class_embed(fused)[0]  # (B, 1, Q, K+1)
        return {
            "pred_logits": logits[:, 0],  # (B, Q, K+1) video-level
            "mask_embed": self.mask_embed(x)[0],  # (B, T, Q, mask_dim)
            "pred_embds": self.decoder_norm(outs[-1]),
        }

    def mask_window(
        self,
        mask_embed: jnp.ndarray,  # (B, Tw, Q, mask_dim) chunk from embed_pass
        mask_features: jnp.ndarray,  # (B, Tw, H, W, mask_dim) chunk
    ) -> jnp.ndarray:
        """Mask head on one time window: (B, Q, Tw, H, W) logits."""
        return jnp.einsum(
            "btqc,bthwc->bqthw",
            mask_embed,
            mask_features,
            preferred_element_type=jnp.float32,
        )

    def ov_classify(
        self,
        fused: jnp.ndarray,  # (B, 1, Q, C) from embed_pass
        pooled: jnp.ndarray,  # (B, Q, Cm) window-accumulated mask pooling
        text_classifier: jnp.ndarray,
        num_templates,
    ) -> jnp.ndarray:
        """OV video-level classification from window-accumulated pooled CLIP
        features (driver sums mask_window masks>0 against mask features)."""
        from dvis_plus_tpu.models.ov.heads import get_classification_logits

        pooled = self.maskpool_proj(self.maskpool_norm(pooled))  # (B, Q, C)
        cls_emb = self.class_embed_ov(pooled[:, None] + fused)  # (B, 1, Q, Cc)
        return get_classification_logits(
            cls_emb, text_classifier, self.logit_scale, num_templates
        )[:, 0]
