"""Masked-attention transformer decoder (Mask2Former query decoder).

Re-designs the reference decoders:
- layer primitives + 9-layer loop with per-layer prediction heads and
  attn-mask feedback: ``DVIS_Plus/mask2former/modeling/transformer_decoder/
  mask2former_transformer_decoder.py:207-461`` (cross-attn -> self-attn -> FFN,
  post-norm, learnable query feat + query pos embed, level embed, 3 scales
  cycled);
- DVIS per-frame video variants emitting query embeddings:
  ``DVIS_Plus/dvis_Plus/video_mask2former_transformer_decoder.py``
  (``_dvis`` :12, ``_minvis`` :166, ``_dvisPlus`` :175 with ReID MLP head whose
  output is concatenated onto the embeds, doubling the channel dim :351-352).

TPU design: frames ride the batch dim (B*T), all shapes static, attention is
one fused softmax attention per layer with an additive mask derived from the
previous layer's mask prediction (sigmoid < 0.5 -> blocked; all-blocked rows
are un-masked, reference :297). Output layout:

  pred_logits: (BT, Q, K+1)         per-frame class logits
  pred_masks:  (BT, Q, H4, W4)      stride-4 mask logits
  pred_embds:  (BT, Q, C or 2C)     decoder-normed query embeds (+reid concat)
  aux: per-layer (logits, masks) for deep supervision
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.models.segmenter.position_encoding import position_embedding_sine_2d

_NEG_INF = -1e9


class MLP(nn.Module):
    """n-layer MLP with relu (reference mask2former_transformer_decoder.py:192)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.dtype  # AMP: compute follows the caller's cast (params fp32)
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=d, name=f"layer_{i}")(x))
        return nn.Dense(self.output_dim, dtype=d, name=f"layer_{self.num_layers - 1}")(x)


def _attention(
    q: jnp.ndarray,  # (B, Lq, H, Dh)
    k: jnp.ndarray,  # (B, Lk, H, Dh)
    v: jnp.ndarray,  # (B, Lk, H, Dh)
    mask: Optional[jnp.ndarray] = None,  # (B, 1|H, Lq, Lk) additive
) -> jnp.ndarray:
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(dh))
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


class MultiHeadAttention(nn.Module):
    """Torch-style MHA: single in/out projections, merged heads.

    ``impl='flash'`` routes the (unmasked) score/softmax/AV core through the
    blockwise Pallas kernel (`ops/flash_attn.py`) — serving-only opt-in for
    long token sequences (ViT trunk); params are identical either way."""

    dim: int
    num_heads: int
    impl: str = "dense"

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        H = self.num_heads
        Dh = self.dim // H
        d = q.dtype  # AMP: follow the caller's cast; softmax stays fp32
        qp = nn.DenseGeneral((H, Dh), dtype=d, name="q_proj")(q)
        kp = nn.DenseGeneral((H, Dh), dtype=d, name="k_proj")(k)
        vp = nn.DenseGeneral((H, Dh), dtype=d, name="v_proj")(v)
        if self.impl == "flash" and mask is None:
            from dvis_plus_tpu.ops.flash_attn import flash_self_attention

            out = flash_self_attention(qp, kp, vp)
        else:
            out = _attention(qp, kp, vp, mask)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=d, name="out_proj")(out)


class SelfAttentionLayer(nn.Module):
    """Post-norm self-attention over queries (reference :17). Optional
    additive mask (B, 1|H, S, S) blocks attention to padded/dead queries."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        query_pos: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        kv: Optional[jnp.ndarray] = None,
        kv_pos: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``kv`` overrides the keys/values (same params): used by the
        sequence-parallel refiner, whose object self-attention queries a
        local query shard against the all-gathered full set."""
        q = tgt + query_pos
        k = q if kv is None else kv + (kv_pos if kv_pos is not None else 0.0)
        v = tgt if kv is None else kv
        out = MultiHeadAttention(self.dim, self.num_heads, name="attn")(q, k, v, mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype, name="norm")(tgt + out)


class CrossAttentionLayer(nn.Module):
    """Post-norm cross-attention to pixel features (reference :75)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, mask=None):
        out = MultiHeadAttention(self.dim, self.num_heads, name="attn")(
            tgt + query_pos, memory + pos, memory, mask
        )
        return nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype, name="norm")(tgt + out)


class FFNLayer(nn.Module):
    """Post-norm FFN (reference :138)."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, tgt):
        d = tgt.dtype
        out = nn.Dense(self.hidden_dim, dtype=d, name="linear1")(tgt)
        out = nn.Dense(self.dim, dtype=d, name="linear2")(nn.relu(out))
        return nn.LayerNorm(epsilon=1e-5, dtype=d, name="norm")(tgt + out)


class MaskedTransformerDecoder(nn.Module):
    """Per-frame masked-attention decoder with embed outputs (DVIS variants).

    Variant selection (reference registry names):
      - ``reid_branch=False`` -> `_dvis` / `_minvis`
      - ``reid_branch=True``  -> `_dvisPlus` (embeds become 2C via reid concat)
    """

    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    dim_feedforward: int = 2048
    num_layers: int = 9  # DEC_LAYERS - 1
    num_levels: int = 3
    mask_dim: int = 256
    reid_branch: bool = False
    reid_hidden_dim: int = 512
    num_reid_layers: int = 3

    @nn.compact
    def __call__(
        self,
        multi_scale: Sequence[jnp.ndarray],  # 3 x (BT, H_l, W_l, C), stride 32,16,8
        mask_features: jnp.ndarray,  # (BT, H4, W4, mask_dim)
    ) -> Dict[str, jnp.ndarray]:
        assert len(multi_scale) == self.num_levels
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
            srcs.append(
                proj.reshape(BT, Hl * Wl, C) + level_embed[i][None, None].astype(dtype)
            )
            poss.append(
                position_embedding_sine_2d(Hl, Wl, C // 2)
                .reshape(1, Hl * Wl, C)
                .astype(dtype)
            )
            sizes.append((Hl, Wl))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=dtype, name="class_embed")
        mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")

        def prediction_heads(output, attn_size):
            x = decoder_norm(output)
            logits = class_embed(x)
            memb = mask_embed(x)
            masks = jnp.einsum(
                "bqc,bhwc->bqhw", memb, mask_features, preferred_element_type=jnp.float32
            )
            # attn mask for next layer: bilinear resize + sigmoid threshold.
            # antialias=False matches F.interpolate(align_corners=False)
            # exactly — jax's default antialias=True low-passes downsampled
            # mask logits and flips threshold decisions near 0.5
            am = jax.image.resize(
                masks, (BT, self.num_queries) + attn_size, method="bilinear", antialias=False
            )
            am = jax.nn.sigmoid(am.reshape(BT, self.num_queries, -1)) < 0.5  # True = block
            # un-block rows that block everything (reference :297)
            all_blocked = jnp.all(am, axis=-1, keepdims=True)
            am = jnp.where(all_blocked, False, am)
            additive = jnp.where(am, _NEG_INF, 0.0)[:, None]  # (BT, 1, Q, HW)
            return logits, masks, jax.lax.stop_gradient(additive)

        output = jnp.broadcast_to(query_feat[None], (BT, self.num_queries, C)).astype(dtype)
        qpos = jnp.broadcast_to(query_embed[None], (BT, self.num_queries, C)).astype(dtype)

        logits0, masks0, attn_mask = prediction_heads(output, sizes[0])
        pred_logits = [logits0]
        pred_masks = [masks0]

        for i in range(self.num_layers):
            li = i % self.num_levels
            output = CrossAttentionLayer(C, self.num_heads, name=f"cross_{i}")(
                output, srcs[li], poss[li], qpos, attn_mask
            )
            output = SelfAttentionLayer(C, self.num_heads, name=f"self_{i}")(output, qpos)
            output = FFNLayer(C, self.dim_feedforward, name=f"ffn_{i}")(output)
            logits_i, masks_i, attn_mask = prediction_heads(
                output, sizes[(i + 1) % self.num_levels]
            )
            pred_logits.append(logits_i)
            pred_masks.append(masks_i)

        embds = decoder_norm(output)  # (BT, Q, C)
        out = {
            "pred_logits": pred_logits[-1],
            "pred_masks": pred_masks[-1],
            "aux_pred_logits": pred_logits[:-1],
            "aux_pred_masks": pred_masks[:-1],
            "pred_embds_without_norm": output,
            "pred_embds": embds,
            "mask_features": mask_features,
            "query_feat": query_feat,  # learned query init (DAQ slot matching)
        }
        if self.reid_branch:
            reid = MLP(
                self.reid_hidden_dim, C, num_layers=self.num_reid_layers, name="reid_embed"
            )(embds)
            out["pred_reid_embed"] = reid
            out["pred_embds"] = jnp.concatenate([embds, reid], axis=-1)
            out["pred_embds_without_norm"] = jnp.concatenate([output, reid], axis=-1)
        return out
