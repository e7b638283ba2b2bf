"""CLIP backbone for open-vocabulary segmentation (ConvNeXt visual + text
tower), NHWC flax.

Re-designs reference ``DVIS_Plus/ov_dvis/backbones/clip.py:26-233`` (open_clip
ConvNeXt-L / RN50 wrapped as a d2 Backbone):

- ``extract_features_convnext`` (:117-145): ConvNeXt trunk stem + 4 stages ->
  {res2..res5} + ``clip_vis_dense`` (the final stage output, pre-head);
- ``visual_prediction_forward_convnext`` (:147-166): mask-pooled dense
  features -> trunk head norm -> projection MLP -> CLIP embedding space;
- text encoder (:88-100): CLIP text transformer (token embed + causal
  transformer + ln_final + text projection), ``encode_text`` with argmax-EOT
  pooling; the per-dataset prompt-engineered classifier caching lives in
  :mod:`dvis_plus_tpu.models.ov.text`.

Weights come from open_clip checkpoints via
:func:`convert_open_clip_convnext` (host-side numpy). The backbone is frozen
(optimizer-masked) exactly like the reference (:33 freeze_everything).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.dtype  # AMP follows the caller's cast (params fp32)
        y = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
            dtype=d, name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=d, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=d, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=d, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        return x + y * gamma.astype(d)


class ConvNeXt(nn.Module):
    """ConvNeXt trunk emitting the feature pyramid + dense CLIP features."""

    depths: Sequence[int] = (3, 3, 27, 3)  # ConvNeXt-L
    dims: Sequence[int] = (192, 384, 768, 1536)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        outs: Dict[str, jnp.ndarray] = {}
        d = x.dtype
        y = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=d, name="stem_conv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=d, name="stem_norm")(y)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                y = nn.LayerNorm(epsilon=1e-6, dtype=d, name=f"downsample_norm{s}")(y)
                y = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=d, name=f"downsample_conv{s}")(y)
            for b in range(depth):
                y = ConvNeXtBlock(dim, name=f"stage{s}_block{b}")(y)
            outs[f"res{s + 2}"] = y
        outs["clip_vis_dense"] = y
        return outs


class CLIPVisualHead(nn.Module):
    """trunk.head norm + projection MLP -> CLIP space (clip.py:147-166)."""

    embed_dim: int = 768
    hidden_dim: int = 1536

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """(..., C_trunk) mask-pooled features -> (..., embed_dim)."""
        d = pooled.dtype  # AMP follows the caller's cast (params fp32)
        y = nn.LayerNorm(epsilon=1e-6, dtype=d, name="head_norm")(pooled)
        # open_clip convnext_*_d head: mlp proj (fc1 -> gelu -> fc2)
        y = nn.Dense(self.hidden_dim, dtype=d, name="proj_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.embed_dim, dtype=d, name="proj_fc2")(y)
        return y


class CLIPTextEncoder(nn.Module):
    """CLIP text tower: token embed + causal transformer + ln_final + proj."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    heads: int = 12
    layers: int = 16
    embed_dim: int = 768

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens (B, L) int32 -> (B, embed_dim) text embeddings."""
        B, L = tokens.shape
        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok + pos[None, :L]
        causal = jnp.tril(jnp.ones((L, L), bool))
        mask = jnp.where(causal, 0.0, -1e9)[None, None]
        from dvis_plus_tpu.models.segmenter.transformer_decoder import MultiHeadAttention

        for i in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_1_{i}")(x)
            h = MultiHeadAttention(self.width, self.heads, name=f"attn_{i}")(h, h, h, mask)
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_2_{i}")(x)
            h = nn.Dense(4 * self.width, name=f"mlp_fc_{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.width, name=f"mlp_proj_{i}")(h)
            x = x + h
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # EOT pooling: the highest token id is the end-of-text marker
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj


class CLIPBackbone(nn.Module):
    """Frozen CLIP visual trunk as a d2-style backbone + OV heads."""

    embed_dim: int = 768
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (192, 384, 768, 1536)

    def setup(self):
        self.trunk = ConvNeXt(tuple(self.depths), tuple(self.dims))
        self.visual_head = CLIPVisualHead(self.embed_dim, self.dims[-1])
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(float(np.log(1 / 0.07))), ()
        )

    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.trunk(images)

    def visual_prediction(self, pooled: jnp.ndarray) -> jnp.ndarray:
        return self.visual_head(pooled)


def convert_open_clip_convnext(state_dict: Dict[str, np.ndarray], depths=(3, 3, 27, 3)) -> Dict:
    """open_clip ConvNeXt visual trunk state_dict -> flax ConvNeXt params.

    Keys follow ``visual.trunk.*`` (timm convnext): stem.0/1, stages.N.blocks.M
    .{conv_dw, norm, mlp.fc1, mlp.fc2, gamma}, stages.N.downsample.0/1."""

    def conv(w):
        return np.transpose(w, (2, 3, 1, 0))

    def dwconv(w):
        # torch depthwise (C, 1, kh, kw) -> flax HWIO with groups=C: (kh, kw, 1, C)
        return np.transpose(w, (2, 3, 1, 0))

    p: Dict[str, Any] = {}
    g = lambda k: state_dict[f"visual.trunk.{k}"]
    p["stem_conv"] = {"kernel": conv(g("stem.0.weight")), "bias": g("stem.0.bias")}
    p["stem_norm"] = {"scale": g("stem.1.weight"), "bias": g("stem.1.bias")}
    for s, depth in enumerate(depths):
        if s > 0:
            p[f"downsample_norm{s}"] = {
                "scale": g(f"stages.{s}.downsample.0.weight"),
                "bias": g(f"stages.{s}.downsample.0.bias"),
            }
            p[f"downsample_conv{s}"] = {
                "kernel": conv(g(f"stages.{s}.downsample.1.weight")),
                "bias": g(f"stages.{s}.downsample.1.bias"),
            }
        for b in range(depth):
            pre = f"stages.{s}.blocks.{b}"
            p[f"stage{s}_block{b}"] = {
                "dwconv": {
                    "kernel": dwconv(g(f"{pre}.conv_dw.weight")),
                    "bias": g(f"{pre}.conv_dw.bias"),
                },
                "norm": {"scale": g(f"{pre}.norm.weight"), "bias": g(f"{pre}.norm.bias")},
                "pwconv1": {
                    "kernel": g(f"{pre}.mlp.fc1.weight").T,
                    "bias": g(f"{pre}.mlp.fc1.bias"),
                },
                "pwconv2": {
                    "kernel": g(f"{pre}.mlp.fc2.weight").T,
                    "bias": g(f"{pre}.mlp.fc2.bias"),
                },
                "gamma": g(f"{pre}.gamma"),
            }
    return p


def convert_open_clip_text(state_dict: Dict[str, np.ndarray], layers: int = 16,
                           heads: int = 12) -> Dict:
    """open_clip text-tower state_dict -> flax :class:`CLIPTextEncoder` params.

    Handles both naming layouts: plain CLIP (``token_embedding.weight``,
    ``transformer.resblocks.N.*``, ``ln_final``, ``text_projection``) and
    CustomTextCLIP's ``text.``-prefixed variant (the convnext_large_d_320
    checkpoints the reference loads, ov_dvis/backbones/clip.py:88-100)."""

    def g(k):
        if k in state_dict:
            return np.asarray(state_dict[k])
        return np.asarray(state_dict[f"text.{k}"])

    width = g("positional_embedding").shape[1]
    dh = width // heads

    p: Dict[str, Any] = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        in_w = g(f"{pre}.attn.in_proj_weight")  # (3W, W) rows [q; k; v]
        in_b = g(f"{pre}.attn.in_proj_bias")
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        out_w = g(f"{pre}.attn.out_proj.weight")  # (W, W)
        p[f"ln_1_{i}"] = {"scale": g(f"{pre}.ln_1.weight"), "bias": g(f"{pre}.ln_1.bias")}
        p[f"attn_{i}"] = {
            "q_proj": {"kernel": qw.T.reshape(width, heads, dh), "bias": qb.reshape(heads, dh)},
            "k_proj": {"kernel": kw.T.reshape(width, heads, dh), "bias": kb.reshape(heads, dh)},
            "v_proj": {"kernel": vw.T.reshape(width, heads, dh), "bias": vb.reshape(heads, dh)},
            "out_proj": {
                "kernel": out_w.T.reshape(heads, dh, width),
                "bias": g(f"{pre}.attn.out_proj.bias"),
            },
        }
        p[f"ln_2_{i}"] = {"scale": g(f"{pre}.ln_2.weight"), "bias": g(f"{pre}.ln_2.bias")}
        p[f"mlp_fc_{i}"] = {
            "kernel": g(f"{pre}.mlp.c_fc.weight").T,
            "bias": g(f"{pre}.mlp.c_fc.bias"),
        }
        p[f"mlp_proj_{i}"] = {
            "kernel": g(f"{pre}.mlp.c_proj.weight").T,
            "bias": g(f"{pre}.mlp.c_proj.bias"),
        }
    return p
