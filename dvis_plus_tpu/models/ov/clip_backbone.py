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


class _FrozenBN(nn.Module):
    """Frozen-statistics BatchNorm == per-channel affine (the CLIP backbone
    is frozen, reference clip.py:33 freeze_everything, so torch BN always
    runs in eval mode with running stats). Param names mirror the torch
    buffers for 1:1 checkpoint ports."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mul = (scale * (var + self.eps) ** -0.5).astype(x.dtype)
        add = (bias - mean * scale * (var + self.eps) ** -0.5).astype(x.dtype)
        return x * mul + add


class CLIPBottleneck(nn.Module):
    """CLIP's anti-aliased ResNet bottleneck (expansion 4): every conv is
    stride 1; spatial reduction is an avg-pool after conv2 (and before the
    1x1 on the shortcut) — the 'blurpool' trick from the CLIP paper."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.dtype
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        y = nn.relu(_FrozenBN(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=d, name="conv2")(y)
        y = nn.relu(_FrozenBN(self.planes, name="bn2")(y))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride, self.stride), (self.stride, self.stride))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=d, name="conv3")(y)
        y = _FrozenBN(out_ch, name="bn3")(y)
        if self.stride > 1 or x.shape[-1] != out_ch:
            s = x
            if self.stride > 1:
                s = nn.avg_pool(s, (self.stride, self.stride), (self.stride, self.stride))
            s = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=d, name="downsample_conv")(s)
            s = _FrozenBN(out_ch, name="downsample_bn")(s)
        else:
            s = x
        return nn.relu(y + s)


class ModifiedResNet(nn.Module):
    """CLIP's ModifiedResNet visual trunk (RN50: layers (3,4,6,3), width 64)
    emitting the same pyramid the reference's ``extract_features_resnet``
    taps (ov_dvis/backbones/clip.py:131-148): 3-conv stem (os2) -> avgpool ->
    res2 (os4, 256ch) .. res5 (os32, 2048ch); ``clip_vis_dense`` = res5."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        d = x.dtype
        w = self.width
        y = nn.Conv(w // 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=d, name="conv1")(x)
        y = nn.relu(_FrozenBN(w // 2, name="bn1")(y))
        y = nn.Conv(w // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=d, name="conv2")(y)
        y = nn.relu(_FrozenBN(w // 2, name="bn2")(y))
        y = nn.Conv(w, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=d, name="conv3")(y)
        y = nn.relu(_FrozenBN(w, name="bn3")(y))
        y = nn.avg_pool(y, (2, 2), (2, 2))
        outs: Dict[str, jnp.ndarray] = {}
        planes = w
        for s, depth in enumerate(self.layers):
            stride = 1 if s == 0 else 2
            for b in range(depth):
                y = CLIPBottleneck(
                    planes, stride if b == 0 else 1, name=f"layer{s + 1}_{b}"
                )(y)
            outs[f"res{s + 2}"] = y
            planes *= 2
        outs["clip_vis_dense"] = y
        return outs


class CLIPAttentionPool(nn.Module):
    """CLIP AttentionPool2d run in the reference's MASKED form
    (``visual_prediction_forward_resnet``, ov_dvis/backbones/clip.py:158-202):
    keys = dense tokens + bilinearly resized positional embedding, one query
    per mask = mean token + pos[0], attention restricted to each mask's
    pixels. Returns (B, N, output_dim) CLIP-space embeddings."""

    embed_dim: int  # trunk channels (RN50: 2048)
    output_dim: int  # CLIP space (RN50: 1024)
    spacial_dim: int = 7  # input_resolution // 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        """x (B, H, W, C) dense trunk features; masks (B, N, Hm, Wm) logits."""
        B, H, W, C = x.shape
        heads = C // 64
        dh = 64
        d = x.dtype
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.spacial_dim * self.spacial_dim + 1, self.embed_dim),
        ).astype(d)
        # spatial rows resized to the feature map (torch F.interpolate
        # bilinear align_corners=False == jax half-pixel 'linear')
        spatial = pos[1:].reshape(self.spacial_dim, self.spacial_dim, C)
        spatial = jax.image.resize(spatial, (H, W, C), method="linear")
        tokens = x.reshape(B, H * W, C)
        key_value = tokens + spatial.reshape(1, H * W, C)
        query = tokens.mean(axis=1) + pos[0]  # (B, C)

        if masks.shape[-2:] != (H, W):
            masks = jax.image.resize(
                masks, masks.shape[:-2] + (H, W), method="bilinear", antialias=False
            )
        allow = (masks > 0.0).reshape(B, -1, H * W)  # (B, N, HW)
        # reference semantics: keys outside the mask get -inf. An all-masked
        # row would softmax to NaN in torch too; we instead let EMPTY masks
        # attend everywhere (same spirit as mask_pooling's +1e-8 guard)
        empty = ~jnp.any(allow, axis=-1, keepdims=True)
        bias = jnp.where(allow | empty, 0.0, -1e9).astype(jnp.float32)

        q = nn.DenseGeneral((heads, dh), axis=-1, dtype=d, name="q_proj")(query)
        k = nn.DenseGeneral((heads, dh), axis=-1, dtype=d, name="k_proj")(key_value)
        v = nn.DenseGeneral((heads, dh), axis=-1, dtype=d, name="v_proj")(key_value)
        # (B, heads, N, HW): every mask shares the same query vector but owns
        # its attention row
        att = jnp.einsum("bhd,bshd->bhs", q, k).astype(jnp.float32) / np.sqrt(dh)
        att = att[:, :, None, :] + bias[:, None, :, :]
        att = jax.nn.softmax(att, axis=-1).astype(d)
        pooled = jnp.einsum("bhns,bshd->bnhd", att, v)
        return nn.DenseGeneral(
            self.output_dim, axis=(-2, -1), dtype=d, name="c_proj"
        )(pooled)


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
    """Frozen CLIP visual trunk as a d2-style backbone + OV heads.

    ``model_type`` selects the trunk family exactly like the reference's
    ``extract_features``/``visual_prediction_forward`` dispatch
    (ov_dvis/backbones/clip.py:107-117): 'convnext' = ConvNeXt trunk +
    mask-pooled MLP head; 'resnet' = CLIP ModifiedResNet trunk + masked
    attention pooling (RN50: embed_dim 1024)."""

    embed_dim: int = 768
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (192, 384, 768, 1536)
    model_type: str = "convnext"
    resnet_width: int = 64
    attnpool_spacial: int = 7  # input_resolution // 32 (RN50: 224 // 32)

    def setup(self):
        if self.model_type == "resnet":
            self.trunk = ModifiedResNet(tuple(self.depths), self.resnet_width)
            self.attnpool = CLIPAttentionPool(
                embed_dim=self.resnet_width * 32,
                output_dim=self.embed_dim,
                spacial_dim=self.attnpool_spacial,
            )
        else:
            self.trunk = ConvNeXt(tuple(self.depths), tuple(self.dims))
            self.visual_head = CLIPVisualHead(self.embed_dim, self.dims[-1])
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(float(np.log(1 / 0.07))), ()
        )

    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.trunk(images)

    def visual_prediction(self, pooled: jnp.ndarray) -> jnp.ndarray:
        return self.visual_head(pooled)

    def masked_attention_pool(self, dense: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        """RN out-of-vocab head (visual_prediction_forward_resnet)."""
        return self.attnpool(dense, masks)


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


def convert_open_clip_resnet(state_dict: Dict[str, np.ndarray],
                             layers=(3, 4, 6, 3)) -> Dict:
    """open_clip/CLIP ModifiedResNet visual trunk state_dict -> flax
    :class:`ModifiedResNet` params. Keys follow ``visual.conv1..bn3``,
    ``visual.layerL.B.{conv1..3,bn1..3,downsample.0/1}`` (downsample.0 is the
    1x1 conv AFTER the avg-pool, downsample.1 its BN)."""

    def conv(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    def bn(prefix):
        return {
            "scale": np.asarray(g(f"{prefix}.weight")),
            "bias": np.asarray(g(f"{prefix}.bias")),
            "mean": np.asarray(g(f"{prefix}.running_mean")),
            "var": np.asarray(g(f"{prefix}.running_var")),
        }

    g = lambda k: state_dict[f"visual.{k}"]
    p: Dict[str, Any] = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = {"kernel": conv(g(f"conv{i}.weight"))}
        p[f"bn{i}"] = bn(f"bn{i}")
    for s, depth in enumerate(layers):
        for b in range(depth):
            pre = f"layer{s + 1}.{b}"
            blk: Dict[str, Any] = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = {"kernel": conv(g(f"{pre}.conv{i}.weight"))}
                blk[f"bn{i}"] = bn(f"{pre}.bn{i}")
            if f"visual.{pre}.downsample.0.weight" in state_dict:
                blk["downsample_conv"] = {
                    "kernel": conv(g(f"{pre}.downsample.0.weight"))
                }
                blk["downsample_bn"] = bn(f"{pre}.downsample.1")
            p[f"layer{s + 1}_{b}"] = blk
    return p


def convert_clip_attnpool(state_dict: Dict[str, np.ndarray]) -> Dict:
    """CLIP AttentionPool2d (``visual.attnpool.*``) -> flax
    :class:`CLIPAttentionPool` params (q/k/v split per head)."""
    g = lambda k: np.asarray(state_dict[f"visual.attnpool.{k}"])
    C = g("positional_embedding").shape[1]
    heads, dh = C // 64, 64
    out: Dict[str, Any] = {"positional_embedding": g("positional_embedding")}
    for name in ("q_proj", "k_proj", "v_proj"):
        out[name] = {
            "kernel": g(f"{name}.weight").T.reshape(C, heads, dh),
            "bias": g(f"{name}.bias").reshape(heads, dh),
        }
    cw = g("c_proj.weight")  # (out, C)
    out["c_proj"] = {
        "kernel": cw.T.reshape(heads, dh, cw.shape[0]),
        "bias": g("c_proj.bias"),
    }
    return out


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
