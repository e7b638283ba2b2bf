"""ViT-Adapter (DINOv2) backbone: frozen ViT-L + trainable spatial adapter.

Re-designs reference ``DVIS_Plus/mask2former/modeling/backbones_vitAdapter/``:

- DINOv2 ViT (``backbones.py:36`` DinoVisionTransformer): patch embed + cls
  token + interpolated pos embed + pre-norm blocks with LayerScale;
- ``SpatialPriorModule`` (adapter.py:304): conv stem emitting c1..c4 at
  strides 4/8/16/32, projected to the ViT width;
- ``Extractor`` (adapter.py:100): multi-scale deformable cross-attention from
  the spatial tokens (query) into the ViT token grid + depthwise ConvFFN —
  the shipped config uses the *Efficient* interaction blocks
  (``InteractionBlockWithCls_Efficient`` adapter.py:260, selected at :451)
  which drop the Injector, so interactions are extractor-only; the Injector
  (adapter.py:138) is still provided behind ``use_injector``;
- final pyramid: c1..c4 (+ upsampled ViT features when ``add_vit_feature``)
  through per-level norms -> {res2..res5} (adapter.py:560-585).

TPU notes: grid alignment — the adapter assumes the ViT token grid equals the
stride-16 grid; we build the ViT with patch 16 (DINOv2/14 weights port by
bicubic patch-kernel interpolation, standard practice) so every reshape is a
static transpose. Deformable attention reuses the shared
:mod:`dvis_plus_tpu.ops.msdeform` op. The reference's SyncBatchNorm output
norms become frozen-stat affines (FrozenBN) — identical at eval.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _torch_bicubic_matrix(out_size: int, grid: int) -> np.ndarray:
    """Interpolation matrix matching ``F.interpolate(mode='bicubic',
    align_corners=False, scale_factor=(out+0.1)/grid)`` — DINOv2's pos-embed
    resampling (reference backbones.py:179-203, incl. the +0.1 fudge). Torch's
    cubic kernel uses A=-0.75; ``jax.image.resize`` uses the Keys A=-0.5
    kernel, a real numeric difference, so the resample is expressed as a
    host-precomputed (out, grid) matrix instead (also the faster XLA form:
    one matmul per axis, no gathers)."""
    A = -0.75
    scale_factor = (out_size + 0.1) / grid

    def k1(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    M = np.zeros((out_size, grid), np.float64)
    for i in range(out_size):
        src = (i + 0.5) / scale_factor - 0.5
        f = math.floor(src)
        t = src - f
        for k, w in enumerate((k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t))):
            g = min(max(f - 1 + k, 0), grid - 1)  # border replication
            M[i, g] += w
    return M.astype(np.float32)

from dvis_plus_tpu.core.config import BackboneConfig
from dvis_plus_tpu.models.backbones.resnet import FrozenBN
from dvis_plus_tpu.models.segmenter.pixel_decoder import _offset_grid_bias_init, _reference_points
from dvis_plus_tpu.ops.msdeform import ms_deform_attn


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        return x * gamma.astype(x.dtype)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_impl: str = "dense"  # 'flash' = blockwise Pallas kernel (serving)

    @nn.compact
    def __call__(self, x):
        from dvis_plus_tpu.models.segmenter.transformer_decoder import MultiHeadAttention

        d = x.dtype  # AMP follows the caller's cast (params fp32)
        h = nn.LayerNorm(dtype=d, name="norm1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, impl=self.attn_impl, name="attn"
        )(h, h, h)
        x = x + LayerScale(self.dim, name="ls1")(h)
        h = nn.LayerNorm(dtype=d, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=d, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=d, name="mlp_fc2")(h)
        return x + LayerScale(self.dim, name="ls2")(h)


class DinoViT(nn.Module):
    """DINOv2-style ViT trunk on a stride-16 grid."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    pretrain_grid: int = 37  # 518 / 14 pretraining grid for pos interpolation
    attn_impl: str = "dense"  # 'flash' = blockwise Pallas kernel (serving)
    dtype: object = None  # compute dtype (params fp32)

    def setup(self):
        self.patch_embed = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pretrain_grid * self.pretrain_grid + 1, self.embed_dim),
        )
        self.blocks = [
            ViTBlock(
                self.embed_dim, self.num_heads,
                attn_impl=self.attn_impl, name=f"block{i}",
            )
            for i in range(self.depth)
        ]

    def prepare_tokens(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, int, int]:
        """(B, H, W, 3) -> (patch tokens (B, HW, C), cls (B, 1, C), Hp, Wp)."""
        y = self.patch_embed(x)
        B, Hp, Wp, C = y.shape
        tokens = y.reshape(B, Hp * Wp, C)
        # interpolate the pretraining pos grid to (Hp, Wp) with torch-exact
        # bicubic (reference interpolate_pos_encoding, backbones.py:179-203)
        G = self.pretrain_grid
        pe = self.pos_embed[:, 1:].reshape(G, G, C).astype(jnp.float32)
        if (Hp, Wp) != (G, G):
            Mh = jnp.asarray(_torch_bicubic_matrix(Hp, G))
            Mw = jnp.asarray(_torch_bicubic_matrix(Wp, G))
            pe = jnp.einsum("hg,gvc->hvc", Mh, pe)
            pe = jnp.einsum("wv,hvc->hwc", Mw, pe)
        pe = pe.reshape(1, Hp * Wp, C)
        tokens = tokens + pe.astype(tokens.dtype)
        cls = jnp.broadcast_to(
            self.cls_token + self.pos_embed[:, :1], (B, 1, C)
        ).astype(tokens.dtype)
        return tokens, cls, Hp, Wp

    def run_blocks(self, x, cls, start: int, end: int):
        y = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks[start:end]:
            y = blk(y)
        return y[:, 1:], y[:, :1]


class SpatialPriorModule(nn.Module):
    """Conv stem -> c1..c4 at strides 4/8/16/32 in ViT width (adapter.py:304)."""

    inplanes: int = 64
    embed_dim: int = 1024

    @nn.compact
    def __call__(self, x):
        def conv_bn_relu(y, ch, stride, name):
            y = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=x.dtype, name=f"{name}_conv")(y)
            y = FrozenBN(ch, name=f"{name}_bn")(y)
            return nn.relu(y)

        y = conv_bn_relu(x, self.inplanes, 2, "stem1")
        y = conv_bn_relu(y, self.inplanes, 1, "stem2")
        y = conv_bn_relu(y, self.inplanes, 1, "stem3")
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])  # s4
        c1 = y
        c2 = conv_bn_relu(c1, 2 * self.inplanes, 2, "conv2")  # s8
        c3 = conv_bn_relu(c2, 4 * self.inplanes, 2, "conv3")  # s16
        c4 = conv_bn_relu(c3, 4 * self.inplanes, 2, "conv4")  # s32
        proj = lambda t, n: nn.Conv(self.embed_dim, (1, 1), dtype=x.dtype, name=n)(t)
        return proj(c1, "fc1"), proj(c2, "fc2"), proj(c3, "fc3"), proj(c4, "fc4")


class DeformAttnModule(nn.Module):
    """MSDeformAttn module used by the adapter (query -> multi-level feats)."""

    dim: int
    num_heads: int = 16
    n_points: int = 4
    n_levels: int = 1
    # accepted for config parity with the adapter's deform_ratio arg, but a
    # deliberate NO-OP on shapes: the reference's MSDeformAttn takes `ratio`
    # and ignores it — value_proj is Linear(d_model, d_model) unconditionally
    # (pixel_decoder/ops/modules/ms_deform_attn.py:35,61) — so zoo ViT-L
    # checkpoints carry full-width value projections despite deform_ratio=0.5
    # in the adapter config (adapter.py:384). Verified by
    # test_backbone_reference_parity.py.
    ratio: float = 1.0

    @nn.compact
    def __call__(self, query, reference_points, feat, spatial_shapes):
        B, Lq, C = query.shape
        H = self.num_heads
        value = nn.Dense(C, dtype=query.dtype, name="value_proj")(feat)
        value = value.reshape(B, feat.shape[1], H, C // H)
        offsets = nn.Dense(
            H * self.n_levels * self.n_points * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_grid_bias_init(H, self.n_levels, self.n_points),
            dtype=query.dtype,
            name="sampling_offsets",
        )(query).reshape(B, Lq, H, self.n_levels, self.n_points, 2)
        attn = nn.Dense(
            H * self.n_levels * self.n_points,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=query.dtype,
            name="attention_weights",
        )(query).reshape(B, Lq, H, self.n_levels * self.n_points)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Lq, H, self.n_levels, self.n_points)
        normalizer = jnp.asarray([[w, h] for (h, w) in spatial_shapes], jnp.float32)
        loc = (
            reference_points[None, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = ms_deform_attn(value, spatial_shapes, loc, attn)
        return nn.Dense(C, dtype=query.dtype, name="output_proj")(out.astype(query.dtype))


class ConvFFN(nn.Module):
    """FFN with a depthwise 3x3 on the multi-scale token layout (adapter.py)."""

    dim: int
    hidden: int
    shapes: Tuple[Tuple[int, int], ...]  # (c2, c3, c4) grids

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        d = x.dtype
        y = nn.Dense(self.hidden, dtype=d, name="fc1")(x)
        # ONE depthwise conv shared across all level grids (reference DWConv
        # holds a single nn.Conv2d applied to x1/x2/x3, adapter.py:83-99)
        dw = nn.Conv(
            self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
            feature_group_count=self.hidden, dtype=d, name="dwconv",
        )
        parts = []
        start = 0
        for (h, w) in self.shapes:
            seg = y[:, start : start + h * w].reshape(B, h, w, self.hidden)
            parts.append(dw(seg).reshape(B, h * w, self.hidden))
            start += h * w
        y = jnp.concatenate(parts, axis=1)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=d, name="fc2")(y)


class Extractor(nn.Module):
    dim: int
    num_heads: int
    n_points: int = 4
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    deform_ratio: float = 1.0  # value-proj width ratio (reference vitl: 0.5)
    shapes: Tuple[Tuple[int, int], ...] = ()
    # serving-only deviation (backbone.vit_extractor_coarse): compute the
    # deformable-attention residual for the stride-8 level on a 2x-coarser
    # query grid (2x2-mean-pooled queries, coarse-grid reference points) and
    # bilinearly upsample the residual before the add. The stride-8 queries
    # are 76% of the extractor's gather rows, which sit on the measured
    # ~9 ns/row descriptor floor (NOTES perf backlog #0) — this trades a
    # smooth-residual approximation for ~57% fewer rows. Parity default OFF;
    # AP impact measured by tools/serving_deviation_ap.py (measure_vit).
    coarse_s8: bool = False

    @nn.compact
    def __call__(self, query, reference_points, feat, feat_shape):
        attn_mod = DeformAttnModule(
            self.dim, self.num_heads, self.n_points, n_levels=1,
            ratio=self.deform_ratio, name="attn"
        )
        qn = nn.LayerNorm(dtype=query.dtype, name="query_norm")(query)
        fn = nn.LayerNorm(dtype=feat.dtype, name="feat_norm")(feat)
        if not self.coarse_s8:
            attn = attn_mod(qn, reference_points, fn, [feat_shape])
        else:
            B, _, C = query.shape
            (h2, w2) = self.shapes[0]
            n2 = h2 * w2
            hc, wc = h2 // 2, w2 // 2
            q2 = qn[:, :n2].reshape(B, hc, 2, wc, 2, C).mean(axis=(2, 4))
            q_coarse = jnp.concatenate(
                [q2.reshape(B, hc * wc, C), qn[:, n2:]], axis=1
            )
            refs2 = _reference_points([(hc, wc)])  # coarse-grid centers [0,1]
            refs_coarse = jnp.concatenate(
                [refs2, reference_points[n2:]], axis=0
            )
            attn_c = attn_mod(q_coarse, refs_coarse, fn, [feat_shape])
            a2 = attn_c[:, : hc * wc].reshape(B, hc, wc, C)
            a2 = jax.image.resize(
                a2, (B, h2, w2, C), "bilinear", antialias=False
            ).reshape(B, n2, C)
            attn = jnp.concatenate([a2, attn_c[:, hc * wc :]], axis=1)
        query = query + attn
        if self.with_cffn:
            h = nn.LayerNorm(dtype=query.dtype, name="ffn_norm")(query)
            query = query + ConvFFN(
                self.dim, int(self.dim * self.cffn_ratio), self.shapes, name="ffn"
            )(h)
        return query


class Injector(nn.Module):
    dim: int
    num_heads: int
    n_points: int = 4
    deform_ratio: float = 1.0

    @nn.compact
    def __call__(self, query, reference_points, feat, shapes):
        attn = DeformAttnModule(
            self.dim, self.num_heads, self.n_points, n_levels=len(shapes),
            ratio=self.deform_ratio, name="attn"
        )(
            nn.LayerNorm(dtype=query.dtype, name="query_norm")(query),
            reference_points,
            nn.LayerNorm(dtype=feat.dtype, name="feat_norm")(feat),
            shapes,
        )
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        return query + gamma.astype(query.dtype) * attn.astype(query.dtype)


class ViTAdapter(nn.Module):
    """Frozen DINOv2 ViT + adapter -> {res2..res5} in ViT width."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    conv_inplane: int = 64
    deform_num_heads: int = 16
    n_points: int = 4
    interaction_indexes: Tuple[Tuple[int, int], ...] = ((0, 5), (6, 11), (12, 17), (18, 23))
    # reference vitl/vitb adapter args (adapter.py:368-405): ConvFFN on, value
    # projections at half width
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    deform_ratio: float = 0.5
    add_vit_feature: bool = True
    use_injector: bool = False  # shipped config uses the Efficient (no-inject) blocks
    extractor_coarse_s8: bool = False  # serving-only (see Extractor.coarse_s8)
    pretrain_grid: int = 37  # DINOv2 518/14 pos-embed grid
    attn_impl: str = "dense"  # trunk attention: 'dense' | 'flash' (serving)
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    dtype: object = None  # compute dtype (params fp32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B, H0, W0, _ = x.shape
        vit = DinoViT(
            self.embed_dim, self.depth, self.num_heads, self.patch_size,
            pretrain_grid=self.pretrain_grid, attn_impl=self.attn_impl,
            dtype=self.dtype, name="vit"
        )
        tokens, cls, Hp, Wp = vit.prepare_tokens(x)
        # frozen trunk (reference freeze_backbone; optimizer-masked too)
        tokens = jax.lax.stop_gradient(tokens)
        cls = jax.lax.stop_gradient(cls)

        c1, c2m, c3m, c4m = SpatialPriorModule(
            self.conv_inplane, self.embed_dim, name="spm"
        )(x)
        # align SPM grids to the ViT grid
        shapes = ((2 * Hp, 2 * Wp), (Hp, Wp), (Hp // 2, Wp // 2))
        c2 = jax.image.resize(c2m, (B,) + shapes[0] + (self.embed_dim,), "bilinear", antialias=False)
        c3 = jax.image.resize(c3m, (B,) + shapes[1] + (self.embed_dim,), "bilinear", antialias=False)
        c4 = jax.image.resize(c4m, (B,) + shapes[2] + (self.embed_dim,), "bilinear", antialias=False)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.embed_dim)
        )
        flat = lambda t: t.reshape(B, -1, self.embed_dim)
        le = level_embed.astype(c2.dtype)
        c = jnp.concatenate(
            [flat(c2) + le[0], flat(c3) + le[1], flat(c4) + le[2]], axis=1
        )

        refs_c = _reference_points(shapes)  # queries = spatial tokens, 3 levels
        refs_c1 = refs_c[:, 1:2]  # into the single ViT-grid level
        refs_x = _reference_points([(Hp, Wp)])  # ViT tokens as queries

        outs = []
        n_inter = len(self.interaction_indexes)
        for i, (s, e) in enumerate(self.interaction_indexes):
            if self.use_injector:
                tokens = Injector(
                    self.embed_dim, self.deform_num_heads, self.n_points,
                    deform_ratio=self.deform_ratio, name=f"injector_{i}",
                )(tokens, jnp.broadcast_to(refs_x, (refs_x.shape[0], 3, 2)), c, shapes)
            tokens, cls = vit.run_blocks(tokens, cls, s, e + 1)
            c = Extractor(
                self.embed_dim, self.deform_num_heads, self.n_points,
                with_cffn=self.with_cffn, cffn_ratio=self.cffn_ratio,
                deform_ratio=self.deform_ratio, shapes=shapes,
                coarse_s8=self.extractor_coarse_s8,
                name=f"extractor_{i}",
            )(c, refs_c1, tokens, (Hp, Wp))
            if i == n_inter - 1:
                for j in range(2):  # extra extractors on the last interaction
                    c = Extractor(
                        self.embed_dim, self.deform_num_heads, self.n_points,
                        with_cffn=self.with_cffn, cffn_ratio=self.cffn_ratio,
                        deform_ratio=self.deform_ratio, shapes=shapes,
                        coarse_s8=self.extractor_coarse_s8,
                        name=f"extra_extractor_{j}",
                    )(c, refs_c1, tokens, (Hp, Wp))
            outs.append(tokens.reshape(B, Hp, Wp, self.embed_dim))

        n2 = shapes[0][0] * shapes[0][1]
        n3 = shapes[1][0] * shapes[1][1]
        c2o = c[:, :n2].reshape(B, *shapes[0], self.embed_dim)
        c3o = c[:, n2 : n2 + n3].reshape(B, *shapes[1], self.embed_dim)
        c4o = c[:, n2 + n3 :].reshape(B, *shapes[2], self.embed_dim)
        c1o = nn.ConvTranspose(
            self.embed_dim, (2, 2), strides=(2, 2), dtype=self.dtype, name="up"
        )(c2o)
        c1o = c1o + jax.image.resize(c1, c1o.shape, "bilinear")

        if self.add_vit_feature:
            x1, x2, x3, x4 = outs[:4] if len(outs) >= 4 else (outs + [outs[-1]] * 4)[:4]
            # torch F.interpolate(bilinear, align_corners=False) never
            # antialiases — matters for the x4 0.5x downsample (adapter.py:576)
            up = lambda t, s: jax.image.resize(
                t, (B,) + s + (self.embed_dim,), "bilinear", antialias=False
            )
            c1o = c1o + up(x1, c1o.shape[1:3])
            c2o = c2o + up(x2, shapes[0])
            c3o = c3o + x3
            c4o = c4o + up(x4, shapes[2])

        f = {
            "res2": FrozenBN(self.embed_dim, name="norm1")(c1o),
            "res3": FrozenBN(self.embed_dim, name="norm2")(c2o),
            "res4": FrozenBN(self.embed_dim, name="norm3")(c3o),
            "res5": FrozenBN(self.embed_dim, name="norm4")(c4o),
        }
        return {k: v for k, v in f.items() if k in self.out_features}


def build_vit_adapter(cfg: BackboneConfig, dtype=None) -> ViTAdapter:
    return ViTAdapter(
        dtype=dtype,
        embed_dim=cfg.vit_embed_dim,
        depth=cfg.vit_depth,
        num_heads=cfg.vit_num_heads,
        patch_size=16,  # stride-16 grid (DINOv2/14 weights interpolate)
        conv_inplane=cfg.vit_conv_inplane,
        deform_num_heads=cfg.vit_deform_num_heads,
        n_points=cfg.vit_n_points,
        interaction_indexes=cfg.vit_interaction_indexes,
        with_cffn=cfg.vit_with_cffn,
        deform_ratio=cfg.vit_deform_ratio,
        attn_impl="flash" if cfg.vit_flash_attention else "dense",
        extractor_coarse_s8=cfg.vit_extractor_coarse,
        out_features=cfg.out_features,
    )
