"""Swin Transformer backbone (NHWC, TPU-native).

Re-designs the reference's vendored Swin
(``DVIS_Plus/mask2former/modeling/backbone/swin.py:498-770``: SwinTransformer +
D2SwinTransformer): hierarchical windowed attention with shifted windows,
relative position bias, patch merging, per-stage output LayerNorms feeding the
d2 {res2..res5} contract.

TPU notes: all window partitioning is static reshape/transpose (no dynamic
shapes); attention over (num_windows*B, ws*ws, C) batches rides the MXU;
stochastic depth only at training. Layout NHWC throughout.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import BackboneConfig


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) relative position index into the bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class _QKV(nn.Module):
    """Fused qkv projection executed as three kernel-sliced matmuls.

    Param tree matches ``nn.Dense(3C, name="qkv")`` (kernel (C, 3C) + bias),
    so checkpoints and the torch converter are unchanged — but slicing the
    *kernel* instead of the activation avoids the (B_, N, 3, H, Dh)
    split/transpose relayouts that dominated the profiled block time (v5e
    trace: two 17.5 ms + two 9.8 ms copy ops per 8 block-pairs)."""

    features: int  # 3C
    use_bias: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (C, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        d = self.dtype or x.dtype
        xd = x.astype(d)
        outs = []
        for i in range(3):
            w = jax.lax.slice_in_dim(kernel, i * C, (i + 1) * C, axis=1)
            o = xd @ w.astype(d)
            if bias is not None:
                o = o + bias[i * C : (i + 1) * C].astype(d)
            outs.append(o)
        return outs  # [q, k, v], each (B_, N, C)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay fp32)
    fast_softmax: bool = False  # opt-in bf16 attention-scores serving path
    fused_attn: bool = False  # opt-in fused Pallas window attention (serving)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: (B_, N, C) where N = ws*ws
        B_, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        ws = self.window_size

        q, k, v = _QKV(3 * C, self.qkv_bias, self.dtype, name="qkv")(x)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, H),
        )
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = table[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)  # (H, N, N)

        if self.fused_attn and jax.default_backend() == "tpu":
            # fused Pallas serving path: scores/bias/mask/softmax/PV stay in
            # VMEM, heads sliced on lanes — no (B_, H, N, Dh) relayout and no
            # HBM score traffic (ops/swin_window_attn.py; fp32 softmax
            # in-kernel, so numerically tighter than fast_softmax)
            from dvis_plus_tpu.ops.swin_window_attn import fused_window_attention

            out = fused_window_attention(q, k, v, bias, mask, H)
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        q = q.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)  # (B_, H, N, Dh)
        k = k.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)

        if self.fast_softmax and q.dtype == jnp.bfloat16:
            # serving fast path (EXPLICIT opt-in via cfg.backbone
            # .swin_fast_softmax — never taken during training, where the
            # fp32-softmax island policy of core/config.py applies): keep the
            # (B_, H, N, N) scores in bf16 end to end — the fp32 scores
            # pipeline (scale+bias+mask+softmax) was 50% of the profiled
            # block time on v5e. exp in bf16 after max-sub; the denominator
            # accumulates in fp32 (small tensor). Same numeric class as the
            # bf16 deformable-attention values (documented serving
            # deviation; fp32 path below is exact).
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
            attn = attn * jnp.bfloat16(Dh**-0.5) + bias[None].astype(attn.dtype)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[
                    None, :, None
                ].astype(attn.dtype)
                attn = attn.reshape(B_, H, N, N)
            m = jnp.max(attn, axis=-1, keepdims=True)
            e = jnp.exp(attn - m)
            s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            attn = e * (1.0 / s).astype(e.dtype)
        else:
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            )
            attn = attn * (Dh**-0.5) + bias[None].astype(attn.dtype)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[
                    None, :, None
                ].astype(attn.dtype)
                attn = attn.reshape(B_, H, N, N)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(wins: jnp.ndarray, ws: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = wins.shape[-1]
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H: int, W: int, ws: int, shift: int) -> jnp.ndarray:
    """Attention mask for shifted windows (swin.py img_mask logic)."""
    img = np.zeros((1, H, W, 1), np.int32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = _window_partition(jnp.asarray(img, jnp.float32), ws).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)  # (nW, N, N)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: Optional[jnp.dtype] = None
    fast_softmax: bool = False
    fused_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        # window size stays FIXED for any map size (param shapes must be
        # static across input sizes; small maps are padded up to one window,
        # matching the reference detection-Swin port which never clamps) —
        # and the cyclic shift stays ON even when one padded window covers
        # the map (reference swin.py:258-262 rolls unconditionally; the
        # timm-style shift_size=0 clamp diverges on deep stages of small
        # inputs — caught by test_backbone_reference_parity res4/res5)
        ws = self.window_size
        shift = self.shift_size
        shortcut = x

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(Hp, Wp, ws, shift)
        else:
            mask = None

        wins = _window_partition(x, ws)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, self.qkv_bias, self.dtype,
            fast_softmax=self.fast_softmax, fused_attn=self.fused_attn,
            name="attn"
        )(wins, mask)
        x = _window_reverse(wins, ws, B, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W]

        x = shortcut + self._drop_path(x, training)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + self._drop_path(y, training)

    def _drop_path(self, x: jnp.ndarray, training: bool) -> jnp.ndarray:
        if not training or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
        return x * mask.astype(x.dtype) / keep


class PatchMerging(nn.Module):
    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.3
    patch_size: int = 4
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 = AMP-style
    # serving; params stay fp32; attention softmax stays fp32 unless
    # fast_softmax explicitly opts into the bf16-scores serving path)
    fast_softmax: bool = False
    fused_attn: bool = False  # fused Pallas window attention (serving)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> Dict[str, jnp.ndarray]:
        ps = self.patch_size
        B, H, W, _ = x.shape
        pad_b = (ps - H % ps) % ps
        pad_r = (ps - W % ps) % ps
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(
            self.embed_dim, (ps, ps), strides=(ps, ps), dtype=self.dtype,
            name="patch_embed"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs: Dict[str, jnp.ndarray] = {}
        dim = self.embed_dim
        blk_idx = 0
        for s, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[s],
                    window_size=self.window_size,
                    shift_size=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path=float(dpr[blk_idx]),
                    dtype=self.dtype,
                    fast_softmax=self.fast_softmax,
                    fused_attn=self.fused_attn,
                    name=f"stage{s}_block{b}",
                )(x, training)
                blk_idx += 1
            name = f"res{s + 2}"
            if name in self.out_features:
                outs[name] = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{s}")(x)
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"downsample{s}")(x)
                dim *= 2
        return outs


_SWIN_VARIANTS = {
    "swin_t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_s": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_l": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def build_swin(cfg: BackboneConfig, dtype=None) -> SwinTransformer:
    kw = dict(_SWIN_VARIANTS[cfg.name]) if cfg.name in _SWIN_VARIANTS else dict(
        embed_dim=cfg.swin_embed_dim,
        depths=cfg.swin_depths,
        num_heads=cfg.swin_num_heads,
    )
    return SwinTransformer(
        dtype=dtype,
        fast_softmax=cfg.swin_fast_softmax,
        fused_attn=cfg.swin_fused_attn,
        window_size=cfg.swin_window_size,
        mlp_ratio=cfg.swin_mlp_ratio,
        qkv_bias=cfg.swin_qkv_bias,
        drop_path_rate=cfg.swin_drop_path_rate,
        patch_size=cfg.swin_patch_size,
        out_features=cfg.out_features,
        **kw,
    )
