"""Fused Pallas window attention vs the exact XLA window-attention math.

The kernel (ops/swin_window_attn.py) is the serving fast path for the Swin
backbone; these tests pin it to the fp32-softmax oracle in interpret mode
(CPU) across the shapes the Swin-L stages actually produce: ws=12 (N=144),
Dh=32, shifted (masked) and unmasked blocks, and non-divisible window
counts that exercise the WB fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.ops.swin_window_attn import (
    fused_window_attention,
    window_attention_reference,
)


def _mk(B_, N, C, H, masked, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B_, N, C), dtype) * 0.5
    k = jnp.asarray(rng.randn(B_, N, C), dtype) * 0.5
    v = jnp.asarray(rng.randn(B_, N, C), dtype)
    bias = jnp.asarray(rng.randn(H, N, N), dtype) * 0.1
    mask = None
    if masked:
        nW = masked
        ids = rng.randint(0, 3, (nW, N))
        mask = jnp.asarray(
            np.where(ids[:, None, :] != ids[:, :, None], -100.0, 0.0), dtype
        )
    return q, k, v, bias, mask


@pytest.mark.parametrize(
    "B_,N,C,H,nW",
    [
        (8, 144, 64, 2, 0),      # unmasked, WB=8
        (8, 144, 64, 2, 4),      # masked, nW=4 -> WB=4, mask wraps
        (12, 144, 96, 3, 6),     # masked, nW=6 -> WB=2
        (6, 16, 64, 2, 3),       # small windows, odd nW -> WB=1
    ],
)
def test_fused_matches_reference(B_, N, C, H, nW):
    q, k, v, bias, mask = _mk(B_, N, C, H, nW)
    ref = window_attention_reference(q, k, v, bias, mask, H)
    got = fused_window_attention(q, k, v, bias, mask, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_bf16_close_to_fp32_oracle():
    q, k, v, bias, mask = _mk(8, 144, 64, 2, 4, dtype=jnp.bfloat16)
    ref = window_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        bias.astype(jnp.float32), mask.astype(jnp.float32), 2,
    )
    got = fused_window_attention(q, k, v, bias, mask, 2, interpret=True)
    # bf16 inputs + fp32 in-kernel softmax: bf16 rounding class only
    assert np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref))) < 0.05


def test_swin_backbone_fused_flag_cpu_fallback():
    """On CPU the fused flag must silently keep the exact XLA path (the
    kernel is TPU-only) — backbone outputs identical with/without it."""
    from dvis_plus_tpu.models.backbones.swin import SwinTransformer

    x = jnp.asarray(np.random.RandomState(0).rand(1, 48, 48, 3), jnp.float32)
    m0 = SwinTransformer(
        embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=7
    )
    m1 = SwinTransformer(
        embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=7,
        fused_attn=True,
    )
    p = m0.init(jax.random.key(0), x)
    o0 = m0.apply(p, x)
    o1 = m1.apply(p, x)
    for k_ in o0:
        np.testing.assert_allclose(np.asarray(o0[k_]), np.asarray(o1[k_]))
