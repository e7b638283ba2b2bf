"""Blockwise (flash) trunk attention: fallback contract + param compatibility.

The kernel itself is TPU-only (Mosaic); CI runs on the forced-CPU backend
(conftest), where ``flash_self_attention`` must fall back to the dense path
bit-exactly — the serving flag can then never change CPU eval results. The
real-TPU numerical check (2e-3 max-abs vs dense bf16 at ViT-L scale) is in
``tools/profiling/flash_attn_probe.py`` and the tpu-marked test below.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.models.segmenter.transformer_decoder import _attention
from dvis_plus_tpu.ops.flash_attn import flash_self_attention


def _qkv(B=2, L=2304, H=4, Dh=32, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32), dtype)
    return mk(), mk(), mk()


def test_cpu_fallback_is_dense_bitexact():
    # L >= 2048 would take the kernel on TPU; off-TPU it must route to dense
    q, k, v = _qkv()
    got = jax.jit(flash_self_attention)(q, k, v)
    want = jax.jit(_attention)(q, k, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_short_sequence_uses_dense():
    q, k, v = _qkv(L=64)
    got = flash_self_attention(q, k, v)
    want = _attention(q, k, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vit_trunk_flash_flag_param_compatible():
    """attn_impl only reroutes compute: params are identical, and on CPU the
    two impls produce identical outputs (dense fallback)."""
    from dvis_plus_tpu.models.backbones.vit_adapter import DinoViT

    x = jnp.zeros((1, 64, 64, 3))
    dense = DinoViT(embed_dim=32, depth=2, num_heads=4, patch_size=16)
    flash = DinoViT(
        embed_dim=32, depth=2, num_heads=4, patch_size=16, attn_impl="flash"
    )
    p_stem = dense.init(jax.random.key(0), x, method=DinoViT.prepare_tokens)
    tokens, cls, _, _ = dense.apply(p_stem, x, method=DinoViT.prepare_tokens)
    p_blk = dense.init(
        jax.random.key(1), tokens, cls, 0, 2, method=DinoViT.run_blocks
    )
    p = {"params": {**p_stem["params"], **p_blk["params"]}}
    o1 = dense.apply(p, tokens, cls, 0, 2, method=DinoViT.run_blocks)
    o2 = flash.apply(p, tokens, cls, 0, 2, method=DinoViT.run_blocks)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))


@pytest.mark.tpu
def test_flash_matches_dense_on_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("requires a real TPU device")
    q, k, v = _qkv(B=2, L=2500, H=8, Dh=64, dtype=jnp.bfloat16)
    got = jax.jit(flash_self_attention)(q, k, v)
    want = jax.jit(_attention)(q, k, v)
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    )
    assert err < 5e-3, err
