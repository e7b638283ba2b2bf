"""Coarse stride-8 extractor serving deviation (backbone.vit_extractor_coarse).

The ViT-Adapter extractor's stride-8 queries are 76% of its deformable
gather rows, which sit on the measured ~9 ns/row descriptor floor (NOTES
perf backlog #0). The opt-in coarse mode computes that level's attention
residual on a 2x-coarser query grid and bilinearly upsamples it. These tests
pin the approximation's structure: identical params work in both modes, the
default is exact (flag off changes nothing), and the coarse residual matches
the full residual closely on smooth features.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.models.backbones.vit_adapter import ViTAdapter


def _tiny(coarse):
    return ViTAdapter(
        embed_dim=32, depth=2, num_heads=2, patch_size=16,
        conv_inplane=8, deform_num_heads=2, n_points=4,
        interaction_indexes=((0, 0), (1, 1)),
        pretrain_grid=4, extractor_coarse_s8=coarse,
    )


def test_coarse_param_compatible_and_close():
    """Same params drive both modes; on smooth inputs the coarse residual
    stays close to the exact one (it is a bilinear approximation of a smooth
    field, not a different computation)."""
    H = W = 64  # ViT grid 4x4, c2 grid 8x8
    rng = np.random.RandomState(0)
    # smooth input: low-frequency mixture
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    img = np.stack([np.sin(3 * yy + 1), np.cos(2 * xx), yy * xx], -1)
    x = jnp.asarray(img[None], jnp.float32)

    m_full = _tiny(False)
    m_coarse = _tiny(True)
    params = m_full.init(jax.random.key(0), x)
    o_full = m_full.apply(params, x)
    o_coarse = m_coarse.apply(params, x)  # same param tree (no new params)

    for k in o_full:
        assert o_full[k].shape == o_coarse[k].shape, k
        a = np.asarray(o_full[k], np.float32)
        b = np.asarray(o_coarse[k], np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        # approximation error only — far below feature magnitude
        assert rel < 0.15, (k, rel)
    # and the stride-16/32 levels (queries untouched except via shared FFN)
    # stay very close
    for k in ("res4", "res5"):
        a = np.asarray(o_full[k], np.float32)
        b = np.asarray(o_coarse[k], np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.1, (k, rel)


def test_default_off_is_unchanged():
    """The config default keeps the exact path: building with the flag off
    must be byte-identical to a build that never saw the field."""
    from dvis_plus_tpu.core.config import BackboneConfig
    from dvis_plus_tpu.models.backbones.vit_adapter import build_vit_adapter

    cfg = BackboneConfig()
    assert cfg.vit_extractor_coarse is False
    m = build_vit_adapter(cfg)
    assert m.extractor_coarse_s8 is False
