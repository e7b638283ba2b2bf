"""Length bucketing: bounded compile count over variable-length videos, and
exactness of the replicate-pad + time-mask refiner path.

Replaces the reference's fully dynamic video length (torch recompiles nothing;
meta_architecture.py:1446-1500) with power-of-two window-count buckets so a
val set with N distinct lengths costs O(log max_T) XLA compiles instead of N.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.engine.inference import (
    _bucket_windows,
    _minvis_video,
    _online_video,
    _pad_time_replicate,
)


def _tiny_cfg(arch):
    cfg = Config()
    m = cfg.model
    m.meta_architecture = arch
    m.num_classes = 5
    m.compute_dtype = "float32"
    m.pixel_decoder.conv_dim = 32
    m.pixel_decoder.mask_dim = 32
    m.pixel_decoder.transformer_enc_layers = 1
    m.pixel_decoder.transformer_dim_feedforward = 64
    m.pixel_decoder.transformer_nheads = 4
    m.transformer_decoder.hidden_dim = 32
    m.transformer_decoder.num_queries = 8
    m.transformer_decoder.nheads = 4
    m.transformer_decoder.dim_feedforward = 64
    m.transformer_decoder.dec_layers = 2
    m.transformer_decoder.mask_dim = 32
    m.tracker.num_layers = 1
    m.tracker.feedforward_dim = 64
    m.refiner.num_layers = 1
    m.refiner.feedforward_dim = 64
    return cfg


def test_bucket_windows():
    assert [_bucket_windows(n) for n in (1, 2, 3, 4, 5, 7, 8, 9)] == [
        1, 2, 4, 4, 8, 8, 8, 16,
    ]


def test_pad_time_replicate():
    x = jnp.arange(5.0)[None, :, None]
    y = _pad_time_replicate(x, 3, 8, 1)
    np.testing.assert_array_equal(
        np.asarray(y[0, :, 0]), [0, 1, 2, 2, 2, 2, 2, 2]
    )


@pytest.mark.slow
def test_refiner_masked_padding_is_exact():
    """embed_pass over a replicate-padded, time-masked video == embed_pass at
    the true length (the invariant temporal_refiner._body documents)."""
    from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner

    T, Tb, Q, fQ, C = 7, 12, 6, 8, 32
    model = TemporalRefiner(
        num_classes=5, hidden_dim=C, feedforward_dim=64, num_heads=4,
        num_layers=2, mask_dim=16,
    )
    rng = np.random.RandomState(0)
    inst = jnp.asarray(rng.randn(1, T, Q, C).astype(np.float32))
    frame = jnp.asarray(rng.randn(1, T, fQ, C).astype(np.float32))
    params = model.init(
        jax.random.key(0), inst, frame, method=TemporalRefiner.embed_pass
    )

    ref = model.apply(params, inst, frame, method=TemporalRefiner.embed_pass)

    inst_p = _pad_time_replicate(inst, T, Tb, 1)
    frame_p = _pad_time_replicate(frame, T, Tb, 1)
    tmask = (jnp.arange(Tb) < T)[None]
    got = model.apply(
        params, inst_p, frame_p, time_mask=tmask,
        method=TemporalRefiner.embed_pass,
    )

    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["mask_embed"][:, :T]), np.asarray(ref["mask_embed"]),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["minvis", "dvis_offline"])
def test_compile_count_bounded_over_val_set(arch):
    """12 synthetic videos with 8 distinct lengths share <= #buckets compiled
    executables for the length-dependent stages (VERDICT r2 #2)."""
    cfg = _tiny_cfg(arch)
    W_sz = 4
    if arch == "minvis":
        from dvis_plus_tpu.models.segmenter.segmenter import Segmenter

        model = Segmenter(cfg.model)
    else:
        from dvis_plus_tpu.models.meta.dvis_offline import DVISOffline

        model = DVISOffline(cfg.model)
    H = W = 64
    images0 = jnp.asarray(
        np.random.RandomState(0).rand(4, H, W, 3).astype(np.float32)
    )
    init_in = images0[None] if arch == "dvis_offline" else images0
    params = jax.jit(model.init)(jax.random.key(0), init_in)

    lengths = [3, 5, 6, 7, 9, 11, 13, 17, 5, 7, 9, 13]  # 8 distinct
    # jit wrappers over the same function share the global tracing cache:
    # earlier tests' minvis_post_processing calls would leak into the
    # _cache_size() assertion below
    jax.clear_caches()
    window_fns = {}
    outs = []
    for i, T in enumerate(lengths):
        images = np.random.RandomState(i).rand(T, H, W, 3).astype(np.float32)
        fn = _minvis_video if arch == "minvis" else _online_video
        logits, masks, _aux = fn(cfg, model, params, images, window_fns, W_sz)
        assert np.all(np.isfinite(np.asarray(logits)))
        outs.append(np.asarray(masks[:, :T]).shape)

    n_buckets = len({_bucket_windows((T + W_sz - 1) // W_sz) for T in lengths})
    if arch == "minvis":
        # one shared jit; its compile-cache has one entry per bucket shape
        assert window_fns["minvis_pp"]._cache_size() == n_buckets
    else:
        rk = [k for k in window_fns if k[0] == "refine_embeds"]
        assert len(rk) == n_buckets, (rk, n_buckets)
        for k in rk:
            refine, _ = window_fns[k]
            assert refine._cache_size() == 1
