"""Long-video eval paging: whole-video mask tensors must stay O(window) on
device, with host fp16 paging beyond the HBM budget.

Replaces the reference's retry_if_cuda_oom -> CPU fp32 escape hatch around
``inference_video`` / the online mask accumulation
(``mask2former_video/utils/memory.py:27-80``, used at
``meta_architecture.py:704``): here the drivers page deterministically when
the estimated tensor exceeds ``test.offline_mf_budget_gb`` (env
``DVIS_OFFLINE_MF_BUDGET_GB``), and the paged top-K upsampler
(``inference.paged_inference_video``) never materializes the
(topk, T, out_h, out_w) tensor on device.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.engine.inference import (
    _minvis_video,
    _online_video,
    paged_inference_video,
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


def _build(arch, cfg):
    if arch == "minvis":
        from dvis_plus_tpu.models.segmenter.segmenter import Segmenter

        model = Segmenter(cfg.model)
        init_in = jnp.zeros((4, 64, 64, 3), jnp.float32)
    elif arch == "dvis_online":
        from dvis_plus_tpu.models.meta.dvis_online import DVISOnline

        model = DVISOnline(cfg.model)
        init_in = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    else:
        from dvis_plus_tpu.models.meta.dvis_offline import DVISOffline

        model = DVISOffline(cfg.model)
        init_in = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), init_in)
    return model, params


def test_paged_inference_video_matches_one_shot():
    """Chunked upsampling == one-shot inference_video (device and host mask
    sources)."""
    from dvis_plus_tpu.models.meta.minvis import inference_video

    rng = np.random.RandomState(0)
    Q, K1, T = 12, 6, 11
    logits = jnp.asarray(rng.randn(Q, K1).astype(np.float32))
    masks = rng.randn(Q, T, 16, 16).astype(np.float32)
    kw = dict(img_size=(60, 60), output_size=(37, 53), padded_size=(64, 64), topk=7)

    ref = inference_video(logits, jnp.asarray(masks), **kw)
    for src in (jnp.asarray(masks), masks):
        scores, labels, out = paged_inference_video(logits, src, chunk=4, **kw)
        np.testing.assert_allclose(np.asarray(scores), np.asarray(ref.scores), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref.labels))
        np.testing.assert_array_equal(out, np.asarray(ref.masks))


@pytest.mark.parametrize("k_col", [8, 1])
def test_paged_inference_video_runs_equals_packed(k_col):
    """The device-side run-boundary download ("runs") yields the SAME RLE
    rows as the packed-pixel download — k_col=1 forces the per-frame packed
    fallback on (almost) every frame, exercising the overflow path."""
    from dvis_plus_tpu.utils.rle import ColRunMasks

    rng = np.random.RandomState(3)
    Q, K1, T = 12, 6, 11
    logits = jnp.asarray(rng.randn(Q, K1).astype(np.float32))
    masks = rng.randn(Q, T, 16, 16).astype(np.float32)
    kw = dict(img_size=(60, 60), output_size=(37, 53), padded_size=(64, 64), topk=7)

    _, _, pk = paged_inference_video(
        logits, jnp.asarray(masks), chunk=4, download="packed", **kw
    )
    _, _, cr = paged_inference_video(
        logits, jnp.asarray(masks), chunk=4, download="runs", k_col=k_col, **kw
    )
    assert isinstance(cr, ColRunMasks)
    if k_col == 1:
        assert cr.fallback, "k_col=1 should force packed fallbacks"
    np.testing.assert_array_equal(cr.unpack(), pk.unpack())
    for i in range(7):
        for t in range(T):
            assert cr.frame_any(i, t) == pk.frame_any(i, t)
            if cr.frame_any(i, t):
                assert cr.encode_frame(i, t)["counts"] == \
                    pk.encode_frame(i, t)["counts"], (i, t, k_col)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["minvis", "dvis_online", "dvis_offline"])
def test_long_video_pages_to_host_and_matches(arch, monkeypatch):
    """A 64-frame video with a ~zero budget pages masks to HOST (np arrays,
    O(window) per dispatch) and produces (nearly) the same outputs as the
    device-resident run."""
    cfg = _tiny_cfg(arch)
    cfg.test.window_size = 4
    model, params = _build(arch, cfg)
    T = 64
    images = np.random.RandomState(1).rand(T, 64, 64, 3).astype(np.float32)
    fn = _minvis_video if arch == "minvis" else _online_video

    monkeypatch.delenv("DVIS_OFFLINE_MF_BUDGET_GB", raising=False)
    cfg.test.offline_mf_budget_gb = 100.0
    lg_dev, mk_dev, aux_dev = fn(cfg, model, params, images, {}, 4)
    assert not isinstance(mk_dev, np.ndarray)

    cfg.test.offline_mf_budget_gb = 1e-9
    lg_pg, mk_pg, aux_pg = fn(cfg, model, params, images, {}, 4)
    assert isinstance(mk_pg, np.ndarray)  # paged through host
    assert mk_pg.dtype == np.float16

    np.testing.assert_allclose(
        np.asarray(lg_pg), np.asarray(lg_dev), rtol=1e-4, atol=1e-4
    )
    # fp16 paging quantizes mask logits; sign agreement is what the >0
    # threshold consumes
    dev = np.asarray(mk_dev[:, :T], np.float32)
    pg = np.asarray(mk_pg[:, :T], np.float32)
    flip = np.mean((dev > 0) != (pg > 0))
    assert flip < 2e-3, flip

    # end-to-end through the paged top-K: identical label/score ranking
    s_d, l_d, m_d = paged_inference_video(
        lg_dev, mk_dev[:, :T], img_size=(60, 60), output_size=(50, 50),
        padded_size=(64, 64), topk=5,
        aux_pred_cls=aux_dev, chunk=4,
    )
    s_p, l_p, m_p = paged_inference_video(
        lg_pg, mk_pg[:, :T], img_size=(60, 60), output_size=(50, 50),
        padded_size=(64, 64), topk=5,
        aux_pred_cls=aux_pg, chunk=4,
    )
    np.testing.assert_array_equal(np.asarray(l_p), np.asarray(l_d))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_d), rtol=1e-3, atol=1e-4)
    assert m_p.shape == (5, T, 50, 50) and m_p.dtype == np.bool_
    assert np.mean(m_p != m_d) < 2e-3


@pytest.mark.slow
def test_vis_eval_driver_long_video(monkeypatch):
    """run_vis_inference end-to-end on a 48-frame video under a ~zero budget:
    the evaluator still receives full-length masks (run-boundary form — the
    driver never downloads mask pixels on the default path)."""
    from dvis_plus_tpu.engine.inference import run_vis_inference

    cfg = _tiny_cfg("dvis_online")
    cfg.test.window_size = 4
    cfg.test.max_num = 5
    cfg.test.offline_mf_budget_gb = 1e-9
    monkeypatch.delenv("DVIS_OFFLINE_MF_BUDGET_GB", raising=False)
    model, params = _build("dvis_online", cfg)

    T = 48
    sample = {
        "images": np.random.RandomState(2).rand(T, 64, 64, 3).astype(np.float32),
        "image_size": (60, 60),
        "height": 30,
        "width": 40,
        "video_id": 0,
    }

    class Sink:
        def __init__(self):
            self.outputs = []

        def process(self, video_id, output):
            self.outputs.append(output)

    sink = Sink()
    run_vis_inference(cfg, model, params, iter([sample]), sink)
    (out,) = sink.outputs
    from dvis_plus_tpu.utils.rle import ColRunMasks

    pm = out["pred_masks"]
    assert isinstance(pm, ColRunMasks)
    assert pm.shape == (5, T, 30, 40)
    assert pm.unpack().dtype == np.bool_
    assert len(out["pred_scores"]) == 5
