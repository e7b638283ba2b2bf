"""OV-DVIS++ activation parity against the ACTUAL reference implementation.

The reference OV modules (ov_dvis/video_mask2former_transformer_decoder_ov.py
and ov_dvis/video_dvis_modules_ov.py) are pure torch — only the CLIP backbone
needs open_clip, and the heads take precomputed text classifiers — so they
run on the installed CPU torch via tools/refshim.py::load_ov_oracles. Each
module is constructed with torch's default init, its state_dict converted by
core/zoo_convert.py::convert_ov_{decoder,tracker,refiner}, and forward
activations compared fp32. The shared FC-CLIP head is wired exactly as the
reference meta-arch does (tracker/refiner receive the PREDICTOR's modules,
meta_architecture_ov.py:1110-1122, 1906-1933).

Parity-run settings on our side: fp32, exact JV matcher, pre-normalized text
classifier rows (the reference caches normalized rows; its
get_classification_logits does not re-normalize them, ours does — a no-op on
unit rows).
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow

T = 4
D = 64  # hidden dim
Cc = 32  # clip embedding dim
Q = 8
NT = (2, 3, 2, 2)  # templates per class; last = learned void rows
K = len(NT) - 1
R = sum(NT)
H4, W4 = 16, 24  # mask-feature resolution
LAYERS = 3
REL_TOL = 2e-4


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _report(name, ours, ref):
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    err = np.max(np.abs(ours - ref))
    rel = err / max(np.max(np.abs(ref)), 1e-6)
    print(f"PARITY {name}: max_abs_err={err:.3e} rel={rel:.3e}")
    return rel


def _assert_close(name, ours, ref, rel_tol=REL_TOL):
    rel = _report(name, ours, ref)
    assert rel < rel_tol, f"{name}: rel err {rel:.3e} >= {rel_tol}"


@pytest.fixture(scope="module")
def bundle():
    from refshim import load_ov_oracles

    o = load_ov_oracles()
    torch.manual_seed(0)
    dec = o["VideoMultiScaleMaskedTransformerDecoder_dvis_OV"](
        in_channels=D, mask_classification=True, num_classes=0, hidden_dim=D,
        num_queries=Q, nheads=8, dim_feedforward=256, dec_layers=LAYERS,
        pre_norm=False, mask_dim=D, enforce_input_project=False,
        clip_embedding_dim=Cc, num_frames=T,
    )
    # shared FC-CLIP head: tracker/refiner take the PREDICTOR's modules
    tracker = o["ReferringTracker_noiser_OV"](
        hidden_channel=D, feedforward_channel=256, num_head=8,
        decoder_layer_num=LAYERS, mask_dim=D, noise_mode="none",
        mask_pooling=dec.mask_pooling,
        mask_pooling_proj=dec._mask_pooling_proj,
        class_embed=dec.class_embed,
        logit_scale=dec.logit_scale,
        mask_embed=dec.mask_embed,
        decoder_norm=dec.decoder_norm,
    )
    refiner = o["TemporalRefiner_OV"](
        hidden_channel=D, feedforward_channel=256, num_head=8,
        decoder_layer_num=LAYERS, mask_dim=D, windows=5,
        mask_pooling=dec.mask_pooling,
        mask_pooling_proj=dec._mask_pooling_proj,
        class_embed=dec.class_embed,
        logit_scale=dec.logit_scale,
        mask_embed=dec.mask_embed,
        decoder_norm=dec.decoder_norm,
    )
    dec.eval(), tracker.eval(), refiner.eval()

    rng = np.random.RandomState(1)
    sizes = [(H4 // 2, W4 // 2), (H4 // 4, W4 // 4), (H4 // 8, W4 // 8)]
    ms = [rng.randn(T, D, h, w).astype(np.float32) for h, w in sizes]
    mf = rng.randn(T, D, H4, W4).astype(np.float32)
    tc = rng.randn(R, Cc).astype(np.float32)
    tc /= np.linalg.norm(tc, axis=-1, keepdims=True)

    with torch.no_grad():
        dec_out = dec(
            [torch.from_numpy(m) for m in ms], torch.from_numpy(mf),
            text_classifier=torch.from_numpy(tc), num_templates=list(NT),
        )
        track_out = tracker(
            dec_out["pred_embds"], torch.from_numpy(mf)[None],
            frame_embeds_no_norm=dec_out["pred_embds_without_norm"],
            text_classifier=torch.from_numpy(tc), num_templates=list(NT),
        )
        refine_out = refiner(
            track_out["pred_embds"], dec_out["pred_embds_without_norm"],
            torch.from_numpy(mf)[None],
            text_classifier=torch.from_numpy(tc), num_templates=list(NT),
        )

    return dict(
        dec_sd=_sd(dec), tracker_sd=_sd(tracker), refiner_sd=_sd(refiner),
        ms=ms, mf=mf, tc=tc,
        dec_out={k: v.numpy() for k, v in dec_out.items() if torch.is_tensor(v)},
        track_out={k: v.numpy() for k, v in track_out.items() if torch.is_tensor(v)},
        refine_out={k: v.numpy() for k, v in refine_out.items() if torch.is_tensor(v)},
    )


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_ov_decoder_parity(bundle):
    from dvis_plus_tpu.core.zoo_convert import convert_ov_decoder
    from dvis_plus_tpu.models.ov.ov_decoder import OVMaskedTransformerDecoder

    params = convert_ov_decoder(bundle["dec_sd"], num_layers=LAYERS, heads=8)
    model = OVMaskedTransformerDecoder(
        hidden_dim=D, num_queries=Q, num_heads=8, dim_feedforward=256,
        num_layers=LAYERS, mask_dim=D, clip_embed_dim=Cc,
    )
    out = model.apply(
        {"params": params},
        [_nhwc(m) for m in bundle["ms"]],
        _nhwc(bundle["mf"]),
        jnp.asarray(bundle["tc"]),
        NT,
    )
    ref = bundle["dec_out"]
    # reference eval layouts: logits (1, t, q, K+1); masks (1, q, t, h, w);
    # embds (1, c, t, q)
    _assert_close("ov_decoder.pred_logits", out["pred_logits"], ref["pred_logits"][0])
    _assert_close(
        "ov_decoder.pred_masks", out["pred_masks"],
        np.transpose(ref["pred_masks"][0], (1, 0, 2, 3)),
    )
    _assert_close(
        "ov_decoder.pred_embds", out["pred_embds"],
        np.transpose(ref["pred_embds"][0], (1, 2, 0)),
    )
    _assert_close(
        "ov_decoder.pred_embds_without_norm", out["pred_embds_without_norm"],
        np.transpose(ref["pred_embds_without_norm"][0], (1, 2, 0)),
    )


def test_ov_tracker_parity(bundle):
    from dvis_plus_tpu.core.zoo_convert import convert_ov_tracker
    from dvis_plus_tpu.models.tracker.referring_tracker import ReferringTracker

    params = convert_ov_tracker(bundle["tracker_sd"], num_layers=LAYERS, heads=8)
    model = ReferringTracker(
        num_classes=0, hidden_dim=D, feedforward_dim=256, num_heads=8,
        num_layers=LAYERS, mask_dim=D, noise_mode="none", matcher="jv",
        ov=True, clip_embed_dim=Cc,
    )
    embds = np.transpose(bundle["dec_out"]["pred_embds"], (0, 2, 3, 1))
    embds_nn = np.transpose(
        bundle["dec_out"]["pred_embds_without_norm"], (0, 2, 3, 1)
    )
    mf = np.transpose(bundle["mf"], (0, 2, 3, 1))[None]
    out, _ = model.apply(
        {"params": params},
        jnp.asarray(embds), jnp.asarray(mf),
        frame_embeds_no_norm=jnp.asarray(embds_nn),
        text_classifier=jnp.asarray(bundle["tc"]), num_templates=NT,
    )
    ref = bundle["track_out"]
    _assert_close("ov_tracker.pred_logits", out["pred_logits"], ref["pred_logits"])
    _assert_close("ov_tracker.pred_masks", out["pred_masks"], ref["pred_masks"])
    _assert_close(
        "ov_tracker.pred_embds",
        np.transpose(np.asarray(out["pred_embds"]), (0, 3, 1, 2)),
        ref["pred_embds"],
    )


def test_ov_conversion_coverage():
    """convert_reference_checkpoint on a synthetic OV-zoo-keyed state dict
    (backbone.clip_model.visual.* + OV predictor + void_embedding + OV
    tracker/refiner) fills the FULL DVISOfflineOV tree: every leaf converted,
    no shape mismatches, nothing left at init."""
    import jax

    from parity_check import coverage_report, synthetic_reference_state_dict
    from dvis_plus_tpu.core.config import Config
    from dvis_plus_tpu.core.zoo_convert import convert_reference_checkpoint
    from dvis_plus_tpu.models.meta.ov import DVISOfflineOV

    cfg = Config()
    m = cfg.model
    m.meta_architecture = "dvis_offline_ov"
    m.compute_dtype = "float32"
    m.ov.enabled = True
    m.ov.clip_embed_dim = Cc
    m.backbone.clip_depths = (1, 1, 1, 1)
    m.backbone.clip_dims = (8, 16, 32, 64)
    m.pixel_decoder.conv_dim = 32
    m.pixel_decoder.mask_dim = 32
    m.pixel_decoder.transformer_enc_layers = 1
    m.pixel_decoder.transformer_dim_feedforward = 64
    m.transformer_decoder.hidden_dim = 32
    m.transformer_decoder.num_queries = Q
    m.transformer_decoder.nheads = 4
    m.transformer_decoder.dim_feedforward = 64
    m.transformer_decoder.dec_layers = 2
    m.transformer_decoder.mask_dim = 32
    m.tracker.num_layers = 1
    m.tracker.feedforward_dim = 64
    m.tracker.num_heads = 4
    m.refiner.num_layers = 1
    m.refiner.feedforward_dim = 64
    m.refiner.num_heads = 4

    sd = synthetic_reference_state_dict(cfg)
    converted = convert_reference_checkpoint(sd, cfg)

    model = DVISOfflineOV(cfg.model)
    rng = np.random.RandomState(0)
    ntc = (2, 3, 2, 1)  # last = our single learned void row
    tc = jnp.asarray(rng.randn(sum(ntc) - 1, Cc).astype(np.float32))
    images = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    init = model.init(jax.random.key(0), images, tc, ntc)

    rep = coverage_report(converted["params"], init["params"])
    assert not rep["mismatched"], rep["mismatched"][:5]
    assert not rep["extra"], rep["extra"][:5]
    assert not rep["left_at_init"], rep["left_at_init"][:5]
    assert rep["filled"] == rep["total_params"]

    # the CLI zoo-weights path: cfg.weights = <reference .pth/.npz> converts
    # on the fly inside load_weights (checkpoint.py)
    import tempfile

    from dvis_plus_tpu.core.checkpoint import load_weights

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "zoo.npz")
        np.savez(path, **sd)
        merged = load_weights(path, init, cfg=cfg)
    got = merged["params"]["online"]["tracker"]["merge"]["kernel"]
    want = converted["params"]["online"]["tracker"]["merge"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_ov_refiner_parity(bundle):
    from dvis_plus_tpu.core.zoo_convert import convert_ov_refiner
    from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner

    params = convert_ov_refiner(bundle["refiner_sd"], num_layers=LAYERS, heads=8)
    model = TemporalRefiner(
        num_classes=0, hidden_dim=D, feedforward_dim=256, num_heads=8,
        num_layers=LAYERS, mask_dim=D, window=5, ov=True, clip_embed_dim=Cc,
    )
    inst = np.transpose(bundle["track_out"]["pred_embds"], (0, 2, 3, 1))
    frame = np.transpose(
        bundle["dec_out"]["pred_embds_without_norm"], (0, 2, 3, 1)
    )
    mf = np.transpose(bundle["mf"], (0, 2, 3, 1))[None]
    out = model.apply(
        {"params": params},
        jnp.asarray(inst), jnp.asarray(frame), jnp.asarray(mf),
        training=False,
        text_classifier=jnp.asarray(bundle["tc"]), num_templates=NT,
    )
    ref = bundle["refine_out"]
    _assert_close("ov_refiner.pred_logits", out["pred_logits"], ref["pred_logits"])
    _assert_close("ov_refiner.pred_masks", out["pred_masks"], ref["pred_masks"])
