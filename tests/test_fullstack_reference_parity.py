"""FULL-STACK product-output parity against the reference implementation.

Every module (backbone, pixel decoder, predictor, tracker) and every
post-processing method is already oracle-verified in isolation
(test_reference_parity.py / test_postproc_reference_parity.py). This test
closes the loop at the PRODUCT surface: the same reference-keyed weights on
the same input video must yield the same ``results.json`` — i.e. a user
switching from the reference to this framework gets the same predictions.

Reference side (torch, CPU, under tools/refshim.py): the reference's own
eval pipeline re-chained exactly as ``MinVIS.forward`` /
``DVIS_Plus_online.forward`` do at eval time (meta_architecture.py:156-231
minvis, :591-705 online): normalized padded frames -> ``run_window_inference``
window loop (:303-327 segmenter-only / :774-816 segmenter+tracker with
``resume=True`` across windows) -> ``post_processing`` -> ``inference_video``
(:362-401) / ``inference_video_vis`` (:818-867) -> RLE rows.

Our side: the real CLI entry ``train_net_video.do_eval`` (model build, .pth
weight conversion/load, test loader, windowed streaming driver, paged top-K
upsampling, evaluator json writer) — nothing mocked.

Both sides consume the SAME mapper output (our resize/normalize parity is
covered by the mapper/backbone oracle tests), and rows are serialized by the
same oracle-verified native RLE codec, so any mismatch here is a real
integration bug in windows/stitching/carry/top-K/upsampling/serialization.
"""
import functools
import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow

from tests.test_data import make_cfg, synth_dataset  # noqa: F401,E402

TOPK = 10  # the reference MinVIS top-K is hardcoded to 10 (:370)
# score parity bar: fp32 reduction-order drift through the full stack stays
# orders of magnitude below this; a wrong window/carry/fusion jumps above it
SCORE_RTOL = 1e-3
# binarize-at-0 pixel flips can only happen where |mask logit| ~ fp32 drift;
# on real masks that is a vanishing sliver of pixels
PIXEL_AGREE = 0.995


def _cfg(arch):
    cfg = make_cfg()
    cfg.model.meta_architecture = arch
    cfg.model.num_classes = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = 8
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 2
    cfg.model.transformer_decoder.mask_dim = 32
    cfg.model.transformer_decoder.reid_branch = True
    cfg.model.transformer_decoder.reid_hidden_dim = 64
    cfg.model.tracker.num_layers = 2
    cfg.model.tracker.num_heads = 4
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.tracker.matcher_solver = "jv"  # reference scipy-LSA semantics
    cfg.test.window_size = 3  # reference MinVIS hardcodes window_size=3 (:191)
    cfg.test.max_num = TOPK
    cfg.datasets.test = ("synth_train",)
    return cfg


def _build_ref_modules(cfg, sd, with_tracker):
    """The reference's own torch modules at this cfg's dims, loaded from the
    reference-keyed state dict (strict=True = full coverage both ways)."""
    from refshim import build_torch_d2_resnet50, load_dvis_plus_oracles

    o = load_dvis_plus_oracles()
    ShapeSpec = o["ShapeSpec"]

    def load(mod, prefix):
        sub = {
            k[len(prefix):]: torch.from_numpy(np.asarray(v))
            for k, v in sd.items()
            if k.startswith(prefix)
        }
        mod.load_state_dict(sub, strict=True)
        mod.eval()
        return mod

    pd, td = cfg.model.pixel_decoder, cfg.model.transformer_decoder
    backbone = load(build_torch_d2_resnet50(), "backbone.")
    pix = load(
        o["MSDeformAttnPixelDecoder"](
            input_shape={
                "res2": ShapeSpec(channels=256, stride=4),
                "res3": ShapeSpec(channels=512, stride=8),
                "res4": ShapeSpec(channels=1024, stride=16),
                "res5": ShapeSpec(channels=2048, stride=32),
            },
            transformer_dropout=0.0,
            transformer_nheads=pd.transformer_nheads,
            transformer_dim_feedforward=pd.transformer_dim_feedforward,
            transformer_enc_layers=pd.transformer_enc_layers,
            conv_dim=pd.conv_dim,
            mask_dim=pd.mask_dim,
            norm="GN",
            transformer_in_features=["res3", "res4", "res5"],
            common_stride=4,
        ),
        "sem_seg_head.pixel_decoder.",
    )
    pred = load(
        o["VideoMultiScaleMaskedTransformerDecoder_dvisPlus"](
            in_channels=pd.conv_dim,
            mask_classification=True,
            num_classes=cfg.model.num_classes,
            hidden_dim=td.hidden_dim,
            num_queries=td.num_queries,
            nheads=td.nheads,
            dim_feedforward=td.dim_feedforward,
            dec_layers=td.dec_layers,
            pre_norm=False,
            mask_dim=td.mask_dim,
            enforce_input_project=False,
            num_frames=1,
            num_reid_head_layers=3,
            reid_hidden_dim=td.reid_hidden_dim,
        ),
        "sem_seg_head.predictor.",
    )
    tracker = None
    if with_tracker:
        tr = cfg.model.tracker
        tracker = load(
            o["ReferringTracker_noiser"](
                hidden_channel=td.hidden_dim * 2,
                feedforward_channel=tr.feedforward_dim,
                num_head=tr.num_heads,
                decoder_layer_num=tr.num_layers,
                mask_dim=td.mask_dim,
                class_num=cfg.model.num_classes,
                noise_mode="none",
            ),
            "tracker.",
        )
    return backbone, pix, pred, tracker


def _ref_segmenter_windows(backbone, pix, pred, imgs, window):
    """MinVIS.run_window_inference (:303-327): per-window segmenter forward,
    outputs concatenated over time."""
    outs = []
    with torch.no_grad():
        for s in range(0, imgs.shape[0], window):
            feats = backbone(imgs[s : s + window])
            mask_features, _, multi_scale = pix.forward_features(feats)
            outs.append((pred(multi_scale, mask_features), mask_features))
    merged = {
        "pred_logits": torch.cat([o["pred_logits"] for o, _ in outs], dim=1),
        "pred_masks": torch.cat([o["pred_masks"] for o, _ in outs], dim=2),
        "pred_embds": torch.cat([o["pred_embds"] for o, _ in outs], dim=2),
    }
    return merged, outs


def _ref_rows(oracle_cls, cfg, sample, mask_cls, mask_pred, pred_id=None):
    """reference inference_video(_vis) -> evaluator-format rows."""
    self_ns = types.SimpleNamespace(
        sem_seg_head=types.SimpleNamespace(num_classes=cfg.model.num_classes),
        device=torch.device("cpu"),
        num_queries=cfg.model.transformer_decoder.num_queries,
        max_num=TOPK,
    )
    H, W = sample["images"].shape[1:3]
    h, w = [int(v) for v in sample["image_size"]]
    if pred_id is None:
        out = oracle_cls.inference_video(
            self_ns, mask_cls, mask_pred, (h, w),
            int(sample["height"]), int(sample["width"]), (H, W),
        )
    else:
        out = oracle_cls.inference_video_vis(
            self_ns, mask_cls, mask_pred, (h, w),
            int(sample["height"]), int(sample["width"]), (H, W), pred_id,
        )
    return [
        {
            "score": float(s),
            "label": int(l),
            "mask": m.numpy().astype(bool),
        }
        for s, l, m in zip(out["pred_scores"], out["pred_labels"], out["pred_masks"])
    ]


def _our_rows(cfg, tmp_path, sd):
    """The real product surface: train_net_video.do_eval with the reference
    .pth on disk (exercises checkpoint conversion, loader, windowed driver,
    paged top-K, evaluator json)."""
    import train_net_video

    pth = os.path.join(str(tmp_path), "ref_weights.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)
    cfg.weights = pth
    cfg.output_dir = os.path.join(str(tmp_path), "out")
    res = train_net_video.do_eval(cfg, None)
    assert "synth_train" in res
    with open(
        os.path.join(cfg.output_dir, "inference", "synth_train", "results.json")
    ) as f:
        return json.load(f)


def _compare(ref_by_video, our_json, md):
    """Row-for-row diff: same count, same labels, score parity, mask pixel
    agreement (binarize-at-0 flips only where |logit| ~ fp32 drift)."""
    from dvis_plus_tpu.utils import rle as rle_codec

    reverse = {v: k for k, v in md.thing_dataset_id_to_contiguous_id.items()}
    ours_by_video = {}
    for row in our_json:
        ours_by_video.setdefault(row["video_id"], []).append(row)
    assert set(ours_by_video) == set(ref_by_video)
    for vid, ref_rows in ref_by_video.items():
        ours = ours_by_video[vid]
        assert len(ours) == len(ref_rows) == TOPK
        ref_sorted = sorted(ref_rows, key=lambda r: (-r["score"], r["label"]))
        our_sorted = sorted(
            ours, key=lambda r: (-r["score"], r["category_id"])
        )
        for r, o in zip(ref_sorted, our_sorted):
            assert o["score"] == pytest.approx(r["score"], rel=SCORE_RTOL, abs=1e-5)
            assert o["category_id"] == reverse.get(r["label"], r["label"] + 1)
            om = np.stack(
                [
                    rle_codec.decode(
                        {"size": s["size"], "counts": s["counts"].encode("ascii")}
                    ).astype(bool)
                    if s is not None
                    else np.zeros(r["mask"].shape[1:], bool)
                    for s in o["segmentations"]
                ]
            )
            agree = float((om == r["mask"]).mean())
            assert agree >= PIXEL_AGREE, (vid, r["score"], agree)


@pytest.fixture(scope="module")
def loader_samples():
    def make(cfg):
        from dvis_plus_tpu.data.build import build_test_loader

        return list(build_test_loader(cfg, "synth_train"))

    return make


def test_fullstack_minvis(synth_dataset, tmp_path, loader_samples):  # noqa: F811
    """images -> segmenter windows -> frame alignment -> top-10 -> RLE json,
    ours (do_eval) vs the reference MinVIS eval pipeline (:156-231)."""
    from parity_check import synthetic_reference_state_dict
    from refshim import load_meta_architecture_oracle

    from dvis_plus_tpu.data.catalog import get_metadata

    cfg = _cfg("minvis")
    sd = synthetic_reference_state_dict(cfg)
    oracle = load_meta_architecture_oracle()
    backbone, pix, pred, _ = _build_ref_modules(cfg, sd, with_tracker=False)

    ref_by_video = {}
    for sample in loader_samples(cfg):
        imgs = torch.from_numpy(
            np.ascontiguousarray(sample["images"].transpose(0, 3, 1, 2))
        )
        merged, _ = _ref_segmenter_windows(
            backbone, pix, pred, imgs, cfg.test.window_size
        )
        # MinVIS.post_processing (:266-301): per-frame embedding alignment
        ns = types.SimpleNamespace()
        ns.match_from_embds = functools.partial(oracle.MinVIS.match_from_embds, ns)
        out = oracle.MinVIS.post_processing(ns, merged)
        ref_by_video[int(sample["video_id"])] = _ref_rows(
            oracle.MinVIS, cfg, sample, out["pred_logits"][0], out["pred_masks"][0]
        )

    our_json = _our_rows(cfg, tmp_path, sd)
    _compare(ref_by_video, our_json, get_metadata("synth_train"))


def test_fullstack_dvis_online(synth_dataset, tmp_path, loader_samples):  # noqa: F811
    """The streaming arch: tracker carry crosses windows (reference
    run_window_inference resume=True for every window after the first,
    :774-816) -> mean-logit post_processing -> top-K -> RLE json."""
    from parity_check import synthetic_reference_state_dict
    from refshim import load_meta_architecture_oracle

    from dvis_plus_tpu.data.catalog import get_metadata

    cfg = _cfg("dvis_online")
    sd = synthetic_reference_state_dict(cfg)
    oracle = load_meta_architecture_oracle()
    backbone, pix, pred, tracker = _build_ref_modules(cfg, sd, with_tracker=True)

    ref_by_video = {}
    for sample in loader_samples(cfg):
        imgs = torch.from_numpy(
            np.ascontiguousarray(sample["images"].transpose(0, 3, 1, 2))
        )
        outs = []
        with torch.no_grad():
            for i, s in enumerate(range(0, imgs.shape[0], cfg.test.window_size)):
                feats = backbone(imgs[s : s + cfg.test.window_size])
                mask_features, _, multi_scale = pix.forward_features(feats)
                po = pred(multi_scale, mask_features)
                outs.append(
                    tracker(
                        po["pred_embds"],
                        mask_features.unsqueeze(0),
                        resume=(i != 0),
                        frame_embeds_no_norm=po["pred_embds_without_norm"],
                    )
                )
        merged = {
            "pred_logits": torch.cat([o["pred_logits"] for o in outs], dim=1),
            "pred_masks": torch.cat([o["pred_masks"] for o in outs], dim=2),
        }
        # DVIS post_processing (:758-773): time-mean logits + query ids
        ns = types.SimpleNamespace()
        out = oracle.DVIS_Plus_online.post_processing(ns, merged)
        ref_by_video[int(sample["video_id"])] = _ref_rows(
            oracle.DVIS_Plus_online, cfg, sample,
            out["pred_logits"][0], out["pred_masks"][0], pred_id=out["ids"][0],
        )

    our_json = _our_rows(cfg, tmp_path, sd)
    _compare(ref_by_video, our_json, get_metadata("synth_train"))
