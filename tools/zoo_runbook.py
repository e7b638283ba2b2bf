"""One-command real-weights parity runbook (zoo .pth -> verdict).

The day reference MODEL_ZOO checkpoints (or network access) appear, this is
the single command that turns one into a parity verdict
(reference download table: DVIS_Plus/MODEL_ZOO.md; reference eval:
GETTING_STARTED.md "Evaluation" + train_net_video.py --eval-only):

  python tools/zoo_runbook.py \
      --config-file configs/dvis/dvis_online_r50_ytvis19.yaml \
      --weights /path/to/zoo_row.pth \
      [--ref-results /path/to/reference_results.json] \
      [key.path=value ...]

Stages (each prints a [runbook] line; any failure exits non-zero):
  1. convert   — torch .pth -> flax param tree (core/zoo_convert.py) with a
                 coverage report; FAILS on shape mismatches or unfilled
                 params (modulo frozen-BN stats, which fold into the conv).
  2. eval      — the real product surface: train_net_video.do_eval (loader,
                 windowed streaming driver, paged top-K, evaluator) writes
                 <out>/inference/<dataset>/results.json and scores it
                 in-process when GT is on disk.
  3. diff      — row-level results.json comparison against a
                 reference-produced results.json (--ref-results: run the
                 reference repo's --eval-only on the same weights/dataset
                 and point at its results.json): row counts, categories,
                 score parity, per-mask pixel agreement via the RLE codec.

``--dry-run`` proves the whole command path TODAY without zoo files: it
synthesizes a reference-keyed checkpoint (tools/parity_check.py) and a
synthetic on-disk YTVIS dataset (tools/synth_data.py), shrinks the model
dims for CPU speed, then runs stages 1-3 (stage 3 against our own output,
exercising the differ). Full-size converter fidelity and true
reference-executed output parity are covered by
tests/test_weight_converters.py and tests/test_fullstack_reference_parity.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def log(msg):
    print(f"[runbook] {msg}", flush=True)


def stage_convert(cfg, weights_path: str, synthetic: bool):
    """Stage 1: convert + coverage. Returns the reference state dict."""
    from parity_check import coverage_report, synthetic_reference_state_dict

    import jax

    from dvis_plus_tpu.core.checkpoint import load_torch_state_dict
    from dvis_plus_tpu.core.zoo_convert import convert_reference_checkpoint
    from train_net_video import build_model, init_params

    if synthetic:
        sd = synthetic_reference_state_dict(cfg)
    else:
        sd = load_torch_state_dict(weights_path)
    converted = convert_reference_checkpoint(sd, cfg)
    model = build_model(cfg)
    init = init_params(cfg, model, jax.random.key(0))
    rep = coverage_report(converted, init)
    log(
        f"convert: filled {rep['filled']}/{rep['total_params']} params, "
        f"{len(rep['mismatched'])} mismatched, "
        f"{len(rep['left_at_init'])} left at init"
    )
    if rep["mismatched"]:
        raise SystemExit(
            f"[runbook] FAIL convert: shape mismatches {rep['mismatched'][:10]}"
        )
    if rep["left_at_init"]:
        raise SystemExit(
            f"[runbook] FAIL convert: params left at init "
            f"{rep['left_at_init'][:20]}"
        )
    return sd


def stage_eval(cfg) -> str:
    """Stage 2: the real eval CLI path. Returns results.json path."""
    import train_net_video

    res = train_net_video.do_eval(cfg, None)
    dataset = cfg.datasets.test[0]
    path = os.path.join(cfg.output_dir, "inference", dataset, "results.json")
    assert os.path.exists(path), path
    log(f"eval: {dataset} -> {path} (scores: {res.get(dataset)})")
    return path


def stage_diff(our_path: str, ref_path: str, score_rtol=1e-3,
               min_pixel_agree=0.995) -> dict:
    """Stage 3: row-level diff of two YTVIS-format results.json files.

    Thresholds follow tests/test_fullstack_reference_parity.py: fp32
    reduction-order drift through the full stack stays orders of magnitude
    below SCORE_RTOL=1e-3, and binarize-at-0 pixel flips only happen where
    |mask logit| ~ drift (>=99.5% pixel agreement on real masks)."""
    from dvis_plus_tpu.utils import rle as rle_codec

    def load(path):
        with open(path) as f:
            rows = json.load(f)
        by_video = {}
        for r in rows:
            by_video.setdefault(int(r["video_id"]), []).append(r)
        for v in by_video.values():
            v.sort(key=lambda r: (-r["score"], r["category_id"]))
        return by_video

    ours, ref = load(our_path), load(ref_path)
    if set(ours) != set(ref):
        raise SystemExit(
            f"[runbook] FAIL diff: video sets differ "
            f"(ours-only {sorted(set(ours) - set(ref))[:5]}, "
            f"ref-only {sorted(set(ref) - set(ours))[:5]})"
        )

    def decode(seg, hw):
        if seg is None:
            return np.zeros(hw, bool)
        counts = seg["counts"]
        if isinstance(counts, str):
            counts = counts.encode("ascii")
        return rle_codec.decode({"size": seg["size"], "counts": counts}).astype(bool)

    n_rows = 0
    max_score_rel = 0.0
    min_agree = 1.0
    cat_mismatch = 0
    for vid in sorted(ref):
        if len(ours[vid]) != len(ref[vid]):
            raise SystemExit(
                f"[runbook] FAIL diff: video {vid} row count "
                f"{len(ours[vid])} vs {len(ref[vid])}"
            )
        for o, r in zip(ours[vid], ref[vid]):
            n_rows += 1
            denom = max(abs(r["score"]), 1e-5)
            max_score_rel = max(max_score_rel, abs(o["score"] - r["score"]) / denom)
            if o["category_id"] != r["category_id"]:
                cat_mismatch += 1
            hw = None
            for s in r["segmentations"]:
                if s is not None:
                    hw = tuple(s["size"])
                    break
            if hw is None:
                continue
            om = np.stack([decode(s, hw) for s in o["segmentations"]])
            rm = np.stack([decode(s, hw) for s in r["segmentations"]])
            min_agree = min(min_agree, float((om == rm).mean()))
    summary = {
        "videos": len(ref),
        "rows": n_rows,
        "max_score_rel": max_score_rel,
        "min_pixel_agree": min_agree,
        "category_mismatches": cat_mismatch,
        "ok": (
            max_score_rel <= score_rtol
            and min_agree >= min_pixel_agree
            and cat_mismatch == 0
        ),
    }
    log(f"diff: {json.dumps(summary)}")
    if not summary["ok"]:
        raise SystemExit("[runbook] FAIL diff: outside parity thresholds")
    return summary


_DRY_RUN_OPTS = [
    # CPU-sized dims; the command PATH is identical to the real-weights run
    "model.compute_dtype=float32",
    "model.pixel_decoder.conv_dim=32", "model.pixel_decoder.mask_dim=32",
    "model.pixel_decoder.transformer_enc_layers=1",
    "model.pixel_decoder.transformer_dim_feedforward=64",
    "model.transformer_decoder.hidden_dim=32",
    "model.transformer_decoder.num_queries=8",
    "model.transformer_decoder.nheads=4",
    "model.transformer_decoder.dim_feedforward=64",
    "model.transformer_decoder.dec_layers=2",
    "model.transformer_decoder.mask_dim=32",
    "model.transformer_decoder.reid_hidden_dim=64",
    "model.tracker.num_layers=2", "model.tracker.num_heads=4",
    "model.tracker.feedforward_dim=64",
    "input.min_size_test=64", "input.max_size_test=96",
    "input.min_size_train=[64]", "input.max_size_train=96",
    "input.sampling_frame_num=3",
    "test.window_size=3", "test.max_num=5",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file",
                    default="configs/dvis/dvis_online_r50_ytvis19.yaml")
    ap.add_argument("--weights", default="")
    ap.add_argument("--ref-results", default="",
                    help="reference-produced results.json to diff against")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic weights + dataset; prove the command path")
    ap.add_argument("--output-dir", default="")
    ap.add_argument("--score-rtol", type=float, default=1e-3)
    ap.add_argument("--pixel-agree", type=float, default=0.995)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from dvis_plus_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    import tempfile

    from dvis_plus_tpu.core.config import load_config

    repo = os.path.join(os.path.dirname(__file__), "..")
    opts = list(args.opts)
    workdir = args.output_dir or tempfile.mkdtemp(prefix="zoo_runbook_")

    if args.dry_run:
        opts = _DRY_RUN_OPTS + opts
        # synthetic on-disk dataset under DVIS_DATASETS
        from synth_data import make_ytvis

        from dvis_plus_tpu.data.datasets.categories import YTVIS_2019_CLASSES

        data_root = os.path.join(workdir, "datasets")
        make_ytvis(data_root, "ytvis_2019", YTVIS_2019_CLASSES,
                   splits=("train", "valid"))
        os.environ["DVIS_DATASETS"] = data_root
        log(f"dry-run: synthetic ytvis_2019 at {data_root}")

    cfg = load_config(os.path.join(repo, args.config_file), opts)
    cfg.output_dir = os.path.join(workdir, "out")

    # stage 1: convert + coverage
    sd = stage_convert(cfg, args.weights, synthetic=args.dry_run)
    if args.dry_run:
        import torch

        pth = os.path.join(workdir, "synthetic_zoo.pth")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)
        cfg.weights = pth
        log(f"dry-run: synthetic reference-keyed checkpoint at {pth}")
    else:
        assert args.weights, "--weights required (or --dry-run)"
        cfg.weights = args.weights

    # stage 2: real eval CLI -> results.json
    results_path = stage_eval(cfg)

    # stage 3: diff vs reference output
    ref_results = args.ref_results
    if args.dry_run and not ref_results:
        # exercise the differ against our own output (identity must pass);
        # true reference-executed parity is tests/test_fullstack_reference_parity.py
        ref_results = results_path
    if ref_results:
        stage_diff(results_path, ref_results, args.score_rtol, args.pixel_agree)
    else:
        log("diff: skipped (--ref-results not given); run the reference's "
            "--eval-only on the same weights and pass its results.json")
    log("OK")


if __name__ == "__main__":
    main()
