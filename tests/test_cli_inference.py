"""End-to-end eval path: synthetic dataset -> windowed inference -> evaluator
-> AP scoring, for MinVIS and DVIS online, on a tiny model."""
import json
import os

import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.build import build_test_loader
from dvis_plus_tpu.data.catalog import get_metadata, is_registered
from dvis_plus_tpu.engine.inference import run_vis_inference
from dvis_plus_tpu.evaluation.evaluators import YTVISEvaluator

from tests.test_data import synth_dataset, make_cfg  # noqa: F401  (fixture)


def tiny_cfg(arch):
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
    cfg.model.tracker.num_layers = 1
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.refiner.num_layers = 1
    cfg.model.refiner.feedforward_dim = 64
    cfg.test.window_size = 4
    cfg.test.max_num = 5
    return cfg


@pytest.mark.parametrize("arch", ["minvis", "dvis_online", "dvis_offline"])
def test_eval_path(arch, synth_dataset, tmp_path):  # noqa: F811
    import jax

    from train_net_video import build_model, init_params

    cfg = tiny_cfg(arch)
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))

    md = get_metadata("synth_train")
    evaluator = YTVISEvaluator(
        "synth_train",
        str(tmp_path),
        contiguous_to_dataset_id={v: k for k, v in md.thing_dataset_id_to_contiguous_id.items()},
        gt_json=md.json_file,
    )
    loader = build_test_loader(cfg, "synth_train")
    run_vis_inference(cfg, model, params, loader, evaluator)
    res = evaluator.evaluate()
    # untrained model: AP is meaningless, but the whole pipeline must produce
    # a valid results.json with per-frame RLEs for every video
    assert os.path.exists(os.path.join(str(tmp_path), "results.json"))
    with open(os.path.join(str(tmp_path), "results.json")) as f:
        rows = json.load(f)
    assert len(rows) == 2 * cfg.test.max_num
    assert all(len(r["segmentations"]) == 6 for r in rows)
    assert "AP" in res
