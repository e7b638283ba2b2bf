"""Device-parallel eval (engine/parallel_eval.py): video-parallel fan-out over
local devices must produce byte-identical results files to a sequential run
(the reference gets the same guarantee from DDP InferenceSampler + gather).

Runs on the conftest 8-device CPU mesh.
"""
import json
import os

import pytest

pytestmark = pytest.mark.slow

from dvis_plus_tpu.data.build import build_test_loader
from dvis_plus_tpu.data.catalog import get_metadata

from tests.test_cli_inference import tiny_cfg
from tests.test_data import synth_dataset, make_cfg  # noqa: F401  (fixture)


def _run_eval(cfg, tmp_dir, params, model):
    from train_net_video import run_task_eval

    cfg.output_dir = str(tmp_dir)
    loader = build_test_loader(cfg, "synth_train")
    res = run_task_eval(cfg, model, params, loader, "synth_train", "video_instance")
    with open(os.path.join(str(tmp_dir), "inference", "synth_train", "results.json")) as f:
        return res, json.load(f)


def test_parallel_eval_matches_sequential(synth_dataset, tmp_path):  # noqa: F811
    import jax

    from train_net_video import build_model, init_params

    cfg = tiny_cfg("minvis")
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))

    cfg.test.eval_devices = 1
    res1, rows1 = _run_eval(cfg, tmp_path / "seq", params, model)
    assert len(jax.local_devices()) >= 4, "conftest should provide 8 CPU devices"
    cfg.test.eval_devices = 4
    res4, rows4 = _run_eval(cfg, tmp_path / "par", params, model)

    assert rows1 == rows4  # same rows, same (dataset) order
    assert res1["AP"] == res4["AP"]


def test_parallel_eval_rejects_sp_conflict(synth_dataset, tmp_path):  # noqa: F811
    import jax

    from train_net_video import build_model, init_params

    cfg = tiny_cfg("dvis_offline")
    cfg.test.eval_devices = 2
    cfg.test.refiner_shard_devices = 2
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    with pytest.raises(ValueError):
        _run_eval(cfg, tmp_path, params, model)


def test_recording_evaluator_replay_order():
    from dvis_plus_tpu.engine.parallel_eval import RecordingEvaluator

    class Sink:
        def __init__(self):
            self.seen = []

        def process(self, x):
            self.seen.append(x)

    # 3 workers, strided shards of 7 videos: worker i got videos i, i+3, ...
    buffers = [RecordingEvaluator() for _ in range(3)]
    for vid in range(7):
        buffers[vid % 3].process(vid)
    ordered = []
    j = 0
    while True:
        emitted = False
        for b in buffers:
            if j < len(b.calls):
                ordered.append(b.calls[j])
                emitted = True
        if not emitted:
            break
        j += 1
    sink = Sink()
    buffers[0].replay_into(sink, ordered)
    assert sink.seen == list(range(7))
