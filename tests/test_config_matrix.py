"""Config library CI matrix: every shipped YAML must parse through the _BASE_
chain and build its model object (VERDICT missing #10 / next-round task 2).
Full train/eval e2e per *architecture family* is covered by
test_cli_inference / test_ov_cli / test_daq / test_overfit_e2e."""
import glob
import os

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True))
CONFIGS = [c for c in CONFIGS if os.path.basename(c) != "base_video.yaml"]


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(c, REPO) for c in CONFIGS])
def test_config_loads_and_builds(path):
    from dvis_plus_tpu.core.config import load_config

    cfg = load_config(path)
    assert cfg.model.num_classes > 0
    assert len(cfg.datasets.train) >= 1 and len(cfg.datasets.test) >= 1

    if "configs/ov" in path.replace(os.sep, "/"):
        cfg.model.ov.enabled = True
        from train_net_video_ov import build_ov_model

        model = build_ov_model(cfg)
    else:
        from train_net_video import build_model

        model = build_model(cfg)
    assert model is not None

    # consistency: offline stages freeze the earlier stages
    if cfg.model.meta_architecture in ("dvis_offline", "daq_offline"):
        assert cfg.model.freeze, path
    # task routing matches dataset types
    if cfg.test.task == "vps":
        assert "video_panoptic" in cfg.datasets.dataset_type_test
    if cfg.test.task == "vss":
        assert "video_semantic" in cfg.datasets.dataset_type_test


def test_config_count_covers_zoo():
    assert len(CONFIGS) >= 40, len(CONFIGS)
