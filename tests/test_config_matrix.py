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


# Hand-written zoo-row -> config table (VERDICT r2 next-round #4): every
# BASELINE.md quality row must map to a runnable config. Keys are
# (family, dataset, backbone, mode) as the MODEL_ZOO tables name them.
ZOO_ROWS = {
    # --- DVIS++ close-vocab (DVIS_Plus/MODEL_ZOO.md) ---
    ("dvis", "ovis", "r50", "online"): "dvis/dvis_online_r50_ovis.yaml",
    ("dvis", "ovis", "r50", "offline"): "dvis/dvis_offline_r50_ovis.yaml",
    ("dvis", "ovis", "vitl", "online"): "dvis/dvis_online_vitl_ovis.yaml",
    ("dvis", "ovis", "vitl", "offline"): "dvis/dvis_offline_vitl_ovis.yaml",
    ("dvis", "ytvis19", "r50", "online"): "dvis/dvis_online_r50_ytvis19.yaml",
    ("dvis", "ytvis19", "r50", "offline"): "dvis/dvis_offline_r50_ytvis19.yaml",
    ("dvis", "ytvis19", "vitl", "online"): "dvis/dvis_online_vitl_ytvis19.yaml",
    ("dvis", "ytvis19", "vitl", "offline"): "dvis/dvis_offline_vitl_ytvis19.yaml",
    ("dvis", "ytvis21", "r50", "online"): "dvis/dvis_online_r50_ytvis21.yaml",
    ("dvis", "ytvis21", "r50", "offline"): "dvis/dvis_offline_r50_ytvis21.yaml",
    ("dvis", "ytvis21", "vitl", "online"): "dvis/dvis_online_vitl_ytvis21.yaml",
    ("dvis", "ytvis21", "vitl", "offline"): "dvis/dvis_offline_vitl_ytvis21.yaml",
    ("dvis", "ytvis22", "vitl", "online"): "dvis/dvis_online_vitl_ytvis22eval.yaml",
    ("dvis", "vipseg", "r50", "online"): "dvis/dvis_online_r50_vipseg.yaml",
    ("dvis", "vipseg", "r50", "offline"): "dvis/dvis_offline_r50_vipseg.yaml",
    ("dvis", "vipseg", "vitl", "online"): "dvis/dvis_online_vitl_vipseg.yaml",
    ("dvis", "vipseg", "vitl", "offline"): "dvis/dvis_offline_vitl_vipseg.yaml",
    ("dvis", "vspw", "r50", "online"): "dvis/dvis_online_r50_vspw.yaml",
    ("dvis", "vspw", "r50", "offline"): "dvis/dvis_offline_r50_vspw.yaml",
    ("dvis", "vspw", "vitl", "online"): "dvis/dvis_online_vitl_vspw.yaml",
    ("dvis", "vspw", "vitl", "offline"): "dvis/dvis_offline_vitl_vspw.yaml",
    # Swin-L rows (DVIS_DAQ/configs/dvis_Plus/ovis/swim)
    ("dvis", "ovis", "swinl", "online"): "dvis/dvis_online_swinl_ovis.yaml",
    ("dvis", "ovis", "swinl", "offline"): "dvis/dvis_offline_swinl_ovis.yaml",
    # stage-1 recipes (CTVIS / MinVIS per dataset+backbone)
    ("ctvis", "ovis", "r50", "online"): "dvis/ctvis_r50_ovis.yaml",
    ("ctvis", "ovis", "vitl", "online"): "dvis/ctvis_vitl_ovis.yaml",
    ("ctvis", "ytvis19", "r50", "online"): "dvis/ctvis_r50_ytvis19.yaml",
    ("ctvis", "ytvis19", "vitl", "online"): "dvis/ctvis_vitl_ytvis19.yaml",
    ("ctvis", "ytvis21", "r50", "online"): "dvis/ctvis_r50_ytvis21.yaml",
    ("ctvis", "ytvis21", "vitl", "online"): "dvis/ctvis_vitl_ytvis21.yaml",
    ("ctvis", "vipseg", "r50", "online"): "dvis/ctvis_r50_vipseg.yaml",
    ("ctvis", "vipseg", "vitl", "online"): "dvis/ctvis_vitl_vipseg.yaml",
    ("ctvis", "vspw", "r50", "online"): "dvis/ctvis_r50_vspw.yaml",
    ("ctvis", "vspw", "vitl", "online"): "dvis/ctvis_vitl_vspw.yaml",
    ("minvis", "ovis", "r50", "online"): "dvis/minvis_r50_ovis.yaml",
    ("minvis", "ovis", "vitl", "online"): "dvis/minvis_vitl_ovis.yaml",
    ("minvis", "ytvis19", "r50", "online"): "dvis/minvis_r50_ytvis19.yaml",
    ("minvis", "ytvis19", "vitl", "online"): "dvis/minvis_vitl_ytvis19.yaml",
    ("minvis", "ytvis21", "r50", "online"): "dvis/minvis_r50_ytvis21.yaml",
    ("minvis", "ytvis21", "vitl", "online"): "dvis/minvis_vitl_ytvis21.yaml",
    ("minvis", "vipseg", "r50", "online"): "dvis/minvis_r50_vipseg.yaml",
    ("minvis", "vipseg", "vitl", "online"): "dvis/minvis_vitl_vipseg.yaml",
    ("minvis", "vspw", "r50", "online"): "dvis/minvis_r50_vspw.yaml",
    ("minvis", "vspw", "vitl", "online"): "dvis/minvis_vitl_vspw.yaml",
    # --- DVIS-DAQ (DVIS_DAQ/MODEL_ZOO.md) ---
    ("daq", "ovis", "r50", "online"): "daq/daq_online_r50_ovis.yaml",
    ("daq", "ovis", "r50", "offline"): "daq/daq_offline_r50_ovis.yaml",
    ("daq", "ovis", "swinl", "online"): "daq/daq_online_swinl_ovis.yaml",
    ("daq", "ovis", "vitl", "online"): "daq/daq_online_vitl_ovis.yaml",
    ("daq", "ovis", "vitl", "offline"): "daq/daq_offline_vitl_ovis.yaml",
    ("daq", "ytvis19", "r50", "online"): "daq/daq_online_r50_ytvis19.yaml",
    ("daq", "ytvis19", "swinl", "online"): "daq/daq_online_swinl_ytvis19.yaml",
    ("daq", "ytvis19", "vitl", "online"): "daq/daq_online_vitl_ytvis19.yaml",
    ("daq", "ytvis19", "vitl", "offline"): "daq/daq_offline_vitl_ytvis19.yaml",
    ("daq", "ytvis21", "r50", "online"): "daq/daq_online_r50_ytvis21.yaml",
    ("daq", "ytvis21", "swinl", "online"): "daq/daq_online_swinl_ytvis21.yaml",
    ("daq", "ytvis21", "vitl", "online"): "daq/daq_online_vitl_ytvis21.yaml",
    ("daq", "ytvis21", "vitl", "offline"): "daq/daq_offline_vitl_ytvis21.yaml",
    ("daq", "vipseg", "r50", "online"): "daq/daq_online_r50_vipseg.yaml",
    ("daq", "vipseg", "vitl", "online"): "daq/daq_online_vitl_vipseg.yaml",
    ("daq", "ytvos", "r50", "vos"): "daq/daq_vos_r50_ytvos.yaml",
    ("daq", "mose", "vitl", "vos-online"): "daq/daq_vos_vitl_mose_online.yaml",
    ("daq", "mose", "vitl", "vos-offline"): "daq/daq_vos_vitl_mose_offline.yaml",
    # --- OV-DVIS++ (DVIS_Plus/MODEL_ZOO.md:516-620) ---
    ("ov-zs", "ovis", "r50", "online"): "ov/ov_online_r50_zeroshot_ovis.yaml",
    ("ov-zs", "ovis", "r50", "offline"): "ov/ov_offline_r50_zeroshot_ovis.yaml",
    ("ov-zs", "ytvis19", "r50", "online"): "ov/ov_online_r50_zeroshot_ytvis19.yaml",
    ("ov-zs", "ytvis19", "r50", "offline"): "ov/ov_offline_r50_zeroshot_ytvis19.yaml",
    ("ov-zs", "ytvis21", "r50", "online"): "ov/ov_online_r50_zeroshot_ytvis21.yaml",
    ("ov-zs", "ytvis21", "r50", "offline"): "ov/ov_offline_r50_zeroshot_ytvis21.yaml",
    ("ov-zs", "vipseg", "r50", "online"): "ov/ov_online_r50_zeroshot_vipseg.yaml",
    ("ov-zs", "vipseg", "r50", "offline"): "ov/ov_offline_r50_zeroshot_vipseg.yaml",
    ("ov-zs", "vspw", "r50", "online"): "ov/ov_online_r50_zeroshot_vspw.yaml",
    ("ov-zs", "vspw", "r50", "offline"): "ov/ov_offline_r50_zeroshot_vspw.yaml",
    ("ov-zs", "ovis", "convnextl", "online"): "ov/ov_online_convnextl_zeroshot_ovis.yaml",
    ("ov-zs", "ovis", "convnextl", "offline"): "ov/ov_offline_convnextl_zeroshot_ovis.yaml",
    ("ov-zs", "ytvis19", "convnextl", "online"): "ov/ov_online_convnextl_zeroshot_ytvis19.yaml",
    ("ov-zs", "ytvis19", "convnextl", "offline"): "ov/ov_offline_convnextl_zeroshot_ytvis19.yaml",
    ("ov-zs", "ytvis21", "convnextl", "online"): "ov/ov_online_convnextl_zeroshot_ytvis21.yaml",
    ("ov-zs", "ytvis21", "convnextl", "offline"): "ov/ov_offline_convnextl_zeroshot_ytvis21.yaml",
    ("ov-zs", "vipseg", "convnextl", "online"): "ov/ov_online_convnextl_zeroshot_vipseg.yaml",
    ("ov-zs", "vipseg", "convnextl", "offline"): "ov/ov_offline_convnextl_zeroshot_vipseg.yaml",
    ("ov-zs", "vspw", "convnextl", "online"): "ov/ov_online_convnextl_zeroshot_vspw.yaml",
    ("ov-zs", "vspw", "convnextl", "offline"): "ov/ov_offline_convnextl_zeroshot_vspw.yaml",
    ("ov-zs", "lvvis", "convnextl", "online"): "ov/ov_online_convnextl_zeroshot_lvvis.yaml",
    ("ov-zs", "lvvis", "convnextl", "offline"): "ov/ov_offline_convnextl_zeroshot_lvvis.yaml",
    ("ov-sup", "coco", "convnextl", "online"): "ov/ov_online_convnextl_coco.yaml",
    ("ov-sup", "coco", "convnextl", "offline"): "ov/ov_offline_convnextl_coco.yaml",
    ("ov-sup", "ovis", "convnextl", "online"): "ov/ov_online_convnextl_ovis.yaml",
    ("ov-sup", "ovis", "convnextl", "offline"): "ov/ov_offline_convnextl_ovis.yaml",
    ("ov-sup", "ytvis19", "convnextl", "online"): "ov/ov_online_convnextl_ytvis19.yaml",
    ("ov-sup", "ytvis19", "convnextl", "offline"): "ov/ov_offline_convnextl_ytvis19.yaml",
    ("ov-sup", "ytvis21", "convnextl", "online"): "ov/ov_online_convnextl_ytvis21.yaml",
    ("ov-sup", "ytvis21", "convnextl", "offline"): "ov/ov_offline_convnextl_ytvis21.yaml",
    ("ov-sup", "vipseg", "convnextl", "online"): "ov/ov_online_convnextl_vipseg.yaml",
    ("ov-sup", "vipseg", "convnextl", "offline"): "ov/ov_offline_convnextl_vipseg.yaml",
    ("ov-sup", "vspw", "convnextl", "online"): "ov/ov_online_convnextl_vspw.yaml",
    ("ov-sup", "vspw", "convnextl", "offline"): "ov/ov_offline_convnextl_vspw.yaml",
    # FC-CLIP segmenter stage (reference configs/open_vocabulary/FC-CLIP_*.yaml
    # + R50/ variants) and the supervised 5-dataset mixture recipes
    ("fcclip", "coco", "convnextl", "zero-shot"): "ov/fcclip_convnextl_coco.yaml",
    ("fcclip", "coco", "r50", "zero-shot"): "ov/fcclip_r50_coco.yaml",
    ("fcclip", "mixture", "convnextl", "supervised"): "ov/fcclip_convnextl_supervised.yaml",
    ("fcclip", "mixture", "r50", "supervised"): "ov/fcclip_r50_supervised.yaml",
    ("ov-sup", "mixture", "convnextl", "online"): "ov/ov_online_convnextl_supervised.yaml",
    ("ov-sup", "mixture", "convnextl", "offline"): "ov/ov_offline_convnextl_supervised.yaml",
    # OV-MinVIS zero-shot eval rows (reference
    # configs/open_vocabulary/test/{zero_shot,R50/zero_shot}/minvis_*eval.yaml)
    ("ov-zs-minvis", "ovis", "convnextl", "eval"): "ov/ov_minvis_convnextl_zeroshot_ovis.yaml",
    ("ov-zs-minvis", "ytvis19", "convnextl", "eval"): "ov/ov_minvis_convnextl_zeroshot_ytvis19.yaml",
    ("ov-zs-minvis", "ytvis21", "convnextl", "eval"): "ov/ov_minvis_convnextl_zeroshot_ytvis21.yaml",
    ("ov-zs-minvis", "vipseg", "convnextl", "eval"): "ov/ov_minvis_convnextl_zeroshot_vipseg.yaml",
    ("ov-zs-minvis", "vspw", "convnextl", "eval"): "ov/ov_minvis_convnextl_zeroshot_vspw.yaml",
    ("ov-zs-minvis", "ovis", "r50", "eval"): "ov/ov_minvis_r50_zeroshot_ovis.yaml",
    ("ov-zs-minvis", "ytvis19", "r50", "eval"): "ov/ov_minvis_r50_zeroshot_ytvis19.yaml",
    ("ov-zs-minvis", "ytvis21", "r50", "eval"): "ov/ov_minvis_r50_zeroshot_ytvis21.yaml",
}


def test_every_zoo_row_has_a_config():
    missing = {
        row: rel
        for row, rel in ZOO_ROWS.items()
        if not os.path.exists(os.path.join(REPO, "configs", rel))
    }
    assert not missing, missing


def test_zoo_row_configs_name_registered_datasets():
    """Every mapped config's train/test dataset names must exist in the data
    catalog after CLI registration (catches stale names like the former
    ytvos_2018_train)."""
    from dvis_plus_tpu.core.config import load_config
    from dvis_plus_tpu.data import catalog
    from train_net_video import register_all_datasets

    register_all_datasets()
    known = set(catalog._DATASETS)
    bad = {}
    for row, rel in sorted(set(ZOO_ROWS.items())):
        cfg = load_config(os.path.join(REPO, "configs", rel))
        names = list(cfg.datasets.train) + list(cfg.datasets.test)
        unknown = [n for n in names if n not in known]
        if unknown:
            bad[rel] = unknown
    assert not bad, bad
