"""OV-DVIS++ CLI end-to-end: real train steps + ensemble eval (VERDICT
missing #4: reference train_net_video_ov.py trains and evals; the ensemble
driver calls ov_ensemble_inference + pool_clip, meta_architecture_ov.py
:566-645)."""
import argparse
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e lane; CI runs the full suite

from tests.test_data import synth_dataset, make_cfg  # noqa: F401


def ov_tiny_cfg(arch):
    cfg = make_cfg()
    cfg.model.meta_architecture = arch
    cfg.model.ov.enabled = True
    cfg.model.ov.clip_embed_dim = 24
    cfg.model.num_classes = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.backbone.clip_depths = (1, 1, 1, 1)
    cfg.model.backbone.clip_dims = (8, 16, 24, 32)
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
    cfg.model.criterion.train_num_points = 64
    cfg.solver.max_iter = 2
    cfg.solver.ims_per_batch = 1
    cfg.solver.checkpoint_period = 1000
    cfg.datasets.train = ("synth_train",)
    cfg.datasets.test = ("synth_train",)
    cfg.test.window_size = 3
    cfg.test.max_num = 5
    return cfg


def _args():
    return argparse.Namespace(
        clip_weights="", bpe="", random_text=True, resume=False, eval_only=False
    )


@pytest.mark.parametrize("arch", ["minvis", "dvis_online"])
def test_ov_train_steps(arch, synth_dataset, tmp_path):  # noqa: F811
    from train_net_video_ov import do_train, make_text_encoder

    cfg = ov_tiny_cfg(arch)
    cfg.output_dir = str(tmp_path)
    encode_fn = make_text_encoder(cfg, _args())
    state = do_train(cfg, _args(), encode_fn)
    assert int(state.step) == 2


@pytest.mark.parametrize("arch", ["minvis", "dvis_online", "dvis_offline"])
def test_ov_eval_path(arch, synth_dataset, tmp_path):  # noqa: F811
    from train_net_video_ov import do_eval, make_text_encoder

    cfg = ov_tiny_cfg(arch)
    cfg.output_dir = str(tmp_path)
    encode_fn = make_text_encoder(cfg, _args())
    res = do_eval(cfg, _args(), encode_fn)
    assert "synth_train" in res
    path = os.path.join(str(tmp_path), "inference", "synth_train", "results.json")
    with open(path) as f:
        rows = json.load(f)
    assert len(rows) == 2 * cfg.test.max_num
    assert all(len(r["segmentations"]) == 6 for r in rows)


def test_text_encoder_fails_loudly_without_weights():
    """No hash fallback by default (VERDICT weak #7)."""
    from train_net_video_ov import make_text_encoder

    cfg = ov_tiny_cfg("minvis")
    args = _args()
    args.random_text = False
    with pytest.raises(SystemExit):
        make_text_encoder(cfg, args)


def test_ov_multidataset_supervised_train(synth_dataset, tmp_path,  # noqa: F811
                                          tmp_path_factory, monkeypatch):
    """Supervised-mixture OV training (reference
    DVIS_Online_supervised_convnextl.yaml): COCO-panoptic pseudo-video +
    a video dataset in one run, per-batch text classifiers routed by the
    batch's source dataset (reference keys the classifier off the mapper's
    `name` field, meta_architecture_ov.py:525-540) and one learned void row
    per training dataset (:152-157)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import synth_data

    from dvis_plus_tpu.data.datasets.coco import register_all_coco
    from train_net_video_ov import do_train, make_text_encoder

    root = str(tmp_path_factory.mktemp("coco_synth_ov"))
    synth_data.make_coco(root)
    register_all_coco(root)
    # do_train's register_all_datasets() re-registers builtin names from this
    # root, keeping the synthetic COCO panoptic tree visible
    monkeypatch.setenv("DVIS_DATASETS", root)

    cfg = ov_tiny_cfg("dvis_online")
    cfg.model.num_classes = 3
    cfg.model.ov.num_void_embeddings = 2
    cfg.datasets.train = ("coco_panoptic_video_ov", "synth_train")
    cfg.datasets.dataset_type = ("image_panoptic", "video_instance")
    cfg.datasets.dataset_ratio = (0.5, 0.5)
    cfg.solver.max_iter = 4
    cfg.output_dir = str(tmp_path)
    encode_fn = make_text_encoder(cfg, _args())
    state = do_train(cfg, _args(), encode_fn)
    assert int(state.step) == 4

    def _find_void(tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "void_embedding":
                    return v
                found = _find_void(v)
                if found is not None:
                    return found
        return None

    void = _find_void(state.params)
    assert void is not None and void.shape[0] == 2


@pytest.fixture(scope="module")
def synth_vps_vss_root(tmp_path_factory):
    """VIPSeg + VSPW synthetic trees; DVIS_DATASETS points at them so
    do_eval's register_all_datasets() re-registers against this root."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import synth_data

    root = str(tmp_path_factory.mktemp("dvis_synth_ov"))
    synth_data.make_vipseg(root)
    synth_data.make_vspw(root)
    old = os.environ.get("DVIS_DATASETS")
    os.environ["DVIS_DATASETS"] = root
    yield root
    if old is None:
        os.environ.pop("DVIS_DATASETS", None)
    else:
        os.environ["DVIS_DATASETS"] = old


@pytest.mark.parametrize(
    "task,dataset,dtype_name",
    [
        ("vps", "panoVSPW_vps_video_val", "video_panoptic"),
        ("vss", "VSPW_vss_video_val", "video_semantic"),
    ],
)
def test_ov_vps_vss_eval_path(task, dataset, dtype_name, synth_dataset,  # noqa: F811
                              synth_vps_vss_root, tmp_path):
    """OV panoptic/semantic eval: ensembled OV logits through the shared
    VPS/VSS drivers (reference OV supports vis/vps/vss,
    meta_architecture_ov.py:184-188/845-943); in-process VPQ/STQ or mIoU/VC
    scoring runs because the synthetic GT is on disk."""
    from train_net_video_ov import do_eval, make_text_encoder

    cfg = ov_tiny_cfg("dvis_online")
    cfg.model.num_classes = 3
    cfg.test.task = task
    cfg.datasets.test = (dataset,)
    cfg.datasets.dataset_type_test = (dtype_name,)
    cfg.output_dir = str(tmp_path)
    encode_fn = make_text_encoder(cfg, _args())
    res = do_eval(cfg, _args(), encode_fn)
    assert res[dataset]["videos"] == 2
    out_dir = os.path.join(str(tmp_path), "inference", dataset)
    if task == "vps":
        assert os.path.exists(os.path.join(out_dir, "pred.json"))
        assert "VPQ" in res[dataset] and "STQ" in res[dataset]
    else:
        assert "mIoU" in res[dataset]
        pngs = [
            f for _, _, fs in os.walk(out_dir) for f in fs if f.endswith(".png")
        ]
        assert len(pngs) == 2 * 4


def test_ov_vps_train_steps(synth_vps_vss_root, tmp_path):
    """Supervised OV panoptic training: the PanopticVideoMapper's things-first
    contiguous classes align with the things-first OV classifier (reference
    OV supervised VIPSeg recipe, configs/open_vocabulary/.../vipseg)."""
    from train_net_video import register_all_datasets
    from train_net_video_ov import do_train, make_text_encoder

    register_all_datasets()
    cfg = ov_tiny_cfg("dvis_online")
    cfg.model.num_classes = 3
    cfg.datasets.train = ("panoVSPW_vps_video_train",)
    cfg.datasets.dataset_type = ("video_panoptic",)
    cfg.datasets.test = ("panoVSPW_vps_video_val",)
    cfg.datasets.dataset_type_test = ("video_panoptic",)
    cfg.input.sampling_frame_num = 2
    cfg.output_dir = str(tmp_path)
    encode_fn = make_text_encoder(cfg, _args())
    state = do_train(cfg, _args(), encode_fn)
    assert int(state.step) == 2
