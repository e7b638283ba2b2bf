"""Image-dataset catalogs + the COCO pseudo-video / image-pretraining path
(VERDICT missing #5): registration reads categories from the jsons instead of
shipping 4.7k LoC of tables (reference mask2former/data/datasets/*)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.test_data import make_cfg  # noqa: F401


@pytest.fixture(scope="module")
def synth_coco(tmp_path_factory):
    import synth_data

    from dvis_plus_tpu.data.datasets.coco import register_all_coco

    root = str(tmp_path_factory.mktemp("coco_synth"))
    synth_data.make_coco(root)
    register_all_coco(root)
    return root


def test_coco_instances_catalog(synth_coco):
    from dvis_plus_tpu.data.catalog import get_dataset, get_metadata

    recs = get_dataset("coco_2017_train")
    assert len(recs) == 4
    assert recs[0]["length"] == 1 and len(recs[0]["annotations"][0]) == 2
    md = get_metadata("coco_2017_train")
    assert md.thing_classes == ["person", "car"]


def test_coco_panoptic_catalog(synth_coco):
    from dvis_plus_tpu.data.catalog import get_dataset

    recs = get_dataset("coco_2017_train_panoptic")
    assert len(recs) == 4
    assert len(recs[0]["segments_infos"][0]) == 3  # 2 things + 1 stuff
    assert recs[0]["pan_seg_file_names"][0].endswith(".png")


def test_pseudo_video_train_loader(synth_coco):
    """COCO image -> pseudo clip through the image_instance dataset type."""
    from dvis_plus_tpu.data.build import build_combined_train_loader

    cfg = make_cfg()
    cfg.model.num_classes = 2
    cfg.datasets.train = ("coco_2017_train",)
    cfg.datasets.dataset_type = ("image_instance",)
    cfg.solver.ims_per_batch = 1
    loader = build_combined_train_loader(cfg, seed=0)
    batch = next(loader)
    T = cfg.input.sampling_frame_num
    assert batch["images"].shape[1] == T
    assert batch["valid"].any()
    # pseudo-video: identities persist across the synthesized frames
    fv = batch["frame_valid"][0]
    assert fv[batch["valid"][0]].all()


def test_coco_panoptic_image_pretraining_loader(synth_coco):
    """COCO panoptic as 1-frame clips through the video_panoptic mapper =
    the segmenter image-pretraining data path."""
    from dvis_plus_tpu.data.build import build_combined_train_loader

    cfg = make_cfg()
    cfg.model.num_classes = 3
    cfg.input.sampling_frame_num = 1
    cfg.input.sampling_frame_range = 0
    cfg.datasets.train = ("coco_2017_train_panoptic",)
    cfg.datasets.dataset_type = ("video_panoptic",)
    cfg.solver.ims_per_batch = 2
    loader = build_combined_train_loader(cfg, seed=0)
    batch = next(loader)
    assert batch["images"].shape[1] == 1
    assert batch["valid"].any()


def test_coco_panoptic_pseudo_video_loader(synth_coco):
    """Zero-shot OV training data path: COCO panoptic -> pseudo-video clips
    with things-first contiguous classes over things AND stuff (reference
    OpenVocabularyCocoPanoClipDatasetMapper + coco_panoptic_video_ov split)."""
    from dvis_plus_tpu.data.build import build_combined_train_loader
    from dvis_plus_tpu.data.catalog import get_dataset

    recs = get_dataset("coco_panoptic_video_ov")
    assert len(recs) == 4 and len(recs[0]["segments_infos"][0]) == 3

    cfg = make_cfg()
    cfg.model.num_classes = 3
    cfg.datasets.train = ("coco_panoptic_video_ov",)
    cfg.datasets.dataset_type = ("image_panoptic",)
    cfg.solver.ims_per_batch = 2
    loader = build_combined_train_loader(cfg, seed=0)
    batch = next(loader)
    T = cfg.input.sampling_frame_num
    assert batch["images"].shape[1] == T
    valid = batch["valid"]
    labels = batch["labels"]
    assert valid.any()
    # things-first contiguous space: person=0, car=1, stuff sky=2; the stuff
    # background segment must be present as a tracked instance
    assert set(np.unique(labels[valid]).tolist()) <= {0, 1, 2}
    assert (labels[valid] == 2).any()
    # pseudo-video: identities persist across the synthesized frames
    fv = batch["frame_valid"][0]
    assert fv[valid[0]].all()


def test_lsj_pseudo_video_fixed_canvas(synth_coco):
    """LSJ pseudo-clip recipe (ResizeScaleClip + FixedSizeCropClip, reference
    augmentation.py:507-560): all frames land on the fixed square canvas."""
    from dvis_plus_tpu.data.build import build_combined_train_loader

    cfg = make_cfg()
    cfg.model.num_classes = 2
    cfg.input.lsj_aug = True
    cfg.input.max_size_train = 64
    cfg.datasets.train = ("coco_2017_train",)
    cfg.datasets.dataset_type = ("image_instance",)
    cfg.solver.ims_per_batch = 2
    loader = build_combined_train_loader(cfg, seed=0)
    batch = next(loader)
    assert batch["images"].shape[2:4] == (64, 64)
    assert batch["valid"].any()


def test_resize_scale_then_crop_sees_resized_size():
    import random

    from dvis_plus_tpu.data.augmentation import (
        FixedSizeCropClip,
        ResizeScaleClip,
        sample_clip_transforms,
    )

    augs = [ResizeScaleClip(2.0, 2.0, 32, 32), FixedSizeCropClip((32, 32))]
    ts = sample_clip_transforms(augs, 16, 8, random.Random(0))
    # resize fits (16, 8) into the 64-scaled box -> (64, 32)
    assert ts[0].out_size(16, 8) == (64, 32)
    img = np.zeros((16, 8, 3), np.uint8)
    for t in ts:
        img = t.apply_image(img)
    assert img.shape == (32, 32, 3)


@pytest.mark.slow
def test_coco_image_pretraining_train_steps(synth_coco, tmp_path):
    """Segmenter image pretraining: minvis arch on COCO panoptic as 1-frame
    clips, a few optimizer steps end-to-end (VERDICT #9 done-criteria)."""
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.data.build import build_combined_train_loader
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.losses.targets import VideoTargets
    from train_net_video import build_model, init_params

    cfg = make_cfg()
    cfg.model.meta_architecture = "minvis"
    cfg.model.num_classes = 3
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
    cfg.model.criterion.train_num_points = 64
    cfg.input.sampling_frame_num = 1
    cfg.input.sampling_frame_range = 0
    cfg.datasets.train = ("coco_2017_train_panoptic",)
    cfg.datasets.dataset_type = ("video_panoptic",)
    cfg.solver.ims_per_batch = 2
    cfg.solver.max_iter = 2

    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    loader = build_combined_train_loader(cfg, seed=0)
    for _ in range(2):
        raw = next(loader)
        batch = Batch(
            images=jnp.asarray(raw["images"]),
            targets=VideoTargets(
                labels=jnp.asarray(raw["labels"]),
                masks=jnp.asarray(raw["masks"]),
                valid=jnp.asarray(raw["valid"]),
                frame_valid=jnp.asarray(raw["frame_valid"]),
            ),
        )
        state, metrics = train_step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 2


def test_color_jitter_augs():
    import random

    from dvis_plus_tpu.data.augmentation import (
        RandomBrightness,
        RandomContrast,
        RandomSaturation,
    )

    rng = random.Random(0)
    img = (np.ones((8, 8, 3)) * 100).astype(np.uint8)
    mask = np.ones((8, 8), np.uint8)
    for aug in (RandomBrightness(1.2, 1.2), RandomContrast(0.5, 0.5),
                RandomSaturation(0.0, 0.0)):
        t = aug.sample(8, 8, rng)
        out = t.apply_image(img)
        assert out.shape == img.shape and out.dtype == img.dtype
        np.testing.assert_array_equal(t.apply_mask(mask), mask)
    t = RandomBrightness(1.2, 1.2).sample(8, 8, rng)
    assert t.apply_image(img).max() == 120


@pytest.mark.slow
@pytest.mark.parametrize("arch,T", [("maskformer", 1), ("video_maskformer", 2)])
def test_maskformer_pretraining_train_steps(arch, T, synth_coco, tmp_path):
    """The registered (Video)MaskFormer pretraining meta-archs train through
    the same CLI machinery as the other families (reference
    maskformer_model.py:20-21, video_maskformer_model.py:24-25): COCO
    pseudo-video clips, a couple of optimizer steps, finite losses."""
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.data.build import build_combined_train_loader
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.losses.targets import VideoTargets
    from train_net_video import build_model, init_params

    cfg = make_cfg()
    cfg.model.meta_architecture = arch
    cfg.model.num_classes = 3
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
    cfg.model.criterion.train_num_points = 64
    cfg.input.sampling_frame_num = T
    cfg.input.sampling_frame_range = 0
    cfg.datasets.train = ("coco_2017_train_panoptic",)
    cfg.datasets.dataset_type = ("video_panoptic",)
    cfg.solver.ims_per_batch = 1
    cfg.solver.max_iter = 2

    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    loader = build_combined_train_loader(cfg, seed=0)
    for _ in range(2):
        raw = next(loader)
        batch = Batch(
            images=jnp.asarray(raw["images"]),
            targets=VideoTargets(
                labels=jnp.asarray(raw["labels"]),
                masks=jnp.asarray(raw["masks"]),
                valid=jnp.asarray(raw["valid"]),
                frame_valid=jnp.asarray(raw["frame_valid"]),
            ),
        )
        state, metrics = train_step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 2


@pytest.mark.slow
def test_maskformer_eval_clip_route(synth_coco, tmp_path):
    """video_maskformer evaluates VIS end-to-end via the whole-video clip
    decode route (engine/inference._clipformer_video)."""
    import jax
    from dvis_plus_tpu.engine.inference import video_logits_masks
    from train_net_video import build_model

    cfg = make_cfg()
    cfg.model.meta_architecture = "video_maskformer"
    cfg.model.num_classes = 3
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

    model = build_model(cfg)
    import jax.numpy as jnp

    images5 = np.random.RandomState(0).rand(3, 64, 64, 3).astype(np.float32)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(images5)[None])
    logits, masks, _aux = video_logits_masks(cfg, model, params, images5, {}, W_sz=4)
    assert logits.shape == (8, 4) and masks.shape[:2] == (8, 3)
