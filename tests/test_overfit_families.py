"""Metric-based e2e validation beyond MinVIS (VERDICT r2 weak #8): the staged
DVIS++ recipe — overfit the segmenter (stage 1, MinVIS), train the tracker on
the frozen segmenter (stage 2, DVIS++ online), train the refiner on the frozen
pair (stage 3, DVIS++ offline) — each later stage chained from the previous
stage's weights exactly like the reference training sequence
(GETTING_STARTED.md CTVIS -> online -> offline), scored with the native
video-AP scorer; plus DAQ online AP and OV declining loss (SURVEY §4.2
methodology)."""
import copy

import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.build import build_test_loader, build_train_loader
from dvis_plus_tpu.data.catalog import get_metadata
from dvis_plus_tpu.engine.inference import run_vis_inference
from dvis_plus_tpu.engine.trainer import Batch, build_train_step
from dvis_plus_tpu.evaluation.evaluators import YTVISEvaluator
from dvis_plus_tpu.losses.targets import VideoTargets

from tests.test_data import synth_dataset, make_cfg  # noqa: F401

pytestmark = pytest.mark.slow


def tiny_cfg(arch: str) -> Config:
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
    cfg.model.tracker.num_layers = 2
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.tracker.num_heads = 4
    cfg.model.refiner.num_layers = 2
    cfg.model.refiner.feedforward_dim = 64
    cfg.model.refiner.num_heads = 4
    cfg.model.criterion.train_num_points = 256
    cfg.solver.ims_per_batch = 2
    cfg.solver.base_lr = 3e-4
    cfg.solver.warmup_iters = 10
    cfg.solver.steps = (100000,)
    cfg.test.window_size = 3
    cfg.test.max_num = 4
    return cfg


def train(cfg, model, params, n_steps, seed=0):
    """Run n_steps of the real jitted train step; returns (params, losses)."""
    import jax
    import jax.numpy as jnp

    cfg.solver.max_iter = n_steps
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    loader = build_train_loader(cfg, "synth_train", seed=seed, num_workers=2)
    losses = []
    for step in range(n_steps):
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
        if step % 20 == 0 or step == n_steps - 1:
            losses.append(float(metrics["total_loss"]))
    return state.params, losses


def eval_ap(cfg, model, params, tmp_path, tag):
    md = get_metadata("synth_train")
    evaluator = YTVISEvaluator(
        "synth_train",
        str(tmp_path / tag),
        contiguous_to_dataset_id={
            v: k for k, v in md.thing_dataset_id_to_contiguous_id.items()
        },
        gt_json=md.json_file,
    )
    run_vis_inference(
        cfg, model, params, build_test_loader(cfg, "synth_train"), evaluator
    )
    return evaluator.evaluate()["AP"]


def test_staged_dvis_overfit_online_then_offline(synth_dataset, tmp_path):  # noqa: F811
    """Stage 2 (tracker on frozen segmenter) reaches AP clearly above chance;
    stage 3 (refiner on the frozen pair) does not degrade it — the refiner's
    logits-max fusion + refined masks must preserve the overfit solution
    (reference zoo: offline AP >= online AP on every dataset)."""
    import jax

    from train_net_video import build_model, init_params

    # ---- stage 1: MinVIS segmenter overfit
    cfg1 = tiny_cfg("minvis")
    model1 = build_model(cfg1)
    params1 = init_params(cfg1, model1, jax.random.key(0))
    seg_params, losses1 = train(cfg1, model1, params1, 120)
    assert losses1[-1] < losses1[0] * 0.7, losses1

    # ---- stage 2: DVIS++ online, segmenter chained + frozen
    cfg2 = tiny_cfg("dvis_online")
    cfg2.model.freeze = ("segmenter",)
    model2 = build_model(cfg2)
    params2 = init_params(cfg2, model2, jax.random.key(1))
    params2 = copy.deepcopy(params2)
    params2["params"]["segmenter"] = seg_params["params"]
    params2, losses2 = train(cfg2, model2, params2, 100)
    assert losses2[-1] < losses2[0], losses2
    ap_online = eval_ap(cfg2, model2, params2, tmp_path, "online")
    assert ap_online > 0.2, ap_online

    # ---- stage 3: DVIS++ offline, online stack chained + frozen
    # (the refiner REPLACES the online masks, so it must train to convergence
    # on the tiny set before it stops degrading them — hence more steps +
    # higher LR than stage 2)
    cfg3 = tiny_cfg("dvis_offline")
    cfg3.model.freeze = ("segmenter", "tracker")
    cfg3.solver.base_lr = 1e-3
    model3 = build_model(cfg3)
    params3 = init_params(cfg3, model3, jax.random.key(2))
    params3 = copy.deepcopy(params3)
    params3["params"]["online"] = params2["params"]
    params3, losses3 = train(cfg3, model3, params3, 240)
    assert losses3[-1] < losses3[0], losses3
    ap_offline = eval_ap(cfg3, model3, params3, tmp_path, "offline")
    assert ap_offline > 0.2, (ap_online, ap_offline)
    assert ap_offline >= ap_online - 0.05, (ap_online, ap_offline)


def test_daq_online_overfit(synth_dataset, tmp_path):  # noqa: F811
    """DAQ online: Video Instance Cutter trained on a frozen overfit
    segmenter reaches AP above chance through the streaming eval driver."""
    import jax

    from train_net_video import build_model, init_params

    cfg1 = tiny_cfg("minvis")
    model1 = build_model(cfg1)
    params1 = init_params(cfg1, model1, jax.random.key(0))
    seg_params, _ = train(cfg1, model1, params1, 120)

    cfg = tiny_cfg("daq_online")
    cfg.model.freeze = ("segmenter",)
    cfg.model.daq.max_num_instances = 8
    cfg.model.daq.num_new_ins = 4
    cfg.model.daq.num_slots = 2
    cfg.solver.ims_per_batch = 1  # reference: B == 1 clip per device
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(1))
    params = copy.deepcopy(params)
    params["params"]["segmenter"] = seg_params["params"]
    params, losses = train(cfg, model, params, 100)
    assert losses[-1] < losses[0], losses
    ap = eval_ap(cfg, model, params, tmp_path, "daq")
    assert ap > 0.2, ap


def test_ov_online_loss_declines(synth_dataset, tmp_path):  # noqa: F811
    """OV online (random text classifier — no CLIP weights in CI): the CLIP
    dot-product class head + mask losses decline over real train steps
    (AP exempt per SURVEY §4.2: OV quality needs real CLIP weights)."""
    import argparse

    import jax
    import jax.numpy as jnp

    from tests.test_ov_cli import ov_tiny_cfg
    from train_net_video import register_all_datasets
    from train_net_video_ov import build_classifier, build_ov_model, make_text_encoder

    register_all_datasets()
    cfg = ov_tiny_cfg("dvis_online")
    cfg.model.meta_architecture = "dvis_online_ov"
    cfg.output_dir = str(tmp_path)
    args = argparse.Namespace(
        clip_weights="", bpe="", random_text=True, resume=False, eval_only=False
    )
    encode_fn = make_text_encoder(cfg, args)
    tc, nt, _ = build_classifier(cfg, "synth_train", encode_fn)

    model = build_ov_model(cfg)
    T = cfg.input.sampling_frame_num
    images0 = jnp.zeros((1, T, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r, i: model.init(r, i, jnp.asarray(tc), tuple(nt)))(
        jax.random.key(0), images0
    )

    cfg.solver.max_iter = 60
    train_step, init_state = build_train_step(
        cfg, model, text_classifier=tc, num_templates=nt
    )
    state = init_state(params)
    loader = build_train_loader(cfg, "synth_train", seed=0, num_workers=2)
    losses = []
    for step in range(60):
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
        if step % 10 == 0 or step == 59:
            losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses
