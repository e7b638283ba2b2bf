"""Full-loop learning check: train a tiny MinVIS to overfit the synthetic
dataset, then evaluate video AP with the native scorer — the framework's
equivalent of the reference's metric-based validation (SURVEY §4.2)."""
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


@pytest.mark.slow
def test_overfit_and_ap(synth_dataset, tmp_path):  # noqa: F811
    import jax
    import jax.numpy as jnp

    from train_net_video import build_model, init_params

    cfg = make_cfg()
    cfg.model.meta_architecture = "minvis"
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
    cfg.model.criterion.train_num_points = 256
    cfg.solver.ims_per_batch = 2
    cfg.solver.base_lr = 3e-4
    cfg.solver.max_iter = 120
    cfg.solver.warmup_iters = 10
    cfg.solver.steps = (100000,)
    cfg.test.window_size = 3
    cfg.test.max_num = 4

    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)

    loader = build_train_loader(cfg, "synth_train", seed=0, num_workers=2)
    losses = []
    for step in range(cfg.solver.max_iter):
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
        if step % 20 == 0:
            losses.append(float(metrics["total_loss"]))

    assert losses[-1] < losses[0] * 0.7, losses  # clearly learning

    md = get_metadata("synth_train")
    evaluator = YTVISEvaluator(
        "synth_train",
        str(tmp_path),
        contiguous_to_dataset_id={v: k for k, v in md.thing_dataset_id_to_contiguous_id.items()},
        gt_json=md.json_file,
    )
    run_vis_inference(
        cfg, model, state.params, build_test_loader(cfg, "synth_train"), evaluator
    )
    res = evaluator.evaluate()
    # tiny model overfitting 2 videos: AP should be clearly above chance
    assert res["AP"] > 0.2, res
