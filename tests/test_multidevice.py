"""Multi-device correctness on the 8-virtual-CPU mesh (VERDICT weak #3):
sharded train step == single-device step; global num_masks normalization;
process-0 evaluator aggregation."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e lane; CI runs the full suite

import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.engine.trainer import Batch, build_train_step
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.parallel.mesh import build_mesh, replicated, shard_batch


def tiny_cfg():
    cfg = Config()
    cfg.model.meta_architecture = "minvis"
    cfg.model.num_classes = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 32
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = 4
    cfg.model.transformer_decoder.nheads = 2
    cfg.model.transformer_decoder.dim_feedforward = 32
    cfg.model.transformer_decoder.dec_layers = 1
    cfg.model.transformer_decoder.mask_dim = 32
    cfg.model.criterion.train_num_points = 16
    cfg.model.criterion.max_num_instances = 2
    cfg.input.sampling_frame_num = 2
    cfg.solver.ims_per_batch = 8
    return cfg


def make_batch(B=8, T=2, H=32, W=32, N=2):
    rng = np.random.RandomState(0)
    images = rng.randn(B, T, H, W, 3).astype(np.float32)
    masks = np.zeros((B, N, T, H // 4, W // 4), bool)
    fv = np.zeros((B, N, T), bool)
    # vary instance counts per clip to exercise the GLOBAL num_masks sum
    for b in range(B):
        n_b = 1 + (b % 2)
        for n in range(n_b):
            masks[b, n, :, 2 + n : 5 + n, 2 : 6] = True
            fv[b, n] = True
    labels = rng.randint(0, 2, (B, N)).astype(np.int32)
    return Batch(
        images=jnp.asarray(images),
        targets=VideoTargets(
            labels=jnp.asarray(labels),
            masks=jnp.asarray(masks),
            valid=jnp.asarray(fv.any(-1)),
            frame_valid=jnp.asarray(fv),
        ),
    )


def test_sharded_step_matches_single_device():
    """8-way data-sharded train step == replicated step (loss and params).
    The reference's DDP all-reduce semantics (criterion.py:232-234 global
    num_masks) must fall out of jit partitioning."""
    assert jax.device_count() >= 8, "conftest forces 8 virtual CPU devices"
    cfg = tiny_cfg()
    from train_net_video import build_model, init_params

    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))

    mesh = build_mesh()
    batch = make_batch()

    def fresh(p):
        # donated on the first step; each run needs its own copy
        return jax.tree.map(lambda x: jnp.array(np.asarray(x)), p)

    # run 1: replicated (single logical device math)
    train_step, init_state = build_train_step(cfg, model)
    state_r = init_state(jax.device_put(fresh(params), replicated(mesh)))
    batch_r = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), batch)
    state_r, m_r = train_step(state_r, batch_r, jax.random.key(1))

    # run 2: data-sharded over 8 devices
    train_step2, init_state2 = build_train_step(cfg, model)
    state_s = init_state2(jax.device_put(fresh(params), replicated(mesh)))
    batch_s = shard_batch(batch, mesh)
    state_s, m_s = train_step2(state_s, batch_s, jax.random.key(1))

    np.testing.assert_allclose(
        float(m_r["total_loss"]), float(m_s["total_loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(state_r.params), jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_process0_prediction_gather():
    """Evaluator aggregation helper (reference comm.gather to rank 0,
    ytvis_eval.py:115-143): single-process identity, multihost via
    multihost_utils when initialized."""
    from dvis_plus_tpu.evaluation.dist import gather_predictions, is_main_process

    rows = [{"video_id": 1, "score": 0.5}, {"video_id": 2, "score": 0.25}]
    gathered = gather_predictions(rows)
    assert is_main_process()
    assert gathered == rows


def test_sequence_parallel_refiner_matches_single_device():
    """Object-sharded refiner embed pass (parallel/sp.py) == the plain pass:
    the per-frame object self-attention all-gathers its keys over the mesh,
    everything else is object-local."""
    from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner
    from dvis_plus_tpu.parallel.sp import refiner_embed_pass_sharded

    class Holder:
        pass

    import flax.linen as nn

    class Wrap(nn.Module):
        def setup(self):
            self.refiner = TemporalRefiner(
                num_classes=3, hidden_dim=32, feedforward_dim=64,
                num_heads=2, num_layers=2, mask_dim=16,
            )

        def __call__(self, ie, fe):
            return self.refiner.embed_pass(ie, fe)

    B, T, Q, C = 1, 6, 10, 32  # Q=10 not divisible by 8: exercises padding
    rng = np.random.RandomState(0)
    ie = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    fe = jnp.asarray(rng.randn(B, T, 12, C).astype(np.float32))

    model = Wrap()
    params = model.init(jax.random.key(0), ie, fe)
    ref = model.apply(params, ie, fe)

    mesh = build_mesh()
    out = refiner_embed_pass_sharded(model, params, ie, fe, mesh)

    assert out["pred_logits"].shape == ref["pred_logits"].shape
    assert out["mask_embed"].shape == ref["mask_embed"].shape
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["mask_embed"]), np.asarray(ref["mask_embed"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_embds"]), np.asarray(ref["pred_embds"]),
        rtol=2e-4, atol=2e-5,
    )
