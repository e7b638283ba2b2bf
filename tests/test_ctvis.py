import pytest
"""CTVIS contrastive tracking loss + full ctvis train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.losses.ctvis import _sgff_scan, ctvis_reid_loss

B, T, Q, C, N = 1, 4, 12, 16, 3


def test_sgff_scan_first_frame_identity():
    rng = np.random.RandomState(0)
    e = jnp.asarray(rng.randn(T, C).astype(np.float32))
    v = jnp.asarray([True, True, False, True])
    fused = _sgff_scan(e, v)
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(e[0]), rtol=1e-6)
    # invalid frame keeps the previous fused value
    np.testing.assert_allclose(np.asarray(fused[2]), np.asarray(fused[1]), rtol=1e-6)


def test_ctvis_loss_separates_good_bad():
    rng = np.random.RandomState(1)
    # construct embeddings where each instance's matched query embedding is
    # consistent across frames (good) vs shuffled (bad)
    base = rng.randn(Q, C).astype(np.float32) * 5
    good = np.tile(base[None], (T, 1, 1)) + 0.01 * rng.randn(T, Q, C).astype(np.float32)
    bad = rng.randn(T, Q, C).astype(np.float32) * 5
    q4g = np.tile(np.arange(N)[None], (T, 1))
    fv = np.ones((N, T), bool)

    lg = ctvis_reid_loss(
        jax.random.key(0), jnp.asarray(good[None]), jnp.asarray(q4g[None]),
        jnp.asarray(fv[None]), num_negatives=5,
    )
    lb = ctvis_reid_loss(
        jax.random.key(0), jnp.asarray(bad[None]), jnp.asarray(q4g[None]),
        jnp.asarray(fv[None]), num_negatives=5,
    )
    assert float(lg["loss_reid"]) < float(lb["loss_reid"])
    assert float(lg["loss_aux_reid"]) < float(lb["loss_aux_reid"])


def test_ctvis_handles_absent_frames():
    rng = np.random.RandomState(2)
    embeds = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    q4g = jnp.asarray(np.tile(np.arange(N)[None, None], (B, T, 1)))
    fv = np.ones((B, N, T), bool)
    fv[0, 0, :2] = False  # instance 0 appears only later
    losses = ctvis_reid_loss(jax.random.key(1), embeds, q4g, jnp.asarray(fv))
    assert np.isfinite(float(losses["loss_reid"]))

    # no instance valid anywhere -> zero loss, no NaN
    losses0 = ctvis_reid_loss(
        jax.random.key(1), embeds, q4g, jnp.zeros((B, N, T), bool)
    )
    assert float(losses0["loss_reid"]) == 0.0


@pytest.mark.slow
def test_ctvis_train_step_builds():
    from dvis_plus_tpu.core.config import Config
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.losses.targets import VideoTargets
    from dvis_plus_tpu.models.segmenter.segmenter import Segmenter

    cfg = Config()
    cfg.model.meta_architecture = "ctvis"
    cfg.model.num_classes = 4
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
    cfg.model.transformer_decoder.reid_branch = True
    cfg.model.transformer_decoder.reid_hidden_dim = 32
    cfg.model.criterion.train_num_points = 64
    cfg.model.criterion.max_num_instances = N
    cfg.solver.max_iter = 10

    model = Segmenter(cfg.model)
    Tn, H, W = 2, 64, 64
    images = jnp.zeros((1, Tn, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), images.reshape(Tn, H, W, 3))

    rng = np.random.RandomState(3)
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, 4, (1, N)), jnp.int32),
        masks=jnp.asarray(rng.rand(1, N, Tn, H, W) > 0.8),
        valid=jnp.ones((1, N), bool),
        frame_valid=jnp.ones((1, N, Tn), bool),
    )
    batch = Batch(images=images, targets=targets)
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    state, metrics = train_step(state, batch, jax.random.key(4))
    assert "loss_reid" in metrics
    assert np.isfinite(float(metrics["total_loss"]))
