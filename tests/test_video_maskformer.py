import pytest
"""Clip-joint VideoMaskFormer pretraining path."""
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.video_maskformer import (
    ImageMaskFormer,
    VideoMaskFormer,
    video_maskformer_train_loss,
)

B, T, H, W, K, Q, N = 1, 2, 64, 64, 4, 8, 3


def tiny_cfg():
    cfg = Config()
    cfg.model.num_classes = K
    cfg.model.compute_dtype = "float32"
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = Q
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 2
    cfg.model.transformer_decoder.mask_dim = 32
    return cfg


@pytest.mark.slow
def test_video_maskformer_train():
    cfg = tiny_cfg()
    model = VideoMaskFormer(cfg.model)
    images = jnp.zeros((B, T, H, W, 3))
    params = model.init(jax.random.key(0), images)
    out = model.apply(params, images)
    assert out["pred_logits"].shape == (B, Q, K + 1)  # clip-level
    assert out["pred_masks"].shape == (B, Q, T, H // 4, W // 4)

    rng = np.random.RandomState(0)
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, K, (B, N)), jnp.int32),
        masks=jnp.asarray(rng.rand(B, N, T, H, W) > 0.8),
        valid=jnp.ones((B, N), bool),
        frame_valid=jnp.ones((B, N, T), bool),
    )
    ccfg = CriterionConfig(num_classes=K, num_points=64)

    def f(p):
        o = model.apply(p, images)
        losses = video_maskformer_train_loss(jax.random.key(1), o, targets, ccfg)
        return sum(jax.tree.leaves(losses))

    val, g = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_image_maskformer():
    cfg = tiny_cfg()
    model = ImageMaskFormer(cfg.model)
    images = jnp.zeros((2, H, W, 3))
    params = model.init(jax.random.key(0), images)
    out = model.apply(params, images)
    assert out["pred_logits"].shape == (2, Q, K + 1)
    assert out["pred_masks"].shape == (2, Q, 1, H // 4, W // 4)
