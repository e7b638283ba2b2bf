"""End-to-end MinVIS slice: tiny segmenter -> per-frame losses (train) and
jitted streaming post-processing + video inference (eval)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.minvis import (
    inference_video,
    minvis_post_processing,
    minvis_train_loss,
)
from dvis_plus_tpu.models.segmenter.segmenter import Segmenter

B, T, H, W, K, Q, N = 1, 2, 64, 64, 5, 8, 3


@pytest.fixture(scope="module")
def tiny_model():
    cfg = Config()
    cfg.model.num_classes = K
    cfg.model.compute_dtype = "float32"
    cfg.model.backbone.name = "resnet50"
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.pixel_decoder.transformer_nheads = 4
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = Q
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 3
    cfg.model.transformer_decoder.mask_dim = 32
    model = Segmenter(cfg.model)
    images = jnp.zeros((B * T, H, W, 3), jnp.float32)
    params = model.init(jax.random.key(0), images)
    return model, params


@pytest.mark.slow
def test_segmenter_shapes(tiny_model):
    model, params = tiny_model
    images = jax.random.normal(jax.random.key(1), (B * T, H, W, 3))
    out = jax.jit(model.apply)(params, images)
    assert out["pred_logits"].shape == (B * T, Q, K + 1)
    assert out["pred_masks"].shape == (B * T, Q, H // 4, W // 4)
    assert out["pred_embds"].shape == (B * T, Q, 32)
    assert len(out["aux_pred_logits"]) == 3  # initial + (dec_layers - 1)
    assert np.all(np.isfinite(np.asarray(out["pred_masks"], np.float32)))


def make_targets():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, K, (B, N)).astype(np.int32)
    masks = np.zeros((B, N, T, H, W), bool)
    frame_valid = np.zeros((B, N, T), bool)
    for b in range(B):
        for n in range(N - 1):  # leave one slot invalid
            y, x = rng.randint(0, H - 16), rng.randint(0, W - 16)
            masks[b, n, :, y : y + 16, x : x + 16] = True
            frame_valid[b, n, :] = True
    return VideoTargets(
        labels=jnp.asarray(labels),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(frame_valid.any(-1)),
        frame_valid=jnp.asarray(frame_valid),
    )


@pytest.mark.slow
def test_train_loss_and_grads(tiny_model):
    model, params = tiny_model
    targets = make_targets()
    ccfg = CriterionConfig(num_classes=K, num_points=64)
    images = jax.random.normal(jax.random.key(2), (B * T, H, W, 3))

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, images)
        losses = minvis_train_loss(jax.random.key(3), out, targets, ccfg)
        return sum(jax.tree.leaves(losses))

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least the decoder receives gradient signal
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert gnorm > 0


def test_post_processing_and_inference(tiny_model):
    model, params = tiny_model
    images = jax.random.normal(jax.random.key(4), (B * T, H, W, 3))
    out = model.apply(params, images)
    logits = out["pred_logits"].reshape(T, Q, K + 1)
    masks = out["pred_masks"].reshape(T, Q, H // 4, W // 4)
    embds = out["pred_embds"].reshape(T, Q, -1)

    mean_logits, aligned = jax.jit(minvis_post_processing)(logits, masks, embds)
    assert mean_logits.shape == (Q, K + 1)
    assert aligned.shape == (Q, T, H // 4, W // 4)

    res = inference_video(
        mean_logits, aligned, img_size=(60, 64), output_size=(120, 128),
        padded_size=(H, W), topk=4,
    )
    assert res.masks.shape == (4, T, 120, 128)
    assert res.scores.shape == (4,)
    # scores sorted descending from top_k
    s = np.asarray(res.scores)
    assert np.all(s[:-1] >= s[1:])


def test_post_processing_permutation_invariance(tiny_model):
    """A permuted second frame must be re-aligned to frame 1's query order."""
    model, params = tiny_model
    images = jax.random.normal(jax.random.key(5), (B * T, H, W, 3))
    out = model.apply(params, images)
    logits = out["pred_logits"].reshape(T, Q, K + 1)
    masks = out["pred_masks"].reshape(T, Q, H // 4, W // 4)
    embds = out["pred_embds"].reshape(T, Q, -1)
    # frame 2 = frame 1 permuted
    perm = np.asarray([3, 1, 0, 2, 7, 6, 5, 4])
    logits = logits.at[1].set(logits[0][perm])
    masks = masks.at[1].set(masks[0][perm])
    embds = embds.at[1].set(embds[0][perm])
    _, aligned = minvis_post_processing(logits, masks, embds)
    np.testing.assert_allclose(
        np.asarray(aligned[:, 0]), np.asarray(aligned[:, 1]), atol=1e-5
    )


@pytest.mark.slow
def test_bf16_serving_agrees_with_fp32(tiny_model):
    """The bf16 AMP path (compute_dtype=bfloat16: backbone dtype threading,
    bf16 window/decoder layers, bf16 deformable values) must agree with the
    fp32 parity path on random weights: same top-1 classes for confident
    queries and highly correlated mask logits."""
    _, params = tiny_model

    def build(dtype_name, value_dtype):
        cfg = Config()
        cfg.model.num_classes = K
        cfg.model.compute_dtype = dtype_name
        cfg.model.pixel_decoder.msdeform_value_dtype = value_dtype
        cfg.model.backbone.name = "resnet50"
        cfg.model.pixel_decoder.conv_dim = 32
        cfg.model.pixel_decoder.mask_dim = 32
        cfg.model.pixel_decoder.transformer_enc_layers = 1
        cfg.model.pixel_decoder.transformer_dim_feedforward = 64
        cfg.model.pixel_decoder.transformer_nheads = 4
        cfg.model.transformer_decoder.hidden_dim = 32
        cfg.model.transformer_decoder.num_queries = Q
        cfg.model.transformer_decoder.nheads = 4
        cfg.model.transformer_decoder.dim_feedforward = 64
        cfg.model.transformer_decoder.dec_layers = 3
        cfg.model.transformer_decoder.mask_dim = 32
        return Segmenter(cfg.model)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B * T, H, W, 3).astype(np.float32))

    out32 = build("float32", "float32").apply(params, images)
    outbf = build("bfloat16", "bfloat16").apply(params, images)

    m32 = np.asarray(out32["pred_masks"], np.float32).ravel()
    mbf = np.asarray(outbf["pred_masks"], np.float32).ravel()
    corr = np.corrcoef(m32, mbf)[0, 1]
    assert corr > 0.99, f"mask logit correlation {corr}"

    l32 = np.asarray(out32["pred_logits"], np.float32)
    lbf = np.asarray(outbf["pred_logits"], np.float32)
    top32, topbf = l32.argmax(-1), lbf.argmax(-1)
    # agreement on queries where fp32 is confident (margin over runner-up)
    srt = np.sort(l32, axis=-1)
    confident = (srt[..., -1] - srt[..., -2]) > 0.1
    agree = (top32 == topbf)[confident].mean() if confident.any() else 1.0
    assert agree > 0.9, f"top-1 agreement {agree}"
