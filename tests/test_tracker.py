"""Referring tracker: streaming equivalence, alignment semantics, online loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.tracker.referring_tracker import (
    ReferringTracker,
    init_tracker_state,
    match_embds,
)

B, T, Q, C, K, Hm, Wm = 1, 4, 8, 32, 5, 16, 16


@pytest.fixture(scope="module")
def tracker():
    model = ReferringTracker(
        num_classes=K, hidden_dim=C, feedforward_dim=64, num_heads=4,
        num_layers=2, mask_dim=C,
    )
    embds = jnp.zeros((B, T, Q, C))
    mf = jnp.zeros((B, T, Hm, Wm, C))
    params = model.init(jax.random.key(0), embds, mf)
    return model, params


def test_match_embds_recovers_permutation():
    rng = np.random.RandomState(0)
    ref = rng.randn(Q, C).astype(np.float32)
    perm = rng.permutation(Q)
    cur = ref[perm]
    idx = np.asarray(match_embds(jnp.asarray(ref), jnp.asarray(cur)))
    # cur[idx] must align to ref -> idx inverts the permutation
    np.testing.assert_array_equal(perm[idx], np.arange(Q))


def test_tracker_shapes_eval(tracker):
    model, params = tracker
    rng = np.random.RandomState(1)
    embds = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    mf = jnp.asarray(rng.randn(B, T, Hm, Wm, C).astype(np.float32))
    out, state = model.apply(params, embds, mf)
    assert out["pred_logits"].shape == (B, T, Q, K + 1)
    assert out["pred_masks"].shape == (B, Q, T, Hm, Wm)
    assert out["pred_embds"].shape == (B, T, Q, C)
    assert out["indices"].shape == (B, T, Q)
    assert len(out["aux_pred_logits"]) == 0  # eval keeps final layer only
    assert state.last_output.shape == (B, Q, C)


def test_tracker_train_emits_aux(tracker):
    model, params = tracker
    rng = np.random.RandomState(2)
    embds = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    mf = jnp.asarray(rng.randn(B, T, Hm, Wm, C).astype(np.float32))
    out, _ = model.apply(params, embds, mf, rng=jax.random.key(3), training=True)
    assert len(out["aux_pred_logits"]) == 1  # num_layers - 1
    assert out["aux_pred_masks"][0].shape == (B, Q, T, Hm, Wm)


def test_streaming_matches_full_clip(tracker):
    """Two windows with carried state == one full clip (the resume protocol)."""
    model, params = tracker
    rng = np.random.RandomState(3)
    embds = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    mf = jnp.asarray(rng.randn(B, T, Hm, Wm, C).astype(np.float32))

    full, _ = model.apply(params, embds, mf)

    half = T // 2
    out1, st = model.apply(params, embds[:, :half], mf[:, :half])
    out2, _ = model.apply(params, embds[:, half:], mf[:, half:], state=st)
    merged_logits = jnp.concatenate([out1["pred_logits"], out2["pred_logits"]], axis=1)
    merged_masks = jnp.concatenate([out1["pred_masks"], out2["pred_masks"]], axis=2)
    np.testing.assert_allclose(
        np.asarray(full["pred_logits"]), np.asarray(merged_logits), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full["pred_masks"]), np.asarray(merged_masks), atol=1e-4
    )


@pytest.mark.slow
def test_online_loss_grads():
    from dvis_plus_tpu.models.meta.dvis_online import dvis_online_train_loss

    rng = np.random.RandomState(4)
    N = 3
    seg_out = {
        "pred_logits": jnp.asarray(rng.randn(B * T, Q, K + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(B * T, Q, Hm, Wm).astype(np.float32)),
    }
    track_out = {
        "pred_logits": jnp.asarray(rng.randn(B, T, Q, K + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(B, Q, T, Hm, Wm).astype(np.float32)),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
        "pred_references": jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32)),
        "indices": jnp.asarray(np.tile(np.arange(Q), (B, T, 1))),
    }
    labels = jnp.asarray(rng.randint(0, K, (B, N)).astype(np.int32))
    masks = jnp.asarray(rng.rand(B, N, T, Hm, Wm) > 0.7)
    valid = jnp.asarray([[True, True, False]])
    fv = jnp.broadcast_to(valid[..., None], (B, N, T))
    targets = VideoTargets(labels=labels, masks=masks, valid=valid, frame_valid=fv)
    ccfg = CriterionConfig(num_classes=K, num_points=64)

    def f(masks_in):
        to = dict(track_out, pred_masks=masks_in)
        losses = dvis_online_train_loss(
            jax.random.key(0), seg_out, to, targets, ccfg,
            use_matcher_guidance=jnp.asarray(True),
        )
        return sum(jax.tree.leaves(losses)), losses

    (val, losses), g = jax.value_and_grad(f, has_aux=True)(track_out["pred_masks"])
    assert np.isfinite(float(val))
    assert "loss_reid" in losses and np.isfinite(float(losses["loss_reid"]))
    assert np.all(np.isfinite(np.asarray(g)))
