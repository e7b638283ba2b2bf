import pytest
"""Temporal refiner + offline loss + class-memory CL."""
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.losses.reid import ClassMemory, reid_loss_with_memory
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.dvis_offline import dvis_offline_train_loss
from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner

B, T, Q, C, K, Hm, Wm, N = 1, 4, 8, 32, 5, 16, 16, 3


@pytest.mark.slow
def test_refiner_shapes_train_eval():
    model = TemporalRefiner(
        num_classes=K, hidden_dim=C, feedforward_dim=64, num_heads=4,
        num_layers=2, mask_dim=C,
    )
    rng = np.random.RandomState(0)
    inst = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    frame = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    mf = jnp.asarray(rng.randn(B, T, Hm, Wm, C).astype(np.float32))
    params = model.init(jax.random.key(0), inst, frame, mf)

    out = model.apply(params, inst, frame, mf, training=True)
    assert out["pred_logits"].shape == (B, T, Q, K + 1)
    assert out["pred_masks"].shape == (B, Q, T, Hm, Wm)
    assert len(out["aux_pred_logits"]) == 1
    # class logits constant across frames (activation-pooled then duplicated)
    pl = np.asarray(out["pred_logits"])
    np.testing.assert_allclose(pl[:, 0], pl[:, 1], atol=1e-5)

    out_eval = model.apply(params, inst, frame, mf, training=False)
    assert len(out_eval["aux_pred_logits"]) == 0


def make_targets(rng):
    labels = jnp.asarray(rng.randint(0, K, (B, N)).astype(np.int32))
    masks = jnp.asarray(rng.rand(B, N, T, Hm, Wm) > 0.7)
    valid = jnp.asarray([[True, True, False]])
    fv = jnp.broadcast_to(valid[..., None], (B, N, T))
    return VideoTargets(labels=labels, masks=masks, valid=valid, frame_valid=fv)


@pytest.mark.slow
def test_offline_loss_and_memory():
    rng = np.random.RandomState(1)
    track_out = {
        "pred_logits": jnp.asarray(rng.randn(B, T, Q, K + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(B, Q, T, Hm, Wm).astype(np.float32)),
    }
    refine_out = {
        "pred_logits": jnp.asarray(
            np.tile(rng.randn(B, 1, Q, K + 1).astype(np.float32), (1, T, 1, 1))
        ),
        "pred_masks": jnp.asarray(rng.randn(B, Q, T, Hm, Wm).astype(np.float32)),
        "aux_pred_logits": [],
        "aux_pred_masks": [],
        "pred_embds": jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32)),
    }
    targets = make_targets(rng)
    ccfg = CriterionConfig(num_classes=K, num_points=32)
    memory = ClassMemory.create(K, max_len=8, dim=C)

    @jax.jit
    def f(masks):
        ro = dict(refine_out, pred_masks=masks)
        losses, new_mem = dvis_offline_train_loss(
            jax.random.key(2), track_out, ro, targets, ccfg,
            use_matcher_guidance=jnp.asarray(True), memory=memory,
        )
        return sum(jax.tree.leaves(losses)), (losses, new_mem)

    (val, (losses, new_mem)), g = jax.value_and_grad(f, has_aux=True)(
        refine_out["pred_masks"]
    )
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    # memory got 2 valid instances x T frames pushed
    counts = np.asarray(new_mem.count)
    assert counts.sum() == 2 * T
    # second step: memory negatives now active, loss still finite
    losses2, mem2 = dvis_offline_train_loss(
        jax.random.key(3), track_out, refine_out, targets, ccfg,
        use_matcher_guidance=jnp.asarray(False), memory=new_mem,
    )
    assert np.isfinite(float(losses2["loss_reid"]))
    assert np.asarray(mem2.count).sum() == 4 * T


def test_windowed_mask_head_matches_full_forward():
    """embed_pass + per-window mask_window == full __call__ at eval (the TPU
    form of reference windows_prediction, refiner.py:169-194)."""
    model = TemporalRefiner(
        num_classes=K, hidden_dim=C, feedforward_dim=64, num_heads=4,
        num_layers=2, mask_dim=C, window=2,
    )
    rng = np.random.RandomState(3)
    inst = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    frame = jnp.asarray(rng.randn(B, T, Q, C).astype(np.float32))
    mf = jnp.asarray(rng.randn(B, T, Hm, Wm, C).astype(np.float32))
    params = model.init(jax.random.key(0), inst, frame, mf)

    full = model.apply(params, inst, frame, mf, training=False)

    ep = model.apply(params, inst, frame, method=TemporalRefiner.embed_pass)
    np.testing.assert_allclose(
        np.asarray(ep["pred_logits"][:, None]),
        np.asarray(full["pred_logits"][:, :1]),
        atol=1e-5,
    )
    w = 2
    chunks = [
        model.apply(
            params, ep["mask_embed"][:, s : s + w], mf[:, s : s + w],
            method=TemporalRefiner.mask_window,
        )
        for s in range(0, T, w)
    ]
    masks = jnp.concatenate(chunks, axis=2)
    np.testing.assert_allclose(
        np.asarray(masks), np.asarray(full["pred_masks"]), atol=1e-4
    )
