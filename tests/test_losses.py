import pytest
"""Matcher + criterion semantics on small synthetic clips."""
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.losses.criterion import CriterionConfig, LayerOutputs, video_criterion
from dvis_plus_tpu.losses.matcher import MatchCosts, consistent_match, video_hungarian_match
from dvis_plus_tpu.losses.targets import VideoTargets

B, Q, N, T, H, W, K = 2, 8, 4, 3, 16, 16, 5


def make_scene(seed=0, n_real=3):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, K, size=(B, N)).astype(np.int32)
    masks = np.zeros((B, N, T, H, W), np.float32)
    frame_valid = np.zeros((B, N, T), bool)
    for b in range(B):
        for n in range(n_real):
            y, x = rng.randint(0, H - 6), rng.randint(0, W - 6)
            for t in range(T):
                present = not (n == 1 and t == 0)  # instance 1 appears at t=1
                if present:
                    masks[b, n, t, y : y + 6, x : x + 6 - n] = 1.0
                    frame_valid[b, n, t] = True
    valid = frame_valid.any(-1)
    return VideoTargets(
        labels=jnp.asarray(labels),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        frame_valid=jnp.asarray(frame_valid),
    )


def perfect_outputs(targets, perm):
    """Place GT instance n's mask/class at query perm[n]; rest background."""
    logits = np.full((B, Q, K + 1), -8.0, np.float32)
    logits[..., K] = 8.0  # background default
    masks = np.full((B, Q, T, H, W), -8.0, np.float32)
    t_masks = np.asarray(targets.masks)
    t_labels = np.asarray(targets.labels)
    for b in range(B):
        for n in range(N):
            if not bool(targets.valid[b, n]):
                continue
            q = perm[n]
            logits[b, q] = -8.0
            logits[b, q, t_labels[b, n]] = 8.0
            masks[b, q] = np.where(t_masks[b, n] > 0.5, 8.0, -8.0)
    return LayerOutputs(pred_logits=jnp.asarray(logits), pred_masks=jnp.asarray(masks))


def test_clip_match_recovers_permutation():
    targets = make_scene()
    perm = [5, 2, 7, 0]
    outputs = perfect_outputs(targets, perm)
    q4g = video_hungarian_match(
        jax.random.key(0), outputs.pred_logits, outputs.pred_masks, targets,
        MatchCosts(num_points=512),
    )
    q4g = np.asarray(q4g)
    for b in range(B):
        for n in range(N):
            if bool(targets.valid[b, n]):
                assert q4g[b, n] == perm[n], (b, n, q4g[b])


def test_consistent_match_recovers_permutation():
    targets = make_scene()
    perm = [1, 6, 3, 0]
    outputs = perfect_outputs(targets, perm)
    # per-frame logits: broadcast clip logits over T
    logits_t = jnp.broadcast_to(
        outputs.pred_logits[:, None], (B, T, Q, K + 1)
    )
    masks_t = jnp.swapaxes(outputs.pred_masks, 1, 2)
    q4g = consistent_match(
        jax.random.key(1), logits_t, masks_t, targets, MatchCosts(num_points=512)
    )
    q4g = np.asarray(q4g)
    for b in range(B):
        for n in range(N):
            if bool(targets.valid[b, n]):
                assert q4g[b, n] == perm[n], (b, n, q4g[b])


def test_criterion_perfect_beats_noise():
    targets = make_scene()
    cfg = CriterionConfig(num_classes=K, num_points=512)
    good = perfect_outputs(targets, [0, 1, 2, 3])
    rng = np.random.RandomState(3)
    bad = LayerOutputs(
        pred_logits=jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32)),
        pred_masks=jnp.asarray(rng.randn(B, Q, T, H, W).astype(np.float32)),
    )
    lg, _ = video_criterion(jax.random.key(0), good, [], targets, cfg)
    lb, _ = video_criterion(jax.random.key(0), bad, [], targets, cfg)
    assert sum(jax.tree.leaves(lg)) < sum(jax.tree.leaves(lb))
    # classification is exactly recoverable; mask losses stay above zero on a
    # hard-edge fixture because importance sampling targets the boundary where
    # bilinear interpolation yields mid logits (point-rend behavior by design)
    assert float(lg["loss_ce"]) < 1e-2
    assert float(lg["loss_mask"]) < float(lb["loss_mask"]) / 2
    assert float(lg["loss_dice"]) < float(lb["loss_dice"]) / 2


def test_criterion_jits_and_grads():
    targets = make_scene()
    cfg = CriterionConfig(num_classes=K, num_points=128)
    outputs = perfect_outputs(targets, [0, 1, 2, 3])

    @jax.jit
    def total(masks):
        o = LayerOutputs(outputs.pred_logits, masks)
        losses, _ = video_criterion(jax.random.key(0), o, [o], targets, cfg)
        return sum(jax.tree.leaves(losses))

    g = jax.grad(total)(outputs.pred_masks)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_aux_layers_rematch_in_self_match_mode():
    """In self-match mode every aux layer is re-matched on its own predictions
    (reference criterion.py:242-249): a query-permuted aux layer must produce
    the same loss as the final layer (the assignment adapts), while guided
    mode pins one assignment for all layers."""
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.losses.criterion import CriterionConfig
    from dvis_plus_tpu.losses.targets import VideoTargets
    from dvis_plus_tpu.models.meta.dvis_online import dvis_online_train_loss

    B, T, Q, K, Hm, Wm, N = 1, 2, 4, 3, 8, 8, 2
    rng = np.random.RandomState(0)
    # unambiguous geometry: each query predicts a disjoint block; GT 0/1 are
    # exact copies of query 1 / query 3 masks, so any sampled point set gives
    # the same optimal assignment
    masks_np = np.full((B, Q, T, Hm, Wm), -8.0, np.float32)
    for q in range(Q):
        masks_np[:, q, :, 2 * q : 2 * q + 2, :] = 8.0
    gt = np.zeros((B, N, T, Hm, Wm), bool)
    gt[:, 0] = masks_np[:, 1] > 0
    gt[:, 1] = masks_np[:, 3] > 0
    logits = jnp.asarray(rng.randn(B, T, Q, K + 1).astype(np.float32))
    masks = jnp.asarray(masks_np)
    perm = jnp.asarray([2, 0, 3, 1])
    track_out = {
        "pred_logits": logits,
        "pred_masks": masks,
        "aux_pred_logits": [logits[:, :, perm]],
        "aux_pred_masks": [masks[:, perm]],
        "pred_references": jnp.asarray(rng.randn(B, T, Q, 8).astype(np.float32)),
        "indices": jnp.tile(jnp.arange(Q)[None, None], (B, T, 1)),
    }
    seg_out = {
        "pred_logits": logits.reshape(B * T, Q, K + 1),
        "pred_masks": jnp.swapaxes(masks, 1, 2).reshape(B * T, Q, Hm, Wm),
    }
    targets = VideoTargets(
        labels=jnp.asarray([[0, 1]]),
        masks=jnp.asarray(gt),
        valid=jnp.asarray([[True, True]]),
        frame_valid=jnp.ones((B, N, T), bool),
    )
    ccfg = CriterionConfig(num_classes=K, num_points=32)
    losses = dvis_online_train_loss(
        jax.random.key(1), seg_out, track_out, targets, ccfg,
        use_matcher_guidance=jnp.asarray(False), use_cl=False,
    )
    # permuted aux layer re-matched -> same dice loss as the final layer
    # (up to per-layer point-sampling noise)
    np.testing.assert_allclose(
        float(losses["loss_dice_0"]), float(losses["loss_dice"]), rtol=0.02
    )
    guided = dvis_online_train_loss(
        jax.random.key(1), seg_out, track_out, targets, ccfg,
        use_matcher_guidance=jnp.asarray(True), use_cl=False,
    )
    # guided mode pins the assignment: the permuted aux layer scores worse
    assert float(guided["loss_dice_0"]) > float(guided["loss_dice"]) + 0.1


@pytest.mark.slow
def test_matcher_auction_solver_matches_jv():
    """solve_lap(solver="auction") recovers the exact JV assignment on
    matcher-style costs (random valid block + _PAD_COST sentinels for
    invalid GTs and pinned queries)."""
    import jax.numpy as jnp

    from dvis_plus_tpu.losses.matcher import _PAD_COST, solve_lap

    rng = np.random.RandomState(0)
    for trial in range(10):
        N, Q = 10, 50
        C = rng.rand(N, Q).astype(np.float32) * 20.0
        C[rng.rand(N) < 0.3] = _PAD_COST  # invalid GT rows
        C[:, rng.rand(Q) < 0.2] = 2 * _PAD_COST  # pinned query columns
        jv = np.asarray(solve_lap(jnp.asarray(C), "jv"))
        au = np.asarray(solve_lap(jnp.asarray(C), "auction"))
        valid = C.min(axis=1) < _PAD_COST / 2
        # exact agreement on valid rows (non-degenerate random costs)
        np.testing.assert_array_equal(jv[valid], au[valid], err_msg=f"trial {trial}")
        # both injective
        assert len(set(au.tolist())) == N
