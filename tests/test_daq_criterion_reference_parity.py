"""DAQ training-side reference-as-oracle parity: our in-graph DAQ matchers +
criterion vs the actual reference torch implementations
(``DVIS_DAQ/dvis_daq/matcher.py::{FrameMatcher,NewInsHungarianMatcher}`` and
``criterion.py::DAQCriterion``), loaded through tools/refshim.py.

Same methodology as tests/test_criterion_reference_parity.py: the only
nondeterminism is the random point sampling, pinned by patching ``torch.rand``
/ ``jax.random.uniform`` so every row uses ONE shared fixed point set (the
reference matchers already share one set across rows, matcher.py:112/:228);
the criterion runs with oversample_ratio=1.0 / importance_sample_ratio=1.0 so
the importance stage is a permutation of that shared set and both losses are
permutation-invariant over points.

What this proves beyond the cutter streaming parity
(test_daq_reference_parity): identical per-frame Hungarian assignments, aux
(argmin) assignments, query-validity gating, new-instance matching restricted
to the trailing detection queries, and identical loss_ce / loss_mask /
loss_dice on final + aux layers with disappearance and per-frame-invalid GTs
— i.e. the DAQ training signal matches the reference.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")

from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.losses.matcher import MatchCosts
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.daq.criterion import daq_criterion
from dvis_plus_tpu.models.daq.matcher import frame_match, new_ins_match

S, N, K = 10, 4, 5  # queries (slots), GT capacity, classes
H = W = 16
P = 32  # num_points


@pytest.fixture(scope="module")
def oracles():
    from refshim import load_daq_criterion_oracles

    return load_daq_criterion_oracles()


def _pin_torch_rand(coords):
    fixed = torch.from_numpy(coords)
    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if shape and isinstance(shape[0], tuple):
            shape = shape[0]
        if len(shape) == 3 and tuple(shape[1:]) == (P, 2):
            return fixed[None].expand(shape[0], P, 2).clone()
        return real_rand(*shape, **kw)

    return fake_rand, real_rand


def _pin_jax_uniform(coords):
    fixed = jnp.asarray(coords)
    real_uniform = jax.random.uniform

    def fake_uniform(key, shape=(), dtype=jnp.float32, **kw):
        if len(shape) == 2 and tuple(shape) == (P, 2):
            return fixed.astype(dtype)
        if len(shape) == 3 and tuple(shape[1:]) == (P, 2):
            return jnp.broadcast_to(fixed, shape).astype(dtype)
        return real_uniform(key, shape, dtype=dtype, **kw)

    return fake_uniform, real_uniform


def _dense_from_indices(src, tgt, size):
    t4q = np.full(size, -1, np.int64)
    for q, g in zip(np.asarray(src), np.asarray(tgt)):
        t4q[q] = g
    return t4q


COSTS = MatchCosts(class_weight=2.0, mask_weight=5.0, dice_weight=5.0,
                   num_points=P, solver="jv")


def test_frame_matcher_parity(oracles):
    """frame_match vs reference FrameMatcher (matcher.py:182-291): Hungarian
    pairs restricted to valid GTs, the per-query argmin aux assignment, and
    the matched-or-confident validity mask."""
    rng = np.random.RandomState(0)
    select_thr = 0.3
    for case in range(3):
        logits = rng.randn(S, K + 1).astype(np.float32)
        masks = (rng.randn(S, H, W) * 2).astype(np.float32)
        labels = rng.randint(0, K, (N,)).astype(np.int64)
        gt = (rng.rand(N, H, W) > 0.6).astype(np.float32)
        valid_inst = np.array([True, True, case != 1, True])
        coords = rng.rand(P, 2).astype(np.float32)

        matcher = oracles["FrameMatcher"](
            cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=P
        )
        out = {
            "pred_logits": torch.from_numpy(logits)[None],
            "pred_masks": torch.from_numpy(masks)[None],
        }
        targets = [{
            "labels": torch.from_numpy(labels),
            "masks": torch.from_numpy(gt * valid_inst[:, None, None]),
            "valid_inst": torch.from_numpy(valid_inst),
        }]
        fake_rand, real_rand = _pin_torch_rand(coords)
        torch.rand = fake_rand
        try:
            indices, aux_indices, valid_masks = matcher(out, targets, select_thr)
        finally:
            torch.rand = real_rand
        t_t4q = _dense_from_indices(indices[0][0], indices[0][1], S)
        t_aux = np.asarray(aux_indices[0][1])
        t_valid = np.asarray(valid_masks[0])

        fake_uniform, real_uniform = _pin_jax_uniform(coords)
        jax.random.uniform = fake_uniform
        try:
            fm = frame_match(
                jax.random.key(0), jnp.asarray(logits), jnp.asarray(masks),
                jnp.asarray(labels.astype(np.int32)),
                jnp.asarray(gt * valid_inst[:, None, None]),
                jnp.asarray(valid_inst), select_thr, COSTS,
            )
        finally:
            jax.random.uniform = real_uniform

        np.testing.assert_array_equal(np.asarray(fm.tgt_for_query), t_t4q,
                                      err_msg=f"case {case}: matched pairs")
        np.testing.assert_array_equal(np.asarray(fm.query_valid), t_valid,
                                      err_msg=f"case {case}: validity mask")
        # reference masks aux to -1 for invalid queries (matcher.py:282); our
        # aux is unmasked and consumers gate on query_valid — compare gated
        ours_aux = np.where(np.asarray(fm.query_valid),
                            np.asarray(fm.aux_tgt_for_query), -1)
        np.testing.assert_array_equal(ours_aux, t_aux,
                                      err_msg=f"case {case}: aux assignment")


@pytest.mark.parametrize("any_new", [True, False], ids=["new-gts", "no-new"])
def test_new_ins_matcher_parity(oracles, any_new):
    """new_ins_match vs reference NewInsHungarianMatcher (matcher.py:65-164):
    previously tracked GTs keep their slots; newly appeared GTs match among
    the trailing num_new_ins detection queries only."""
    rng = np.random.RandomState(1)
    num_new_ins = 4
    N5 = 5
    logits = rng.randn(S, K + 1).astype(np.float32)
    masks = (rng.randn(S, H, W) * 2).astype(np.float32)
    labels = rng.randint(0, K, (N5,)).astype(np.int64)
    gt = (rng.rand(N5, H, W) > 0.6).astype(np.float32)
    # gt0 tracked by q1, gt2 tracked by q3; gt3 invalid; gt1/gt4 newly appear
    valid_inst = np.array([True, any_new, True, False, any_new])
    old_src = np.array([1, 3])
    old_tgt = np.array([0, 2])
    coords = rng.rand(P, 2).astype(np.float32)

    matcher = oracles["NewInsHungarianMatcher"](
        cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=P,
        num_new_ins=num_new_ins,
    )
    out = {
        "pred_logits": torch.from_numpy(logits)[None],
        "pred_masks": torch.from_numpy(masks)[None],
    }
    targets = [{
        "labels": torch.from_numpy(labels),
        "masks": torch.from_numpy(gt),
        "valid_inst": torch.from_numpy(valid_inst),
    }]
    prev = (torch.from_numpy(old_src), torch.from_numpy(old_tgt))
    fake_rand, real_rand = _pin_torch_rand(coords)
    torch.rand = fake_rand
    try:
        indices = matcher(out, targets, prev_frame_indices=prev)
    finally:
        torch.rand = real_rand
    t_t4q = _dense_from_indices(indices[0][0], indices[0][1], S)

    tgt_for_track = np.full(S, -1, np.int32)
    tgt_for_track[old_src] = old_tgt
    fake_uniform, real_uniform = _pin_jax_uniform(coords)
    jax.random.uniform = fake_uniform
    try:
        t4q = new_ins_match(
            jax.random.key(0), jnp.asarray(logits), jnp.asarray(masks),
            jnp.asarray(labels.astype(np.int32)), jnp.asarray(gt),
            jnp.asarray(valid_inst), jnp.asarray(tgt_for_track),
            num_new_ins, COSTS,
        )
    finally:
        jax.random.uniform = real_uniform

    np.testing.assert_array_equal(np.asarray(t4q), t_t4q)
    if any_new:
        new_qs = np.where((np.asarray(t4q) >= 0) & (tgt_for_track < 0))[0]
        assert len(new_qs) == 2 and np.all(new_qs >= S - num_new_ins)


def test_daq_criterion_parity(oracles):
    """daq_criterion vs reference DAQCriterion (criterion.py:85-240): frames
    with staggered GT validity, one disappeared GT, and one aux layer. Same
    fixed assignment fed to both sides (the reference criterion consumes
    precomputed indices from the cutter)."""
    rng = np.random.RandomState(2)
    T, L = 3, 2  # frames, layers (1 aux + final)
    logits = rng.randn(T, L, S, K + 1).astype(np.float32)
    masks = (rng.randn(T, L, S, H, W) * 2).astype(np.float32)
    labels = rng.randint(0, K, (N,)).astype(np.int64)
    gt = rng.rand(N, T, H, W) > 0.6
    coords = rng.rand(P, 2).astype(np.float32)

    # gt0 all frames; gt1 frames 0-1 (disappears in 2); gt2 frames 1-2;
    # gt3 frame 2 only
    frame_valid = np.array([
        [True, True, True],
        [True, True, False],
        [False, True, True],
        [False, False, True],
    ])
    gt = gt & frame_valid[:, :, None, None]
    # running slot assignment (pairs persist once created, reference cutter
    # keeps matched GTs on their slots): q2->gt0, q5->gt1, q7->gt2, q9->gt3
    pairs = [
        ([2, 5], [0, 1]),
        ([2, 5, 7], [0, 1, 2]),
        ([2, 5, 7, 9], [0, 1, 2, 3]),
    ]
    disappear = [[], [], [1]]  # gt1 disappears at frame 2

    # --- torch side -------------------------------------------------------
    crit = oracles["DAQCriterion"](
        num_classes=K, matcher=None, weight_dict={}, eos_coef=0.1,
        losses=["labels", "masks"], num_points=P, oversample_ratio=1.0,
        importance_sample_ratio=1.0, num_new_ins=4,
    )
    outputs, targets = [], []
    for f in range(T):
        src, tgt = pairs[f]
        out = {
            "pred_logits": torch.from_numpy(logits[f, L - 1])[None],
            "pred_masks": torch.from_numpy(masks[f, L - 1])[None],
            "indices": [(torch.as_tensor(src), torch.as_tensor(tgt))],
            "disappear_tgt_ids": [torch.as_tensor(i) for i in disappear[f]],
            "aux_outputs": [
                {
                    "pred_logits": torch.from_numpy(logits[f, l])[None],
                    "pred_masks": torch.from_numpy(masks[f, l])[None],
                    "disappear_tgt_ids": [torch.as_tensor(i) for i in disappear[f]],
                }
                for l in range(L - 1)
            ],
        }
        outputs.append(out)
        targets.append([{
            "labels": torch.from_numpy(labels),
            "masks": torch.from_numpy(gt[:, f]).float(),
            "valid_inst": torch.from_numpy(frame_valid[:, f].copy()),
        }])
    fake_rand, real_rand = _pin_torch_rand(coords)
    torch.rand = fake_rand
    try:
        t_losses = {k: float(v) for k, v in crit(outputs, targets).items()}
    finally:
        torch.rand = real_rand

    # --- our side ---------------------------------------------------------
    cfg = CriterionConfig(
        num_classes=K, eos_coef=0.1, class_weight=2.0, mask_weight=5.0,
        dice_weight=5.0, num_points=P, oversample_ratio=1.0,
        importance_sample_ratio=1.0,
    )
    vt = VideoTargets(
        labels=jnp.asarray(labels.astype(np.int32)),
        masks=jnp.asarray(gt),
        valid=jnp.asarray(frame_valid.any(1)),
        frame_valid=jnp.asarray(frame_valid),
    )
    j_outputs = []
    for f in range(T):
        src, tgt = pairs[f]
        t4q = np.full(S, -1, np.int32)
        t4q[np.asarray(src)] = np.asarray(tgt)
        dis = np.zeros(N, bool)
        dis[disappear[f]] = True
        j_outputs.append({
            "pred_logits": jnp.asarray(logits[f]),  # (L, S, K+1)
            "pred_masks": jnp.asarray(masks[f]),  # (L, S, H, W)
            "tgt_for_query": jnp.asarray(t4q),
            "query_alive": jnp.ones(S, bool),
            "disappeared": jnp.asarray(dis),
        })
    fake_uniform, real_uniform = _pin_jax_uniform(coords)
    jax.random.uniform = fake_uniform
    try:
        j_losses = {
            k: float(v)
            for k, v in daq_criterion(
                jax.random.key(0), j_outputs, vt, list(range(T)), cfg
            ).items()
        }
    finally:
        jax.random.uniform = real_uniform

    # torch losses are raw; ours apply the criterion weights
    w = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0}
    for k in ("loss_ce", "loss_mask", "loss_dice",
              "loss_ce_0", "loss_mask_0", "loss_dice_0"):
        t = w[k.rsplit("_0", 1)[0]] * t_losses[k]
        assert abs(j_losses[k] - t) < 2e-4 * max(1.0, abs(t)), (k, j_losses[k], t)
