"""Reference-as-oracle parity for the contrastive/ReID TRAINING losses and
the Noiser's training-time noise modes (VERDICT r3 missing #2).

Oracles (loaded via tools/refshim.load_cl_oracles, pure torch/numpy/scipy):

  get_cl_loss_ref        dvis_Plus/meta_architecture.py:981-1064 (+ loss_reid
                         utils.py:51-94) — the online tracker's ReID CL
  get_cl_loss_with_memory meta_architecture.py:1502-1579 (+ class memory
                         Outputs_Memory_PerClasses utils.py:4-49)
  CTCLPlugin.get_reid_loss ctvis.py:700-772 (+ TrainTracklet SGFF :490-512,
                         SimpleTrainMemory :543-601, ctvis loss_reid :816-860)
  Noiser modes rs/wa/cc  noiser.py:12-41

Randomness pinning strategy per surface:
- get_cl_loss_ref / get_cl_loss_with_memory are deterministic given the
  match result (no RNG) — direct comparison.
- CTCLPlugin: ``momentum_embed=False`` (so np.random.rand is never drawn,
  ctvis.py:524) and anchor slots < num_negatives+1 (so the negative "sample"
  is the full deterministic set, ctvis.py:728-731). The SGFF fusion itself
  (which momentum_embed=True would sample) is compared separately against
  TrainTracklet.update.
- Noiser: np.random.shuffle / torch.rand / torch.randint are monkeypatched
  to pinned draws and our pure compose functions get the same draws.

Known static-shape delta (documented in losses/ctvis.py): for frames where
an instance is absent the reference stores ALL Q embeds as negatives
(ctvis.py:732-734) while we keep the fixed num_negatives sample — fixtures
here keep instances present in every frame, where both sides agree exactly.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow

REL_TOL = 1e-5


@pytest.fixture(scope="module")
def oracles():
    from refshim import load_cl_oracles

    return load_cl_oracles()


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)


# ---------------------------------------------------------------------------
# get_cl_loss_ref (online tracker ReID CL)
# ---------------------------------------------------------------------------


def _ref_cl_loss_ref(oracles, refs_tqc, slots, n_valid):
    """Run the reference get_cl_loss_ref on one video.

    ``slots``: query slot per GT (consistent across frames — the trainer
    feeds VideoHungarianMatcher_Consistent results, which pin one query per
    GT for the whole clip, matcher.py:211-299)."""
    meta = oracles["meta_architecture"]
    T = refs_tqc.shape[0]
    match = [
        (
            torch.as_tensor(slots[:n_valid], dtype=torch.int64),
            torch.arange(n_valid, dtype=torch.int64),
        )
        for _ in range(T)
    ]
    out = {"pred_references": torch.as_tensor(refs_tqc)}
    losses = meta.DVIS_Plus_online.get_cl_loss_ref(None, out, match)
    return (
        float(losses["loss_reid"]),
        float(losses["loss_aux_reid"]),
        # item count for cross-video combination: frames 1..T-1 get a
        # prev-frame item per instance, frames 1..T-2 also a next-frame item
        n_valid * ((T - 1) + (T - 2)),
    )


@pytest.mark.parametrize("T,n_valid", [(4, 3), (2, 2), (5, 1)])
def test_reid_loss_reference_parity(oracles, T, n_valid):
    from dvis_plus_tpu.losses.reid import reid_loss

    Q, C, N = 8, 16, 3
    rng = np.random.RandomState(T * 10 + n_valid)
    refs = rng.randn(2, T, Q, C).astype(np.float32)
    slots = np.stack([rng.permutation(Q)[:N] for _ in range(2)])

    # reference: per video; combine as weighted mean over item counts
    ref = [
        _ref_cl_loss_ref(oracles, refs[b], slots[b], n_valid) for b in range(2)
    ]
    tot_items = sum(r[2] for r in ref)
    ref_reid = sum(r[0] * r[2] for r in ref) / tot_items
    ref_aux = sum(r[1] * r[2] for r in ref) / tot_items

    q4g = np.where(np.arange(N)[None] < n_valid, slots, -1)
    valid = np.arange(N)[None, :] < n_valid
    ours = jax.jit(reid_loss)(
        jnp.asarray(refs), jnp.asarray(q4g), jnp.asarray(np.tile(valid, (2, 1)))
    )
    assert _rel(ours["loss_reid"], ref_reid) < REL_TOL, (ours, ref_reid)
    assert _rel(ours["loss_aux_reid"], ref_aux) < REL_TOL, (ours, ref_aux)


# ---------------------------------------------------------------------------
# get_cl_loss_with_memory (offline refiner class-memory CL)
# ---------------------------------------------------------------------------


def test_reid_loss_with_memory_reference_parity(oracles):
    from dvis_plus_tpu.losses.reid import ClassMemory, reid_loss_with_memory

    meta = oracles["meta_architecture"]
    T, Q, C, N, K, M = 3, 6, 8, 3, 5, 20
    rng = np.random.RandomState(7)
    # two instances share a class so the memory interleaves their pushes
    labels = np.array([1, 3, 1], np.int64)

    class _Dummy:
        pass

    dummy = _Dummy()
    dummy.classes_references_memory = oracles["Outputs_Memory_PerClasses"](
        max_len=M
    )
    memory = ClassMemory.create(K, M, C)

    for call in range(2):  # call 2 exercises a non-empty memory bank
        embeds = rng.randn(T, Q, C).astype(np.float32)
        slots = rng.permutation(Q)[:N]

        match = (
            torch.as_tensor(slots, dtype=torch.int64),
            torch.arange(N, dtype=torch.int64),
        )
        outputs_ = {
            # reference layout: (1, C, T, Q); [0].permute(1,2,0) -> (T, Q, C)
            "pred_embds": torch.as_tensor(
                embeds.transpose(2, 0, 1)[None]
            ).clone()
        }
        targets = {"labels": torch.as_tensor(labels)}
        ref = meta.DVIS_Plus_offline.get_cl_loss_with_memory(
            dummy, outputs_, [match], [targets]
        )

        ours, memory = jax.jit(reid_loss_with_memory)(
            jnp.asarray(embeds)[None],
            jnp.asarray(slots, jnp.int32)[None],
            jnp.ones((1, N), bool),
            jnp.asarray(labels, jnp.int32)[None],
            memory,
        )
        assert _rel(ours["loss_reid"], float(ref["loss_reid"])) < REL_TOL, (
            call,
            ours,
            ref,
        )
        assert (
            _rel(ours["loss_aux_reid"], float(ref["loss_aux_reid"])) < REL_TOL
        ), (call, ours, ref)

    # the pushed memory banks agree (content + order), so parity holds for
    # any later step, not just call 2
    for cls in (1, 3):
        ref_bank = dummy.classes_references_memory.get_items(cls).numpy()
        n = int(memory.count[cls])
        assert n == ref_bank.shape[0]
        np.testing.assert_allclose(
            np.asarray(memory.embeds[cls, :n]), ref_bank, rtol=1e-6
        )


# ---------------------------------------------------------------------------
# CTVIS plugin (segmenter finetuning CL)
# ---------------------------------------------------------------------------


def test_ctvis_reference_parity(oracles, monkeypatch):
    import random as _random

    from dvis_plus_tpu.losses.ctvis import ctvis_reid_loss

    # py3.12 removed set support from random.sample; the reference calls
    # random.sample(set(...) - {anchor}, k) (ctvis.py:728-730) and sorts the
    # result, so a sorted()-coerced population is semantics-preserving
    orig_sample = _random.sample
    monkeypatch.setattr(
        _random, "sample", lambda pop, k: orig_sample(sorted(pop), k)
    )

    B, T, Q, C, N = 2, 3, 6, 8, 2
    NUM_NEG = 5  # Q-1: anchors always < NUM_NEG+1 => deterministic negatives
    rng = np.random.RandomState(11)
    embeds = rng.randn(B, T, Q, C).astype(np.float32)
    # per-frame matching (CTVIS matches each frame independently,
    # ctvis.py:862-880): slots vary across frames
    slots = np.stack(
        [[rng.permutation(Q)[:N] for _ in range(T)] for _ in range(B)]
    )  # (B, T, N)

    plugin = oracles["CTCLPlugin"](
        weight_dict={"loss_reid": 1.0, "loss_aux_reid": 1.0},
        num_negatives=NUM_NEG,
        sampling_frame_num=T,
        bio_cl=False,
        momentum_embed=False,
        noise_embed=False,
    )
    targets_list = [
        [{"valid": torch.ones(N, dtype=torch.bool)} for _ in range(B)]
        for _ in range(T)
    ]
    outputs_list = [
        {"pred_reid_embed": torch.as_tensor(embeds[:, t])} for t in range(T)
    ]
    indices_list = [
        [
            (
                torch.as_tensor(slots[b, t], dtype=torch.int64),
                torch.arange(N, dtype=torch.int64),
            )
            for b in range(B)
        ]
        for t in range(T)
    ]
    ref = plugin.get_reid_loss(targets_list, outputs_list, indices_list)

    ours = jax.jit(
        lambda r, e, q, v: ctvis_reid_loss(
            r, e, q, v, num_negatives=NUM_NEG, momentum_embed=False
        )
    )(
        jax.random.key(0),
        jnp.asarray(embeds),
        jnp.asarray(slots, jnp.int32),
        jnp.ones((B, N, T), bool),
    )
    assert _rel(ours["loss_reid"], float(ref["loss_reid"])) < REL_TOL, (
        ours,
        ref,
    )
    assert _rel(ours["loss_aux_reid"], float(ref["loss_aux_reid"])) < REL_TOL


def test_sgff_reference_parity(oracles):
    """Similarity-guided feature fusion vs TrainTracklet.update
    (ctvis.py:490-512), incl. gap frames (positive None)."""
    from dvis_plus_tpu.losses.ctvis import _sgff_scan

    C, T = 8, 6
    rng = np.random.RandomState(3)
    embeds = rng.randn(T, C).astype(np.float32)
    valid = np.array([True, True, False, True, False, True])

    tracklet = oracles["TrainTracklet"](0, momentum_embed=True)
    negs = torch.as_tensor(rng.randn(5, C).astype(np.float32))
    for t in range(T):
        pos = torch.as_tensor(embeds[t][None]) if valid[t] else None
        tracklet.update(pos, negs)

    ref_list = [e.numpy().squeeze(0) for e in tracklet.similarity_guided_reid_embed_list]
    ours = np.asarray(_sgff_scan(jnp.asarray(embeds), jnp.asarray(valid)))
    # reference list appends one entry per frame (valid or carried-forward)
    assert len(ref_list) == T
    np.testing.assert_allclose(ours, np.stack(ref_list), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Noiser training-time noise modes
# ---------------------------------------------------------------------------


def test_noiser_modes_reference_parity(oracles, monkeypatch):
    from dvis_plus_tpu.models.tracker.referring_tracker import (
        _cc_compose,
        _wa_compose,
    )

    Q, C = 7, 12
    rng = np.random.RandomState(5)
    cur = rng.randn(Q, 1, C).astype(np.float32)  # reference layout (q, b, c)
    perm = rng.permutation(Q)
    w = rng.rand(Q, 1).astype(np.float32)
    split = rng.randint(0, C, (Q,))

    noiser = oracles["Noiser"](noise_ratio=1.0, mode="rs")

    def fake_shuffle(lst):
        lst[:] = list(perm)

    monkeypatch.setattr(np.random, "shuffle", fake_shuffle)
    monkeypatch.setattr(
        torch, "rand", lambda *s, **k: torch.as_tensor(w[:, :, None])
    )
    monkeypatch.setattr(
        torch,
        "randint",
        lambda lo, hi, size, **k: torch.as_tensor(split, dtype=torch.int64),
    )

    cur_t = torch.as_tensor(cur)
    cur_j = jnp.asarray(cur[:, 0, :])

    # rs: pure shuffle
    idx_ref, init_ref = noiser._rs_noise_forward(cur_t)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(cur_j[jnp.asarray(perm)]), init_ref.numpy()[:, 0, :]
    )

    # wa: weighted-average shuffle (noiser.py:18-28)
    idx_ref, init_ref = noiser._wa_noise_forward(cur_t)
    idx_ours, init_ours = _wa_compose(cur_j, jnp.asarray(perm), jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(idx_ours), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(init_ours), init_ref.numpy()[:, 0, :], rtol=1e-6
    )

    # cc: channel crossover (noiser.py:30-41)
    idx_ref, init_ref = noiser._cc_noise_forward(cur_t)
    idx_ours, init_ours = _cc_compose(
        cur_j, jnp.asarray(perm), jnp.asarray(split)[:, None]
    )
    np.testing.assert_array_equal(np.asarray(idx_ours), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(init_ours), init_ref.numpy()[:, 0, :], rtol=1e-6
    )
