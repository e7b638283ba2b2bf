"""Orbax checkpoint roundtrip + partial stage-chaining loads."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    state = {
        "params": {"a": jnp.arange(6.0).reshape(2, 3), "b": {"w": jnp.ones((4,))}},
        "step": jnp.int32(7),
    }
    path = str(tmp_path / "ck1")
    ckpt.save(path, state)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore(path, template)
    np.testing.assert_allclose(np.asarray(restored["params"]["a"]), np.arange(6).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_partial_load_stage_chaining(tmp_path):
    """Stage-1 checkpoint loads into a larger stage-2 model: matching subtrees
    override, new components keep their init (DetectionCheckpointer
    non-strict semantics)."""
    stage1 = {"params": {"segmenter": {"w": jnp.full((3,), 2.0)}}}
    path = str(tmp_path / "stage1")
    ckpt.save(path, stage1)

    stage2_init = {
        "params": {
            "segmenter": {"w": jnp.zeros((3,))},
            "tracker": {"w": jnp.full((2,), 5.0)},
        }
    }
    merged = ckpt.load_weights(path, stage2_init)
    np.testing.assert_allclose(np.asarray(merged["params"]["segmenter"]["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(merged["params"]["tracker"]["w"]), 5.0)


def test_load_weights_from_trainstate_checkpoint(tmp_path):
    """Stage chaining through the CLI: cfg.weights points at a previous
    stage's TRAINING checkpoint (a full TrainState: step/params/opt_state,
    what do_train saves) — load_weights must strip the optimizer wrapper and
    merge the model params (reference MODEL.WEIGHTS accepts the previous
    stage's DetectionCheckpointer save the same way)."""
    state = {
        "step": jnp.asarray(7),
        "params": {"params": {"segmenter": {"w": jnp.full((3,), 2.0)}}},
        "opt_state": {"mu": {"params": {"segmenter": {"w": jnp.zeros((3,))}}}},
        "memory": {},
    }
    path = str(tmp_path / "stage1_state")
    ckpt.save(path, state)

    template = {
        "params": {
            "segmenter": {"w": jnp.zeros((3,))},
            "tracker": {"w": jnp.full((2,), 5.0)},
        }
    }
    merged = ckpt.load_weights(path, template)
    np.testing.assert_allclose(np.asarray(merged["params"]["segmenter"]["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(merged["params"]["tracker"]["w"]), 5.0)


def test_partial_load_shape_mismatch_keeps_init(tmp_path):
    old = {"params": {"head": {"w": jnp.ones((3, 4))}}}
    path = str(tmp_path / "old")
    ckpt.save(path, old)
    new = {"params": {"head": {"w": jnp.zeros((5, 4))}}}  # class count changed
    merged = ckpt.load_weights(path, new)
    assert merged["params"]["head"]["w"].shape == (5, 4)
    np.testing.assert_allclose(np.asarray(merged["params"]["head"]["w"]), 0.0)


def test_prefetch_to_device():
    from dvis_plus_tpu.data.build import prefetch_to_device

    batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    np.testing.assert_allclose(np.asarray(out[3]["x"]), 3.0)
