"""Steady-state vs random-init train-step timing (VERDICT r3 next #8).

NOTES perf #3 claims the noiser's in-graph auction LAP is the largest single
item at RANDOM INIT (~458 bidding rounds on near-uniform cosine costs, ~26%
of the R50 online step) and that the round count collapses once the ReID
embeddings separate. This script proves/refutes that once: time N steps at
random init, overfit one structured batch until the loss drops, then time N
steps again at the converged weights. Same executable, same shapes — only
the data-dependent while-loop trip counts can change.

Run on the real chip:  python tools/profiling/steady_state_step.py
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.engine.trainer import Batch, build_train_step
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.dvis_online import DVISOnline


def structured_batch(B, T, H, W, N, seed=0):
    """Overfittable clip: N disjoint constant-color moving rectangles on a
    gradient background — ReID embeddings separate fast on this."""
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    base = np.stack([yy, xx, 0.5 * (yy + xx)], -1).astype(np.float32)
    images = np.tile(base, (B, T, 1, 1, 1)).reshape(B, T, H, W, 3)
    masks = np.zeros((B, N, T, H // 4, W // 4), bool)
    colors = rng.rand(N, 3).astype(np.float32)
    h_box, w_box = H // (N + 1), W // 6
    for b in range(B):
        for k in range(N):
            y0 = k * (H // N)
            for t in range(T):
                x0 = (W // 8 + t * 8 + k * 11) % (W - w_box)
                images[b, t, y0 : y0 + h_box, x0 : x0 + w_box] = colors[k]
                masks[b, k, t, y0 // 4 : (y0 + h_box) // 4,
                      x0 // 4 : (x0 + w_box) // 4] = True
    labels = rng.randint(0, 40, (B, N)).astype(np.int32)
    return Batch(
        images=jnp.asarray(images),
        targets=VideoTargets(
            labels=jnp.asarray(labels),
            masks=jnp.asarray(masks),
            valid=jnp.ones((B, N), bool),
            frame_valid=jnp.ones((B, N, T), bool),
        ),
    )


def time_steps(train_step, state, batch, key, n=10):
    # run-to-run state threading keeps the executable identical; the data
    # (and thus the auction trip counts) is what differs between phases
    for i in range(2):  # settle
        state, m = train_step(state, batch, jax.random.fold_in(key, 1000 + i))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n):
        state, m = train_step(state, batch, jax.random.fold_in(key, 2000 + i))
    jax.block_until_ready(state.params)
    return (time.perf_counter() - t0) / n, state, float(m["total_loss"])


def main():
    cfg = Config()
    cfg.model.meta_architecture = "dvis_online"
    cfg.model.num_classes = 40
    cfg.model.freeze = ("segmenter",)
    cfg.model.transformer_decoder.reid_branch = True
    cfg.solver.max_iter = 10000
    cfg.solver.base_lr = 2e-4
    cfg.solver.warmup_iters = 20

    B, T, H, W, N = 1, 5, 480, 768, 8
    model = DVISOnline(cfg.model)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((B, T, H, W, 3), jnp.float32)
    )
    batch = structured_batch(B, T, H, W, N)
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    key = jax.random.key(1)

    state, m0 = train_step(state, batch, key)  # compile
    loss0 = float(m0["total_loss"])
    dt_init, state, _ = time_steps(train_step, state, batch, key, n=10)
    print(f"random-init step: {dt_init*1e3:.0f} ms (first loss {loss0:.2f})",
          flush=True)

    n_train = int(os.environ.get("STEPS", "150"))
    for i in range(n_train):
        state, m = train_step(state, batch, jax.random.fold_in(key, i))
        if i % 25 == 0:
            print(f"  step {i}: loss {float(m['total_loss']):.2f}", flush=True)
    loss_end = float(m["total_loss"])

    dt_conv, state, _ = time_steps(train_step, state, batch, key, n=10)
    print(
        f"steady-state step: {dt_conv*1e3:.0f} ms after {n_train} overfit "
        f"steps (loss {loss0:.2f} -> {loss_end:.2f}); "
        f"init/steady ratio {dt_init/dt_conv:.2f}x"
    )


if __name__ == "__main__":
    main()
