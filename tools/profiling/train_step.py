"""R50 online train-step timing on TPU (round-1 baseline: 1.42 s/step at
480x768, T=5, full criterion + consistent matching + ReID CL)."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.engine.trainer import Batch, build_train_step
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.meta.dvis_online import DVISOnline

cfg = Config()
cfg.model.meta_architecture = "dvis_online"
cfg.model.num_classes = 40
cfg.model.freeze = ("segmenter",)
cfg.model.transformer_decoder.reid_branch = True
cfg.solver.max_iter = 100

B, T, H, W, N = 1, 5, 480, 768, 10
model = DVISOnline(cfg.model)
images = jnp.zeros((B, T, H, W, 3), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), images)

rng = np.random.RandomState(0)
targets = VideoTargets(
    labels=jnp.asarray(rng.randint(0, 40, (B, N)), jnp.int32),
    masks=jnp.asarray(rng.rand(B, N, T, H // 4, W // 4) > 0.7),
    valid=jnp.asarray(np.ones((B, N), bool)),
    frame_valid=jnp.asarray(np.ones((B, N, T), bool)),
)
batch = Batch(images=jnp.asarray(rng.rand(B, T, H, W, 3), jnp.float32), targets=targets)

train_step, init_state = build_train_step(cfg, model)
state = init_state(params)

key = jax.random.key(1)
state, metrics = train_step(state, batch, key)
print("first loss:", float(metrics["total_loss"]), flush=True)
t0 = time.perf_counter()
n = 5
for i in range(n):
    state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
_ = float(metrics["total_loss"])
dt = (time.perf_counter() - t0) / n
print(f"train step: {dt*1e3:.0f} ms (round-1 baseline 1420 ms)")
