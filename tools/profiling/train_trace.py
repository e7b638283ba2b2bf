"""Device-trace one R50-online train step and dump top HLO ops."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import glob
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
jax.block_until_ready(state.params)

logdir = "/tmp/train_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
state, metrics = train_step(state, batch, jax.random.fold_in(key, 7))
jax.block_until_ready(state.params)
jax.profiler.stop_trace()
print("trace at", glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
