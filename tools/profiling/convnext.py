"""CLIP ConvNeXt-L trunk timing at 736x1280, T=5 (OV serving backbone)."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.asarray(leaves[0]).ravel()[::997].astype(jnp.float32)))

def timeit(fn, *args, reps=3):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps

from dvis_plus_tpu.models.ov.clip_backbone import ConvNeXt

rng = np.random.RandomState(0)
model = ConvNeXt()
for tag, dt in [("fp32 input", jnp.float32), ("bf16 input", jnp.bfloat16)]:
    x = jnp.asarray(rng.rand(5, 736, 1280, 3).astype(np.float32), dt)
    p = jax.jit(model.init)(jax.random.key(0), x)
    t = timeit(jax.jit(lambda p, x: model.apply(p, x)["clip_vis_dense"]), p, x)
    print(f"convnext-l trunk {tag} (T=5): {t*1e3:8.1f} ms", flush=True)
