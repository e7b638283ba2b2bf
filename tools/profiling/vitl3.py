"""ViT-Adapter-L finer breakdown: DinoViT trunk alone (flash on) vs full
adapter; plus trunk MLP/attn split via layer scan (736x1280, T=5, bf16)."""
import os, sys
sys.path.insert(0, "/root/repo")
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

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.backbones.vit_adapter import DinoViT

cfg = Config()
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(5, 736, 1280, 3).astype(np.float32), jnp.bfloat16)

trunk = DinoViT(attn_impl="flash", dtype=jnp.bfloat16)

class TrunkOnly:
    pass

def full_trunk(p, x):
    def fn(mdl, x):
        tok, cls, H, W = mdl.prepare_tokens(x)
        tok, cls = mdl.run_blocks(tok, cls, 0, 24)
        return tok
    return trunk.apply(p, x, method=fn)

p = jax.jit(lambda k, x: trunk.init(k, x, method=lambda mdl, x: mdl.run_blocks(*mdl.prepare_tokens(x)[:2], 0, 24)))(jax.random.key(0), x)
t = timeit(jax.jit(full_trunk), p, x)
print(f"DinoViT-L trunk alone bf16 flash (T=5): {t*1e3:8.1f} ms", flush=True)
