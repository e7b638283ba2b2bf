"""Swin-L ablation part 2: roll, partition, and pure-MLP floors."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

import dvis_plus_tpu.models.backbones.swin as swin_mod
from dvis_plus_tpu.core.config import BackboneConfig

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.asarray(leaves[0]).ravel()[::997].astype(jnp.float32)))

def timeit(fn, *args, reps=3):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps

T, H, W = 5, 736, 1280
cfg = BackboneConfig()
cfg.name = "swin_l"
cfg.swin_window_size = 12
rng = np.random.RandomState(0)
xb = jnp.asarray(rng.rand(T, H, W, 3).astype(np.float32), jnp.bfloat16)

def run(tag):
    bb = swin_mod.build_swin(cfg, dtype=jnp.bfloat16)
    pb = jax.jit(bb.init)(jax.random.key(0), xb)
    t = timeit(jax.jit(lambda p, x: bb.apply(p, x)), pb, xb)
    print(f"{tag:28s}: {t*1e3:8.1f} ms", flush=True)

orig_block_call = swin_mod.SwinBlock.__call__
orig_attn_call = swin_mod.WindowAttention.__call__

run("full (bf16 threaded)")

# no shift/roll
def no_shift(self, x, training=False):
    object.__setattr__(self, "shift_size", 0)
    return orig_block_call(self, x, training)
swin_mod.SwinBlock.__call__ = no_shift
run("no shift/roll")
swin_mod.SwinBlock.__call__ = orig_block_call

# identity attention, KEEP partition/reverse plumbing
def id_attn(self, x, mask=None):
    return x
swin_mod.WindowAttention.__call__ = id_attn
run("identity attn (keep part.)")
swin_mod.WindowAttention.__call__ = orig_attn_call

# skip partition/reverse AND attention (keep norms/MLP)
def block_noattn(self, x, training=False):
    B, H_, W_, C = x.shape
    d = self.dtype
    shortcut = x
    x = nn.LayerNorm(epsilon=1e-5, dtype=d, name="norm1")(x)
    x = shortcut + x
    y = nn.LayerNorm(epsilon=1e-5, dtype=d, name="norm2")(x)
    y = nn.Dense(int(C * self.mlp_ratio), dtype=d, name="mlp_fc1")(y)
    y = nn.gelu(y, approximate=False)
    y = nn.Dense(C, dtype=d, name="mlp_fc2")(y)
    return x + y
swin_mod.SwinBlock.__call__ = nn.compact(block_noattn)
run("norms+MLP only")
swin_mod.SwinBlock.__call__ = orig_block_call
