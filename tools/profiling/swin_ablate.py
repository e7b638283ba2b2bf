"""Ablate Swin-L forward cost: attention vs MLP vs partition/roll plumbing."""
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

orig_attn_call = swin_mod.WindowAttention.__call__

def run(tag):
    bb = swin_mod.build_swin(cfg)
    pb = jax.jit(bb.init)(jax.random.key(0), xb)
    t = timeit(jax.jit(lambda p, x: bb.apply(p, x)), pb, xb)
    print(f"{tag:28s}: {t*1e3:8.1f} ms")

run("full")

# (b) attention replaced by qkv+proj only (keeps the Dense flops, drops
# scores/softmax/attention matmuls + rel-pos gather)
def no_attn(self, x, mask=None):
    B_, N, C = x.shape
    qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
    v = qkv[..., 2 * C :]
    return nn.Dense(C, name="proj")(v)

swin_mod.WindowAttention.__call__ = nn.compact(no_attn)
run("no attention core")
swin_mod.WindowAttention.__call__ = orig_attn_call

# (c) no rel-pos bias gather
def no_bias(self, x, mask=None):
    B_, N, C = x.shape
    Hh = self.num_heads
    Dh = C // Hh
    qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
    q, k, v = jnp.split(qkv.reshape(B_, N, 3, Hh, Dh), 3, axis=2)
    q = q[:, :, 0].transpose(0, 2, 1, 3)
    k = k[:, :, 0].transpose(0, 2, 1, 3)
    v = v[:, :, 0].transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = attn * (Dh**-0.5)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, Hh, N, N) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(B_, Hh, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
    return nn.Dense(C, name="proj")(out)

swin_mod.WindowAttention.__call__ = nn.compact(no_bias)
run("no rel-pos bias")
swin_mod.WindowAttention.__call__ = orig_attn_call

# (d) all-bf16 scores (no fp32 in attention)
def bf16_attn(self, x, mask=None):
    B_, N, C = x.shape
    Hh = self.num_heads
    Dh = C // Hh
    ws = self.window_size
    qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
    q, k, v = jnp.split(qkv.reshape(B_, N, 3, Hh, Dh), 3, axis=2)
    q = q[:, :, 0].transpose(0, 2, 1, 3)
    k = k[:, :, 0].transpose(0, 2, 1, 3)
    v = v[:, :, 0].transpose(0, 2, 1, 3)
    table = self.param(
        "relative_position_bias_table",
        nn.initializers.truncated_normal(0.02),
        ((2 * ws - 1) ** 2, Hh),
    )
    idx = jnp.asarray(swin_mod._rel_pos_index(ws))
    bias = table[idx.reshape(-1)].reshape(N, N, Hh).transpose(2, 0, 1)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)  # bf16
    attn = attn * (Dh**-0.5) + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, Hh, N, N) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(B_, Hh, N, N)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
    return nn.Dense(C, name="proj")(out)

swin_mod.WindowAttention.__call__ = nn.compact(bf16_attn)
run("bf16 scores")
swin_mod.WindowAttention.__call__ = orig_attn_call

# (e) no shifted windows (isolates roll cost; wrong semantics, timing only)
orig_block_call = swin_mod.SwinBlock.__call__
import types
def no_shift(self, x, training=False):
    object.__setattr__(self, "shift_size", 0)
    return orig_block_call(self, x, training)
swin_mod.SwinBlock.__call__ = no_shift
run("no shift/roll")
swin_mod.SwinBlock.__call__ = orig_block_call

# (f) identity attention but KEEP partition/reverse plumbing
def id_attn(self, x, mask=None):
    return x
swin_mod.WindowAttention.__call__ = id_attn
run("identity attn (keep part.)")
swin_mod.WindowAttention.__call__ = orig_attn_call

# (g) skip partition/reverse AND attention entirely (keep norms/MLP/merge)
def block_noattn(self, x, training=False):
    B, H_, W_, C = x.shape
    shortcut = x
    x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
    x = shortcut + x
    y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
    y = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(y)
    y = nn.gelu(y, approximate=False)
    y = nn.Dense(C, name="mlp_fc2")(y)
    return x + y
orig_block_call2 = swin_mod.SwinBlock.__call__
swin_mod.SwinBlock.__call__ = nn.compact(block_noattn)
run("norms+MLP only")
swin_mod.SwinBlock.__call__ = orig_block_call2
