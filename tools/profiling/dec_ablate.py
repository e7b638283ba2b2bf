"""Pixel decoder ablations at Swin dims: op share, fp32-island cost."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np

import dvis_plus_tpu.models.segmenter.pixel_decoder as pd_mod
import dvis_plus_tpu.ops.msdeform as md

def sync(x):
    return float(jnp.sum(jnp.asarray(x)[..., ::64].astype(jnp.float32)))

def timeit(fn, *args, reps=3):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps

T, H, W = 5, 736, 1280
rng = np.random.RandomState(0)
feats = {}
for name, s, c in [("res2", 4, 192), ("res3", 8, 384), ("res4", 16, 768), ("res5", 32, 1536)]:
    feats[name] = jnp.asarray(rng.rand(T, H // s, W // s, c).astype(np.float32), jnp.bfloat16)

def run(tag, **kw):
    dec = pd_mod.MSDeformAttnPixelDecoder(**kw)
    p = jax.jit(dec.init)(jax.random.key(0), feats)
    t = timeit(jax.jit(lambda p, x: dec.apply(p, x)[0]), p, feats)
    print(f"{tag:40s}: {t*1e3:8.1f} ms")
    return t

run("fp32 island, fp32 values")
run("fp32 island, bf16 values", value_dtype="bfloat16")
run("bf16 island, bf16 values", value_dtype="bfloat16", island_dtype="bfloat16")

# op replaced by value passthrough (keeps projections/FFN, drops sampling)
orig = md.ms_deform_attn
def fake_op(value, shapes, loc, attn):
    B, L, M, D = value.shape
    return value.reshape(B, L, M * D) * jnp.mean(attn)
md.ms_deform_attn = fake_op
pd_mod.ms_deform_attn = fake_op
run("op removed (bf16 island plumbing)", value_dtype="bfloat16", island_dtype="bfloat16")
md.ms_deform_attn = orig
pd_mod.ms_deform_attn = orig
