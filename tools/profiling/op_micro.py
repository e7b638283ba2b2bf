"""Microbench ms_deform_attn internals at Swin-L decoder shapes (T=5)."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np

def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[::997].astype(jnp.float32)))

def timeit(fn, *args, reps=5):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps

B, M, D, P = 5, 8, 32, 4
shapes = [(92, 160), (46, 80), (23, 40)]
Lq = sum(h * w for h, w in shapes)
Len = Lq
rng = np.random.RandomState(0)
value = jnp.asarray(rng.rand(B, Len, M, D).astype(np.float32), jnp.bfloat16)
loc = jnp.asarray(rng.rand(B, Lq, M, len(shapes), P, 2).astype(np.float32))
attn = jnp.asarray(rng.rand(B, Lq, M, len(shapes), P).astype(np.float32))

from dvis_plus_tpu.ops.msdeform import ms_deform_attn
t = timeit(jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a)), value, loc, attn)
print(f"full op (3 levels):        {t*1e3:8.2f} ms")

# per-level components at the stride-8 level (the big one)
H, W = shapes[0]
value_l = value[:, : H * W]

def table_build(v_l):
    v = v_l.reshape(B, H, W, M, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    v4 = jnp.stack(
        [vp[:, : H + 1, : W + 1], vp[:, : H + 1, 1:], vp[:, 1:, : W + 1], vp[:, 1:, 1:]],
        axis=4,
    )
    return v4.transpose(0, 3, 1, 2, 4, 5).reshape(B * M * (H + 1) * (W + 1), 4 * D)

t = timeit(jax.jit(table_build), value_l)
print(f"corner-table build (s8):   {t*1e3:8.2f} ms")

tab = jax.jit(table_build)(value_l)
idx = jnp.asarray(rng.randint(0, B * M * (H + 1) * (W + 1), size=(B, M, Lq, P)), jnp.int32)

t = timeit(jax.jit(lambda tb, ix: jnp.take(tb, ix.reshape(-1), axis=0)), tab, idx)
print(f"flat gather 4D-rows (s8):  {t*1e3:8.2f} ms")

g = jnp.take(tab, idx.reshape(-1), axis=0).reshape(B, M, Lq, P * 4, D)
w = jnp.asarray(rng.rand(B, M, Lq, 1, P * 4).astype(np.float32), jnp.bfloat16)
t = timeit(
    jax.jit(lambda w_, g_: jax.lax.dot_general(
        w_, g_, (((4,), (3,)), ((0, 1, 2), (0, 1, 2))), preferred_element_type=jnp.bfloat16)),
    w, g,
)
print(f"weighting batched dot:     {t*1e3:8.2f} ms")

# gather granularity test: 1 row of 128 bf16 vs gathering plain D=32 rows
tab32 = tab.reshape(-1, D)
idx32 = jnp.asarray(rng.randint(0, tab32.shape[0], size=(B * M * Lq * P,)), jnp.int32)
t = timeit(jax.jit(lambda tb, ix: jnp.take(tb, ix, axis=0)), tab32, idx32)
print(f"gather 32ch rows same N:   {t*1e3:8.2f} ms")

# wider rows, fewer gathers: 256ch rows at N/2
tab256 = tab.reshape(-1, 256)
idx256 = jnp.asarray(rng.randint(0, tab256.shape[0], size=(B * M * Lq * P // 2,)), jnp.int32)
t = timeit(jax.jit(lambda tb, ix: jnp.take(tb, ix, axis=0)), tab256, idx256)
print(f"gather 256ch rows N/2:     {t*1e3:8.2f} ms")

# fp32 table
tabf = tab.astype(jnp.float32)
t = timeit(jax.jit(lambda tb, ix: jnp.take(tb, ix.reshape(-1), axis=0)), tabf, idx)
print(f"flat gather fp32 rows:     {t*1e3:8.2f} ms")
