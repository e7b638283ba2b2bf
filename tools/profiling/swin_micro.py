"""Microbench Swin-L pieces at true shapes (T=5, 736x1280), in-graph reps.

Each piece is wrapped in a lax.scan chain with a scalar data dependency so
XLA cannot hoist it; cost = (t(R reps) - t(1 rep)) / (R - 1), which cancels
the multi-ms axon-relay dispatch+sync overhead.
"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[::997].astype(jnp.float32)))

R = 16

def bench(fn, *args):
    def chained(n_reps, *a):
        def body(carry, _):
            s = carry
            out = fn(*(x * (1 + s * 1e-12) if i == 0 else x for i, x in enumerate(a)))
            s2 = out.ravel()[0].astype(jnp.float32)
            return s2, ()
        s, _ = lax.scan(body, jnp.float32(0), None, length=n_reps)
        return s
    f1 = jax.jit(lambda *a: chained(1, *a))
    fR = jax.jit(lambda *a: chained(R, *a))
    sync(f1(*args)); sync(fR(*args))
    t0 = time.perf_counter(); sync(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fR(*args)); tR = time.perf_counter() - t0
    return (tR - t1) / (R - 1)

B = 5
ws = 12
rng = np.random.RandomState(0)
stages = [(1, 184, 320, 192, 6, 2), (2, 92, 160, 384, 12, 2), (3, 46, 80, 768, 24, 18), (4, 23, 40, 1536, 48, 2)]

tot = {}
def rec(k, t, nb, si):
    tot[k] = tot.get(k, 0.0) + t * nb
    print(f"s{si} {k:24s}: {t*1e3:7.2f} ms", flush=True)

for (si, H, W, C, nh, nb) in stages:
    Hp = (H + ws - 1) // ws * ws
    Wp = (W + ws - 1) // ws * ws
    hb, wb = Hp // ws, Wp // ws
    B_ = B * hb * wb
    N = ws * ws
    Dh = C // nh
    x = jnp.asarray(rng.rand(B, Hp, Wp, C).astype(np.float32), jnp.bfloat16)

    def part(x):
        w = x.reshape(B, hb, ws, wb, ws, C).transpose(0, 1, 3, 2, 4, 5)
        return w.reshape(B_, N, C)
    def part_rev(x):
        w = part(x) * 1.0001
        y = w.reshape(B, hb, wb, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(B, Hp, Wp, C) + x
    rec("partition+reverse", bench(part_rev, x), nb, si)

    k = jnp.asarray(rng.rand(C, 3 * C).astype(np.float32), jnp.bfloat16)
    xw = jax.jit(part)(x)
    rec("qkv windowed", bench(lambda a, b: a @ b, xw, k), nb, si)
    xr = x.reshape(B, Hp * Wp, C)
    rec("qkv raster", bench(lambda a, b: a @ b, xr, k), nb, si)

    q = jnp.asarray(rng.rand(B_, nh, N, Dh).astype(np.float32), jnp.bfloat16)
    kk = jnp.asarray(rng.rand(B_, nh, N, Dh).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.rand(B_, nh, N, Dh).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.rand(nh, N, N).astype(np.float32))

    def core(q, k, v):
        at = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        at = at * (Dh ** -0.5) + bias[None]
        at = jax.nn.softmax(at, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", at, v)
    rec("attn core", bench(core, q, kk, v), nb, si)

    def core_bf16(q, k, v):
        at = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        at = at * (Dh ** -0.5) + bias[None].astype(at.dtype)
        at = jax.nn.softmax(at, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", at, v)
    rec("attn core all-bf16", bench(core_bf16, q, kk, v), nb, si)

    # merged-head layout: tokens x (heads*Dh) with head-blocked matmuls
    qm = q.transpose(0, 2, 1, 3).reshape(B_, N, C)
    def core_merged(qm, km, vm):
        qh = qm.reshape(B_, N, nh, Dh)
        kh = km.reshape(B_, N, nh, Dh)
        vh = vm.reshape(B_, N, nh, Dh)
        at = jnp.einsum("bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32)
        at = at * (Dh ** -0.5) + bias[None]
        at = jax.nn.softmax(at, axis=-1).astype(vm.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", at, vh)
        return o.reshape(B_, N, C)
    rec("attn core merged-head", bench(core_merged, qm, qm, qm), nb, si)

print("--- totals x n_blocks ---")
for k2, v2 in tot.items():
    print(f"{k2:24s}: {v2*1e3:8.1f} ms")
