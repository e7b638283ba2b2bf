"""Bench the real SwinBlock stacks per stage (in-graph reps, true shapes)."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

import dvis_plus_tpu.models.backbones.swin as swin_mod

def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[::997].astype(jnp.float32)))

R = 8

def bench_block(mk_apply, x):
    """mk_apply: params -> fn(x)->x same shape. Chain R times in-graph."""
    def chained(n, p, x0):
        def body(c, _):
            return mk_apply(p, c), ()
        out, _ = lax.scan(body, x0, None, length=n)
        return out
    f1 = jax.jit(lambda p, x0: chained(1, p, x0))
    fR = jax.jit(lambda p, x0: chained(R, p, x0))
    return f1, fR

B = 5
rng = np.random.RandomState(0)
stages = [(1, 184, 320, 192, 6, 2), (2, 92, 160, 384, 12, 2), (3, 46, 80, 768, 24, 18), (4, 23, 40, 1536, 48, 2)]
tot = 0.0
for (si, H, W, C, nh, nb) in stages:
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
    # one (no-shift, shift) block pair as in the real net
    blk0 = swin_mod.SwinBlock(dim=C, num_heads=nh, window_size=12, shift_size=0,
                              dtype=jnp.bfloat16)
    blk1 = swin_mod.SwinBlock(dim=C, num_heads=nh, window_size=12, shift_size=6,
                              dtype=jnp.bfloat16)
    p0 = blk0.init(jax.random.key(0), x)
    p1 = blk1.init(jax.random.key(1), x)
    def apply_pair(p, c):
        y = blk0.apply(p[0], c)
        return blk1.apply(p[1], y)
    f1, fR = bench_block(apply_pair, x)
    p = (p0, p1)
    sync(f1(p, x)); sync(fR(p, x))
    t0 = time.perf_counter(); sync(f1(p, x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fR(p, x)); tR = time.perf_counter() - t0
    per_pair = (tR - t1) / (R - 1)
    stage_t = per_pair * (nb // 2)
    tot += stage_t
    print(f"s{si} block pair: {per_pair*1e3:7.2f} ms -> stage ({nb} blocks): {stage_t*1e3:7.1f} ms", flush=True)
print(f"sum of stages: {tot*1e3:.1f} ms (full backbone measured ~272 ms; patch embed/merge = remainder)")
