"""Does ws-divisibility of (H, W) explain the Swin block slowness?"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

import dvis_plus_tpu.models.backbones.swin as swin_mod

def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[::997].astype(jnp.float32)))

R = 8

def bench_pair(C, nh, H, W, tag):
    B = 5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
    blk0 = swin_mod.SwinBlock(dim=C, num_heads=nh, window_size=12, shift_size=0, dtype=jnp.bfloat16)
    blk1 = swin_mod.SwinBlock(dim=C, num_heads=nh, window_size=12, shift_size=6, dtype=jnp.bfloat16)
    p = (blk0.init(jax.random.key(0), x), blk1.init(jax.random.key(1), x))
    def chained(n, p, x0):
        def body(c, _):
            return blk1.apply(p[1], blk0.apply(p[0], c)), ()
        out, _ = lax.scan(body, x0, None, length=n)
        return out
    f1 = jax.jit(lambda p, x0: chained(1, p, x0))
    fR = jax.jit(lambda p, x0: chained(R, p, x0))
    sync(f1(p, x)); sync(fR(p, x))
    t0 = time.perf_counter(); sync(f1(p, x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fR(p, x)); tR = time.perf_counter() - t0
    print(f"{tag:34s}: {(tR-t1)/(R-1)*1e3:7.2f} ms/pair", flush=True)

bench_pair(192, 6, 184, 320, "s1 184x320 (pad 192x324)")
bench_pair(192, 6, 192, 312, "s1 192x312 (no pad)")
bench_pair(192, 6, 192, 324, "s1 192x324 (no pad, W%8!=0)")
bench_pair(768, 24, 46, 80, "s3 46x80 (pad 48x84)")
bench_pair(768, 24, 48, 84, "s3 48x84 (no pad)")
bench_pair(768, 24, 48, 96, "s3 48x96 (no pad, W%8=0)")
