"""JV vs auction LAP solve times at matcher shapes (in-graph scan chain)."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

from dvis_plus_tpu.losses.matcher import _PAD_COST, solve_lap

def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))

R = 8

def bench(solver, N, Q, n_pad_rows):
    rng = np.random.RandomState(0)
    C = rng.rand(N, Q).astype(np.float32) * 20.0
    C[:n_pad_rows] = _PAD_COST
    C = jnp.asarray(C)

    def chained(n, c):
        def body(carry, _):
            q = solve_lap(c + carry * 1e-12, solver)
            return q.sum().astype(jnp.float32), ()
        s, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return s
    f1 = jax.jit(lambda c: chained(1, c))
    fR = jax.jit(lambda c: chained(R, c))
    sync(f1(C)); sync(fR(C))
    t0 = time.perf_counter(); sync(f1(C)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fR(C)); tR = time.perf_counter() - t0
    print(f"{solver:8s} N={N:3d} Q={Q:3d} pads={n_pad_rows:2d}: {(tR-t1)/(R-1)*1e3:8.2f} ms/solve", flush=True)

for (N, Q, p) in [(10, 100, 0), (10, 100, 5), (50, 100, 25), (50, 200, 25), (100, 200, 50)]:
    bench("jv", N, Q, p)
    bench("auction", N, Q, p)

# square tracker-style problems (noiser match_embds shape)
from dvis_plus_tpu.ops.assignment import auction_lap

def bench_sq(fn, tag, Q):
    rng = np.random.RandomState(0)
    a = rng.randn(Q, 64); a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.randn(Q, 64); b /= np.linalg.norm(b, axis=1, keepdims=True)
    C = jnp.asarray(1.0 - a @ b.T, jnp.float32)
    def chained(n, c):
        def body(carry, _):
            q = fn(c + carry * 1e-12)
            return q.sum().astype(jnp.float32), ()
        s, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return s
    f1 = jax.jit(lambda c: chained(1, c))
    fR = jax.jit(lambda c: chained(R, c))
    sync(f1(C)); sync(fR(C))
    t0 = time.perf_counter(); sync(f1(C)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fR(C)); tR = time.perf_counter() - t0
    print(f"{tag:22s} Q={Q:3d}: {(tR-t1)/(R-1)*1e3:8.2f} ms/solve", flush=True)

for Q in (100, 200):
    bench_sq(auction_lap, "auction square", Q)
