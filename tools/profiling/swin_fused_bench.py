"""v5e microbench: fused Pallas window attention vs the XLA paths.

Per-stage shapes for Swin-L at 736x1280, T=5 (the bench.py serving config).
Chained with lax.scan to beat relay dispatch jitter (round-2 methodology).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.ops.swin_window_attn import (
    fused_window_attention,
    window_attention_reference,
)

# (stage, nW/frame, C, H) for 736x1280 pad-to-12 windows, T=5 frames
STAGES = [
    ("s0", 16 * 27, 192, 6),
    ("s1", 8 * 14, 384, 12),
    ("s2", 4 * 7, 768, 24),
    ("s3", 2 * 4, 1536, 48),
]
N = 144
T = 5
REPS = 10


def _sync(x):
    return float(jnp.sum(x[..., ::64].astype(jnp.float32)))


def bench(fn, args, label):
    @jax.jit
    def chained(*a):
        def body(c, _):
            o = fn(*a[:-1], c) if False else fn(*a)
            return c, o[0, 0, 0]
        _, outs = jax.lax.scan(body, a[0], None, length=REPS)
        return outs

    chained(*args)[0].block_until_ready()
    _sync(chained(*args))
    t0 = time.perf_counter()
    s = _sync(chained(*args))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label}: {dt:.2f} ms/call  (chk {s:.3f})")
    return dt


def main():
    totals = {}
    for name, nw, C, H in STAGES:
        B_ = nw * T
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B_, N, C) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.randn(B_, N, C) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.randn(B_, N, C) * 0.1, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(H, N, N) * 0.1, jnp.bfloat16)
        ids = rng.randint(0, 3, (nw, N))
        mask = jnp.asarray(
            np.where(ids[:, None, :] != ids[:, :, None], -100.0, 0.0),
            jnp.bfloat16,
        )

        # numeric check vs oracle (fp32 inputs once, on-TPU compiled kernel)
        qf, kf, vf, bf, mf = (x.astype(jnp.float32) for x in (q, k, v, bias, mask))
        ref = window_attention_reference(qf, kf, vf, bf, mf, H)
        got = jax.jit(fused_window_attention, static_argnums=5)(qf, kf, vf, bf, mf, H)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"{name} fp32 max-abs-err vs oracle: {err:.2e}")

        for label, f in [
            ("fused", lambda q, k, v: fused_window_attention(q, k, v, bias, mask, H)),
            ("xla_ref", lambda q, k, v: window_attention_reference(q, k, v, bias, mask, H)),
        ]:
            dt = bench(f, (q, k, v), f"{name} {label} (masked)")
            totals.setdefault(label, 0.0)
            totals[label] += dt
    print("totals (one masked block per stage):", {k: round(v, 2) for k, v in totals.items()})


if __name__ == "__main__":
    main()
