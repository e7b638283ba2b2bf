"""Probe: dense XLA attention vs Pallas flash attention for the ViT-L trunk.

ViT-L @ 736x1280 stride-16: N = 46*80 + 1 cls = 3681 tokens/frame, B=5
frames, 16 heads, Dh=64. The dense path materializes fp32 logits
(B,H,N,N) ~ 4.3 GB of HBM traffic per layer; flash keeps scores in VMEM.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[::997].astype(jnp.float32)))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def dense(q, k, v):
    # mirrors transformer_decoder._attention (fp32 logits + softmax)
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(dh))
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def main():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, N, H, Dh = 5, 3681, 16, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32), jnp.bfloat16)

    t_dense = timeit(jax.jit(dense), q, k, v)
    print(f"dense   N={N}: {t_dense*1e3:8.2f} ms", flush=True)

    for Np, blk in [(3712, 128), (4096, 512)]:
        pad = Np - N

        def to_bhnd(x):
            xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            return xp.transpose(0, 2, 1, 3)  # (B, H, N, Dh)

        bs = fa.BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1
        )
        seg = jnp.concatenate(
            [jnp.ones((B, N), jnp.int32), jnp.zeros((B, pad), jnp.int32)], axis=1
        )
        segs = fa.SegmentIds(q=jnp.ones((B, Np), jnp.int32), kv=seg)

        @jax.jit
        def flash(q, k, v):
            out = fa.flash_attention(
                to_bhnd(q), to_bhnd(k), to_bhnd(v),
                segment_ids=segs,
                sm_scale=1.0 / float(np.sqrt(Dh)),
                block_sizes=bs,
            )
            return out[:, :, :N].transpose(0, 2, 1, 3)

        try:
            t_flash = timeit(flash, q, k, v)
            ref = dense(q, k, v)
            got = flash(q, k, v)
            err = float(
                jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            print(
                f"flash pad={Np} blk={blk}: {t_flash*1e3:8.2f} ms "
                f"(maxerr vs dense {err:.2e})",
                flush=True,
            )
        except Exception as e:
            print(f"flash pad={Np} blk={blk}: FAILED {type(e).__name__}: {e}"[:400])


if __name__ == "__main__":
    main()
