"""Splash-attention probe at ViT-L trunk scale (B=5, H=16, L=3681, Dh=64)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as sk
from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as sm

B, L, H, Dh = 5, 3681, 16, 64
Lp = 4096
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, Lp, Dh), jnp.bfloat16)

def timeit(fn, *args, reps=2):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

for bq, bkv in ((512, 1024), (1024, 1024), (2048, 1024), (512, 2048), (1024, 4096), (4096, 4096)):
    try:
        mask = sm.FullMask(_shape=(Lp, Lp))
        mmask = sm.MultiHeadMask([mask for _ in range(H)])
        bs = sk.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=min(bkv, 512))
        kernel = sk.make_splash_mha(mask=mmask, head_shards=1, q_seq_shards=1, block_sizes=bs)
        @jax.jit
        def run(q):
            def one(x):
                return jax.vmap(kernel)(x * (Dh ** -0.5), x, x)
            def body(c, _):
                return one(c).astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, q, None, length=8)
            return y
        t = timeit(run, q) / 8
        print(f"splash bq={bq} bkv={bkv}: {t*1e3:7.2f} ms/layer-attn", flush=True)
    except Exception as e:
        print(f"splash bq={bq} bkv={bkv}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
