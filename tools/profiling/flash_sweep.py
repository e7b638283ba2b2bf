"""Flash-attention block-size / padding sweep at ViT-L trunk scale.
B=5 frames, H=16 heads, L=3681 tokens, Dh=64, bf16. Chained x8 via lax.scan
to beat relay dispatch jitter."""
import sys, time
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

B, L, H, Dh = 5, 3681, 16, 64
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, L, Dh), jnp.bfloat16)

def timeit(fn, *args, reps=2):
    out = jax.block_until_ready(fn(*args))
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[::997].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[::997].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps

def run(pad_mult, bq, bk, use_seg, reps=8):
    Lp = -(-L // pad_mult) * pad_mult
    pad = Lp - L
    qq = jnp.pad(q, ((0,0),(0,0),(0,pad),(0,0)))
    seg = None
    if use_seg and pad:
        kv = jnp.concatenate([jnp.ones((B, L), jnp.int32), jnp.zeros((B, pad), jnp.int32)], 1)
        seg = fa.SegmentIds(q=jnp.ones((B, Lp), jnp.int32), kv=kv)
    block = fa.BlockSizes(block_q=min(bq, Lp), block_k_major=min(bk, Lp), block_k=min(bk, Lp), block_b=1)
    def one(x):
        return fa.flash_attention(x, x, x, segment_ids=seg, sm_scale=Dh**-0.5, block_sizes=block)
    @jax.jit
    def chain(x):
        def body(c, _):
            return one(c), ()
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y
    try:
        t = timeit(chain, qq) / reps
        print(f"pad={pad_mult:5d} Lp={Lp} bq={bq:4d} bk={bk:4d} seg={int(use_seg)}: {t*1e3:7.2f} ms/layer-attn", flush=True)
    except Exception as e:
        print(f"pad={pad_mult:5d} bq={bq} bk={bk} seg={int(use_seg)}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)

# current config
run(1024, 512, 1024, True)
# no segment ids (pure padding -> wrong result, upper bound of seg cost)
run(1024, 512, 1024, False)
# tighter padding
run(128, 512, 1024, True)
run(256, 512, 928, True)
# bigger/smaller blocks
for bq, bk in ((1024, 1024), (2048, 1024), (512, 2048), (1024, 2048), (2048, 2048), (256, 1024), (512, 512), (4096, 4096)):
    run(1024, bq, bk, True)
