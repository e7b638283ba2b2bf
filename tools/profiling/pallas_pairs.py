"""Measure pallas local-window kernel per (query-level, value-level) pair at
Swin-L decoder shapes (T=5) and the full op, vs the exact gather op."""
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
L = len(shapes)
Lq = sum(h * w for h, w in shapes)
rng = np.random.RandomState(0)
value = jnp.asarray(rng.rand(B, Lq, M, D).astype(np.float32), jnp.bfloat16)
loc = jnp.asarray(rng.rand(B, Lq, M, L, P, 2).astype(np.float32))
attn = jnp.asarray(rng.rand(B, Lq, M, L, P).astype(np.float32))

from dvis_plus_tpu.ops.msdeform import ms_deform_attn
from dvis_plus_tpu.ops import msdeform_pallas as mp

t = timeit(jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a)), value, loc, attn)
print(f"exact gather op (3 levels):      {t*1e3:8.2f} ms")

t = timeit(jax.jit(lambda v, l, a: mp.ms_deform_attn_local(v, shapes, l, a)), value, loc, attn)
print(f"pallas local op (3 levels):      {t*1e3:8.2f} ms")

# per-pair: query level lq sampling value level lv
unit = 8 * (4 // 2)
starts = [0, shapes[0][0] * shapes[0][1], shapes[0][0] * shapes[0][1] + shapes[1][0] * shapes[1][1]]
for lq_i, (Hq, Wq) in enumerate(shapes):
    Lq_l = Hq * Wq
    for lv_i, (Hv, Wv) in enumerate(shapes):
        if not (Hv <= Hq and Wv <= Wq and Lq_l * M * P >= 65536):
            continue
        tile = mp._tile_for(
            Hq, Wq, sy=Hv / Hq, sx=Wv / Wq, radius=7,
            Hp=mp._rup(Hv + 2, unit), Wp=mp._rup(Wv + 2, unit), unit=unit,
            n_heads=M, table_bytes=2,
        )
        value_l = value[:, starts[lv_i] : starts[lv_i] + Hv * Wv]
        tab = jax.jit(lambda v: mp._pad_value_level(v, Hv, Wv, unit))(value_l)
        loc_q = loc[:, starts[lq_i] : starts[lq_i] + Lq_l, :, lv_i]
        attn_q = attn[:, starts[lq_i] : starts[lq_i] + Lq_l, :, lv_i]
        fn = jax.jit(lambda tb, lc, at: mp.deform_sample_window(
            tb, M, (Hv, Wv), lc, at, (Hq, Wq), radius=7, tile=tile))
        t = timeit(fn, tab, loc_q, attn_q)
        nt = (Hq // tile[0]) * (Wq // tile[1])
        print(f"pair q=s{lq_i} v=s{lv_i} tile={tile} steps={B*nt:5d}: {t*1e3:8.2f} ms")
