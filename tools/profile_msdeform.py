"""Profile the deformable-attention paths on the real TPU.

Times (a) the full 6-layer MSDeformAttn pixel decoder forward at R50-720p
shapes, exact vs pallas_local, and (b) the isolated op per (query-level,
value-level) pair, to locate where the integrated pallas path loses.

Run on the TPU host:  python tools/profile_msdeform.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.asarray(x)[..., ::64].astype(jnp.float32)))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def profile_decoder(H=736, W=1280, value_dtype="bfloat16"):
    from dvis_plus_tpu.models.segmenter.pixel_decoder import MSDeformAttnPixelDecoder

    feats = {}
    rng = np.random.RandomState(0)
    for name, s in [("res2", 4), ("res3", 8), ("res4", 16), ("res5", 32)]:
        feats[name] = jnp.asarray(
            rng.rand(1, H // s, W // s, {4: 256, 8: 512, 16: 1024, 32: 2048}[s]).astype(
                np.float32
            ),
            jnp.bfloat16,
        )

    for impl in ["exact", "pallas_local"]:
        dec = MSDeformAttnPixelDecoder(impl=impl, value_dtype=value_dtype)
        params = jax.jit(dec.init)(jax.random.key(0), feats)
        f = jax.jit(lambda p, x: dec.apply(p, x)[0])
        t = timeit(f, params, feats)
        print(f"decoder[{impl:12s}] {t*1e3:8.2f} ms")


def profile_pairs(H=736, W=1280, value_dtype="bfloat16"):
    from dvis_plus_tpu.ops.msdeform import ms_deform_attn, _bilinear_gather_level
    from dvis_plus_tpu.ops.msdeform_pallas import (
        ms_deform_attn_local,
        deform_sample_level_pallas_dma,
        _build_corner_table,
        _tile_for,
    )

    shapes = [(H // 32, W // 32), (H // 16, W // 16), (H // 8, W // 8)]
    Len = sum(h * w for h, w in shapes)
    M, D, P = 8, 32, 4
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.rand(1, Len, M, D).astype(np.float32))
    loc = jnp.asarray(rng.rand(1, Len, M, len(shapes), P, 2).astype(np.float32))
    att = jax.nn.softmax(
        jnp.asarray(rng.rand(1, Len, M, len(shapes) * P).astype(np.float32)), -1
    ).reshape(1, Len, M, len(shapes), P)

    vd = jnp.dtype(value_dtype)
    t_full = timeit(
        jax.jit(lambda v, l, a: ms_deform_attn(v.astype(vd), shapes, l, a)),
        value, loc, att,
    )
    print(f"exact full op (all pairs, 1 layer): {t_full*1e3:8.2f} ms")
    t_pl = timeit(
        jax.jit(lambda v, l, a: ms_deform_attn_local(v.astype(vd), shapes, l, a)),
        value, loc, att,
    )
    print(f"pallas full op (all pairs, 1 layer): {t_pl*1e3:8.2f} ms")

    # per-pair breakdown for the pallas path
    starts = []
    s = 0
    for (h, w) in shapes:
        starts.append(s)
        s += h * w
    for lq, (Hq, Wq) in enumerate(shapes):
        for lv, (Hv, Wv) in enumerate(shapes):
            Lq = Hq * Wq
            sq = starts[lq]
            if Hv <= Hq and Wv <= Wq:
                tile = _tile_for(Hq, Wq, sy=Hv / Hq, sx=Wv / Wq, radius=8,
                                 H1=Hv + 1, W1=Wv + 1)

                def f(v, l, a):
                    vl = jax.lax.dynamic_slice_in_dim(v, starts[lv], Hv * Wv, 1)
                    tab = _build_corner_table(vl.astype(jnp.float32), Hv, Wv)
                    lq_ = jax.lax.dynamic_slice_in_dim(l, sq, Lq, 1)[:, :, :, lv]
                    aq_ = jax.lax.dynamic_slice_in_dim(a, sq, Lq, 1)[:, :, :, lv]
                    return deform_sample_level_pallas_dma(
                        tab, lq_, aq_, (Hq, Wq), radius=8, tile=tile
                    )

                t = timeit(jax.jit(f), value, loc, att)
                kind = f"pallas tile={tile}"
            else:
                def f(v, l, a):
                    vl = jax.lax.dynamic_slice_in_dim(v, starts[lv], Hv * Wv, 1)
                    lq_ = jax.lax.dynamic_slice_in_dim(l, sq, Lq, 1)[:, :, :, lv]
                    aq_ = jax.lax.dynamic_slice_in_dim(a, sq, Lq, 1)[:, :, :, lv]
                    smp = _bilinear_gather_level(vl, Hv, Wv, lq_)
                    return jnp.einsum("blmpd,blmp->blmd", smp, aq_)

                t = timeit(jax.jit(f), value, loc, att)
                kind = "gather"
            print(
                f"  pair q=({Hq}x{Wq}) v=({Hv}x{Wv}) [{kind:22s}] {t*1e3:8.2f} ms"
            )


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    profile_pairs()
    profile_decoder()
