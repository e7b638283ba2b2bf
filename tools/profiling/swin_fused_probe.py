"""Mosaic feature probes for the fused Swin window-attention kernel.

Round-2 notes: Mosaic (via the axon remote compiler) rejects
sublane<->lane reshapes and batched-einsum matmuls, and 500s carry no
diagnostics — so probe each construct in isolation with a tiny
pallas_call before composing the real kernel.

Probes:
  p1: leading-dim indexing of a 3D VMEM ref (bias_ref[h] -> (N, N))
  p2: static sublane slicing at 144-row granularity (window slice)
  p3: 2D dot_general (144, 32) x (144, 32) -> (144, 144), K=32
  p4: static LANE slicing at 32 granularity ([h*32:(h+1)*32])
  p5: reshape (WB, N, C) -> (WB*N, C) (leading->sublane merge)
  p6: fp32 softmax over a (144, 144) tile in-kernel
  p7: bf16 x bf16 dot with preferred fp32 + write bf16

Run: python tools/profiling/swin_fused_probe.py [probe ...]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 144
DH = 32
C = 96
WB = 4


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        out = jax.device_get(out)
        print(f"{name}: OK  out_sum={np.sum(np.asarray(out, np.float32)):.4f}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL  {type(e).__name__}: {msg}")
        return False


def p1():
    def kern(b_ref, o_ref):
        o_ref[:] = b_ref[1] + b_ref[0]

    x = jnp.asarray(np.random.RandomState(0).rand(4, N, N), jnp.float32)
    return run("p1 leading-dim index", lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x), x)


def p2():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[N : 2 * N, :] * 2.0

    x = jnp.asarray(np.random.RandomState(0).rand(WB * N, C), jnp.bfloat16)
    return run("p2 sublane slice 144", lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x), x)


def p3():
    def kern(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    q = jnp.asarray(np.random.RandomState(0).rand(N, DH), jnp.bfloat16)
    k = jnp.asarray(np.random.RandomState(1).rand(N, DH), jnp.bfloat16)
    return run("p3 dot K=32", lambda q, k: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, k), q, k)


def p4():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:, DH : 2 * DH] * 2.0

    x = jnp.asarray(np.random.RandomState(0).rand(N, C), jnp.bfloat16)
    return run("p4 lane slice 32", lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, DH), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x), x)


def p5():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(WB * N, C) * 2.0

    x = jnp.asarray(np.random.RandomState(0).rand(WB, N, C), jnp.bfloat16)
    return run("p5 reshape merge", lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((WB * N, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x), x)


def p6():
    def kern(x_ref, o_ref):
        s = x_ref[:].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        o_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)

    x = jnp.asarray(np.random.RandomState(0).rand(N, N), jnp.bfloat16)
    return run("p6 softmax tile", lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x), x)


def p7():
    def kern(p_ref, v_ref, o_ref):
        o_ref[:] = jnp.dot(
            p_ref[:], v_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    p = jnp.asarray(np.random.RandomState(0).rand(N, N), jnp.bfloat16)
    v = jnp.asarray(np.random.RandomState(1).rand(N, DH), jnp.bfloat16)
    return run("p7 PV dot", lambda p, v: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, DH), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, v), p, v)


if __name__ == "__main__":
    names = sys.argv[1:] or ["p1", "p2", "p3", "p4", "p5", "p6", "p7"]
    print("backend:", jax.default_backend())
    for n in names:
        globals()[n]()
