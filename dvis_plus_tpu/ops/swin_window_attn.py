"""Fused Swin window-attention Pallas kernel (TPU, serving path).

The XLA window-attention path (``models/backbones/swin.py::WindowAttention``)
pays for two things the compiler cannot remove (v5e trace, round-2 notes):

- the head split/merge relayouts ``(B_, N, C) -> (B_, H, N, Dh)`` and back
  (lane->leading copies, ~17.5 + 9.8 ms per 8 block-pairs at Swin-L scale);
- the HBM round-trips of the ``(B_, H, N, N)`` score tensor between the QK
  matmul, the bias/mask adds, the softmax reductions, and the PV matmul
  (~4.3 GB of scores per Swin-L forward at 736x1280 T=5, several passes).

This kernel fuses scores -> bias -> shift-mask -> softmax -> PV per
window*head with everything VMEM-resident, reading q/k/v in the *flat*
``(B_* N, C)`` layout the qkv projection already produces (head slicing is
done in-kernel on the lane dimension — probe-verified at Dh=32 granularity,
``tools/profiling/swin_fused_probe.py``), so no relayout ever materializes.
The qkv / output projections stay in XLA where the big ``(tokens, C) @ (C, C)``
matmuls already run near MXU peak.

Reference behavior being replaced: the torch einsum+softmax window attention
in ``DVIS_Plus/mask2former/modeling/backbone/swin.py:126-175`` (q @ k^T,
relative position bias, shifted-window mask, softmax, @ v). Numerics: the QK
and PV matmuls accumulate fp32 on the MXU and bias/mask/softmax run fp32
in-kernel — numerically *tighter* than the bf16-scores ``fast_softmax`` XLA
serving path, and within bf16 rounding of the exact fp32 path.

Serving-only (no VJP): gated by ``backbone.swin_fused_attn`` like
``swin_fast_softmax``; training keeps the exact XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-grid-step window count: largest divisor of nW (mask periodicity) that
# keeps the q/k/v/out blocks + bias + mask inside the VMEM budget
_VMEM_BLOCK_BUDGET = 6 * 1024 * 1024


def _pick_wb(n_windows: int, N: int, C: int, itemsize: int) -> Optional[int]:
    """Largest per-step window count that divides the mask period, keeps the
    q/k/v/out blocks in budget, and lands the (wb*N, C) block on a legal
    sublane boundary (8 rows fp32 / 16 rows bf16 — ws=7 windows have N=49,
    which is only legal when wb*49 aligns). None = no legal wb, use XLA."""
    sublane = 16 if itemsize == 2 else 8
    for wb in (8, 4, 2, 1):
        if n_windows % wb or (wb * N) % sublane:
            continue
        # 4 data blocks (q, k, v, out), x2 for pipeline double buffering
        if 8 * wb * N * C * itemsize <= _VMEM_BLOCK_BUDGET:
            return wb
    return None


def _kernel(q_ref, k_ref, v_ref, bias_ref, *rest, wb: int, num_heads: int,
            N: int, Dh: int, scale: float):
    if len(rest) == 2:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
        mask_ref = None
    for w in range(wb):
        rows = slice(w * N, (w + 1) * N)
        for h in range(num_heads):
            cols = slice(h * Dh, (h + 1) * Dh)
            s = jax.lax.dot_general(
                q_ref[rows, cols], k_ref[rows, cols],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bias_ref[h].astype(jnp.float32)
            if mask_ref is not None:
                s = s + mask_ref[w].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
            out_ref[rows, cols] = jnp.dot(
                p, v_ref[rows, cols], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)


def fused_window_attention(
    q: jnp.ndarray,  # (B_, N, C) — windowed queries, heads packed on lanes
    k: jnp.ndarray,  # (B_, N, C)
    v: jnp.ndarray,  # (B_, N, C)
    bias: jnp.ndarray,  # (H, N, N) relative position bias
    mask: Optional[jnp.ndarray],  # (nW, N, N) shifted-window mask, or None
    num_heads: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax((q k^T) * Dh^-0.5 + bias [+ mask]) @ v, fused per window*head.

    ``B_`` must be batch-major over windows (``B * nW``) so that window ``i``'s
    mask row is ``i % nW`` — the layout ``_window_partition`` produces.
    """
    B_, N, C = q.shape
    H = num_heads
    Dh = C // H
    scale = float(Dh) ** -0.5
    nW = mask.shape[0] if mask is not None else 1

    wb = _pick_wb(nW, N, C, q.dtype.itemsize)
    while wb and B_ % wb:
        wb //= 2
    if not wb or (wb * N) % (16 if q.dtype.itemsize == 2 else 8) or Dh % 8:
        return window_attention_reference(q, k, v, bias, mask, num_heads)
    grid = (B_ // wb,)

    flat = lambda x: x.reshape(B_ * N, C)
    qkv_spec = pl.BlockSpec((wb * N, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((H, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    operands = [flat(q), flat(k), flat(v), bias.astype(q.dtype)]
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    if mask is not None:
        operands.append(mask.astype(q.dtype))
        in_specs.append(
            pl.BlockSpec(
                (wb, N, N),
                lambda i: (i % (nW // wb), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    out = pl.pallas_call(
        functools.partial(
            _kernel, wb=wb, num_heads=H, N=N, Dh=Dh, scale=scale
        ),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B_ * N, C), q.dtype),
        in_specs=in_specs,
        out_specs=qkv_spec,
        interpret=interpret,
    )(*operands)
    return out.reshape(B_, N, C)


def window_attention_reference(q, k, v, bias, mask, num_heads):
    """Exact XLA math (the fp32-softmax path of ``WindowAttention``) — the
    numeric oracle for the kernel's tests."""
    B_, N, C = q.shape
    H = num_heads
    Dh = C // H
    qh = q.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32)
    attn = attn * (Dh ** -0.5) + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(B_, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(B_, N, C)
