"""Slot attention primitives for the DAQ disappearance branch.

Re-designs reference ``DVIS_DAQ/dvis_daq/slot_attention.py``:
- ``SlotAttention`` (:6-68): single-iteration inverted cross-attention —
  softmax over the *slot* axis (each input commits to one slot), then
  normalize over inputs and take the weighted mean of the values;
- ``SlotCrossAttentionLayer`` (:89-170): MHA(tgt -> memory) produces per-slot
  update candidates; the slot-attention step redistributes them among slots
  keyed by ``slot_query``; residual + post-norm.
- ``hard_softmax`` (:69-75): straight-through argmax (utility, kept for
  parity though unused on the default path).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.models.segmenter.transformer_decoder import MultiHeadAttention


def hard_softmax(logits: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Straight-through argmax: forward one-hot, backward softmax grads."""
    y_soft = jax.nn.softmax(logits, axis=axis)
    index = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(logits)
    y_hard = jnp.put_along_axis(y_hard, index, 1.0, axis=axis, inplace=False)
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft


class SlotAttention(nn.Module):
    """Single-iteration slot attention update (no value projection)."""

    slot_size: int
    eps: float = 1e-6

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,  # (B, N, C) values
        inputs_k: jnp.ndarray,  # (B, N, C) keys source
        slots: jnp.ndarray,  # (B, M, C) slot queries
        row_valid: Optional[jnp.ndarray] = None,  # (B, N) = (B, M) live rows
    ) -> jnp.ndarray:
        """``row_valid`` masks DEAD slot-table rows out of both coupling axes
        (softmax over slots AND the input-normalizing sum): the reference's
        slot list is dynamically sized so dead rows simply don't exist there
        (slot_attention.py:57-65) — on the static table they must not shift
        live slots' attention."""
        k = nn.Dense(self.slot_size, use_bias=False, name="project_k")(
            nn.LayerNorm(epsilon=1e-5, name="norm_inputs")(inputs_k)
        )
        q = nn.Dense(self.slot_size, use_bias=False, name="project_q_dense")(
            nn.LayerNorm(epsilon=1e-5, name="project_q_norm")(slots)
        )
        attn_logits = (self.slot_size**-0.5) * jnp.einsum(
            "bnc,bmc->bnm", k, q, preferred_element_type=jnp.float32
        )
        if row_valid is not None:
            attn_logits = jnp.where(
                row_valid[:, None, :], attn_logits, jnp.float32(-1e9)
            )
        attn = jax.nn.softmax(attn_logits, axis=-1)  # over slots
        attn = attn + self.eps
        if row_valid is not None:
            attn = attn * row_valid[:, :, None].astype(attn.dtype)
        attn = attn / jnp.sum(attn, axis=1, keepdims=True)  # over inputs
        return jnp.einsum("bnm,bnc->bmc", attn.astype(inputs.dtype), inputs)


class SlotCrossAttentionLayer(nn.Module):
    """MHA to frame features + slot-attention redistribution (post-norm)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, M, C) slot features
        memory: jnp.ndarray,  # (B, L, C) frame queries
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        slot_query: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,  # (B, 1|H, M, L) additive
        row_valid: Optional[jnp.ndarray] = None,  # (B, M) live slot rows
    ) -> jnp.ndarray:
        if slot_query is None:
            slot_query = tgt
        q = tgt if query_pos is None else tgt + query_pos
        k = memory if pos is None else memory + pos
        tgt2 = MultiHeadAttention(self.dim, self.num_heads, name="attn")(
            q, k, memory, mask
        )
        updates = SlotAttention(self.dim, name="slot_attn")(
            inputs=tgt2, inputs_k=tgt + tgt2, slots=slot_query,
            row_valid=row_valid,
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + updates)
