"""Sequence-parallel (object-sharded) refiner inference.

The offline refiner is the one true long-context op in the framework: its
temporal self-attention is dense O(T^2) over the whole video (reference
``DVIS_Plus/dvis_Plus/refiner.py:108-113``; SURVEY §5.7 flags it as the TPU
sharding candidate). The reference has no parallel story for it — rank 0
refines the whole video alone. Here the video-level embed pass shards over
the OBJECT axis of a ``jax.sharding.Mesh``:

- temporal attention, temporal conv, FFN, and every head are object-local,
  so both the T^2 FLOPs and the O(T·Q·C) activation memory divide by the
  mesh size;
- only the per-frame object self-attention needs remote state: its
  keys/values are all-gathered over ICI (one (B·T, Q, C) gather per layer),
  while queries stay local (`TemporalRefiner._body(axis_name=...)`).

Padded objects (Q rounded up to the mesh size) are masked out of the
attention keys via ``instance_mask`` and dropped from the outputs.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def refiner_embed_pass_sharded(
    model,  # module owning a TemporalRefiner at .refiner (DVISOffline etc.)
    params,
    instance_embeds: jnp.ndarray,  # (B, T, Q, C)
    frame_embeds: jnp.ndarray,  # (B, T, fQ, C)
    mesh: Mesh,
    axis: str = "data",
    instance_mask: Optional[jnp.ndarray] = None,  # (B, Q)
    time_mask: Optional[jnp.ndarray] = None,  # (B, T) — bucketed-length mask
    method=None,  # bound method to call; defaults to refiner.embed_pass via
    # model.apply(..., method=method) — must accept axis_name
) -> Dict[str, jnp.ndarray]:
    """``embed_pass`` over the mesh, object axis sharded; returns full-Q
    outputs identical (up to fp error) to the single-device pass."""
    B, T, Q, C = instance_embeds.shape
    n = mesh.shape[axis]
    Qp = (Q + n - 1) // n * n

    if instance_mask is None:
        instance_mask = jnp.ones((B, Q), bool)
    if time_mask is None:
        time_mask = jnp.ones((B, T), bool)
    if Qp != Q:
        instance_embeds = jnp.pad(
            instance_embeds, ((0, 0), (0, 0), (0, Qp - Q), (0, 0))
        )
        instance_mask = jnp.pad(instance_mask, ((0, 0), (0, Qp - Q)))

    if method is None:
        method = lambda m, ie, fe, im, tm: m.refiner.embed_pass(
            ie, fe, instance_mask=im, axis_name=axis, time_mask=tm
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(), P(), P()),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    def run(p, ie, fe, im, tm):
        out = model.apply(p, ie, fe, im, tm, method=method)
        # normalize every output to Q-sharded axis 2: (B, T|1, Qlocal, X)
        def fix(k, v):
            if k == "pred_logits":  # (B, Qlocal, K+1) -> add time axis slot
                return v[:, None]
            return v
        return {k: fix(k, v) for k, v in out.items()}

    out = run(params, instance_embeds, frame_embeds, instance_mask, time_mask)
    if "pred_logits" in out:
        out["pred_logits"] = out["pred_logits"][:, 0]  # drop the dummy axis
    if Qp != Q:
        out = {
            k: (v[:, :Q] if k == "pred_logits" else v[:, :, :Q])
            for k, v in out.items()
        }
    return out
