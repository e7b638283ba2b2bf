"""ReID contrastive loss for the online tracker.

Re-designs reference ``get_cl_loss_ref``
(``DVIS_Plus/dvis_Plus/meta_architecture.py:981-1064``) + ``loss_reid``
(``DVIS_Plus/dvis_Plus/utils.py:51-94``):

For every frame i >= 1 and every matched GT instance (query slot q): the
anchor is reference embedding (i, q); positives are the same slot in frames
i-1 and i+1; negatives are all other slots of that neighbor frame. Per item:
  - contrastive: logsumexp([dot(neg) - dot(pos) for all negs] ++ [0])
  - aux: mean squared |cosine - label| over the neighbor frame's slots.

Vectorized over (T, N) with validity weights instead of the reference's python
loop over per-instance tensors.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _items_for_pair(
    anchors: jnp.ndarray,  # (M, C) anchor embeds (one per item)
    neighbor: jnp.ndarray,  # (M, Q, C) neighbor-frame references per item
    slot: jnp.ndarray,  # (M,) query slot of each item (pos index)
    weight: jnp.ndarray,  # (M,) item validity
):
    Q = neighbor.shape[1]
    dots = jnp.einsum("mqc,mc->mq", neighbor, anchors)  # (M, Q)
    pos = jnp.take_along_axis(dots, slot[:, None], axis=1)  # (M, 1)
    is_pos = jax.nn.one_hot(slot, Q, dtype=bool)
    diffs = jnp.where(is_pos, _NEG_INF, dots - pos)  # (M, Q) negs - pos
    x = jnp.concatenate([diffs, jnp.zeros((diffs.shape[0], 1))], axis=1)
    contras = jax.scipy.special.logsumexp(x, axis=1)  # (M,)

    nb_n = neighbor / (jnp.linalg.norm(neighbor, axis=-1, keepdims=True) + 1e-12)
    an_n = anchors / (jnp.linalg.norm(anchors, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.einsum("mqc,mc->mq", nb_n, an_n)
    label = is_pos.astype(cos.dtype)
    aux = jnp.mean((jnp.abs(cos - label)) ** 2, axis=1)  # (M,)

    return jnp.sum(contras * weight), jnp.sum(aux * weight)


def reid_loss(
    references: jnp.ndarray,  # (B, T, Q, C) tracker pred_references, fp32
    query_for_gt: jnp.ndarray,  # (B, N) matched query slot per GT
    valid: jnp.ndarray,  # (B, N)
) -> Dict[str, jnp.ndarray]:
    B, T, Q, C = references.shape
    N = query_for_gt.shape[1]
    references = references.astype(jnp.float32)

    def per_video(refs, q4g, val):
        # prev-frame items: frames 1..T-1; next-frame items: frames 1..T-2
        slot = jnp.clip(q4g, 0, Q - 1)

        def gather_items(anchor_frames, neighbor_frames, frame_w):
            # anchor_frames/neighbor_frames: (F,) frame indices
            anchors = refs[anchor_frames][:, slot]  # (F, N, C)
            neighbors = refs[neighbor_frames]  # (F, Q, C)
            F = anchors.shape[0]
            a = anchors.reshape(F * N, C)
            nb = jnp.broadcast_to(neighbors[:, None], (F, N, Q, C)).reshape(F * N, Q, C)
            s = jnp.broadcast_to(slot[None], (F, N)).reshape(F * N)
            w = (jnp.broadcast_to(val[None], (F, N)) & (q4g[None] >= 0)).reshape(F * N)
            w = w.astype(jnp.float32) * jnp.repeat(frame_w, N)
            return _items_for_pair(a, nb, s, w), jnp.sum(w)

        prev_idx = jnp.arange(1, T)
        (c1, a1), n1 = gather_items(prev_idx, prev_idx - 1, jnp.ones(T - 1))
        if T > 2:
            nxt_idx = jnp.arange(1, T - 1)
            (c2, a2), n2 = gather_items(nxt_idx, nxt_idx + 1, jnp.ones(T - 2))
        else:
            c2 = a2 = jnp.float32(0.0)
            n2 = jnp.float32(0.0)
        return c1 + c2, a1 + a2, n1 + n2

    contras, aux, counts = jax.vmap(per_video)(references, query_for_gt, valid)
    num = jnp.maximum(jnp.sum(counts), 1.0)
    return {
        "loss_reid": jnp.sum(contras) / num,
        "loss_aux_reid": jnp.sum(aux) / num,
    }
