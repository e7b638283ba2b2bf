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

from typing import Dict, NamedTuple, Tuple

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


# ---------------------------------------------------------------------------
# Offline (refiner) CL loss with a per-class reference memory
# ---------------------------------------------------------------------------


class ClassMemory(NamedTuple):
    """Static ring-buffer replacement for ``Outputs_Memory_PerClasses``
    (reference ``DVIS_Plus/dvis_Plus/utils.py:4-49``, max_len=20): per class, a
    bank of recent reference embeddings used as extra negatives."""

    embeds: jnp.ndarray  # (K, M, C)
    count: jnp.ndarray  # (K,) total pushed per class (ring pointer)

    @staticmethod
    def create(num_classes: int, max_len: int, dim: int) -> "ClassMemory":
        return ClassMemory(
            embeds=jnp.zeros((num_classes, max_len, dim), jnp.float32),
            count=jnp.zeros((num_classes,), jnp.int32),
        )


def _multi_pos_item(
    anchor: jnp.ndarray,  # (C,)
    pos: jnp.ndarray,  # (P, C)
    neg: jnp.ndarray,  # (G, C)
    neg_valid: jnp.ndarray,  # (G,)
):
    """loss_reid with P positives x G negatives (utils.py:68-91): logsumexp
    over all (neg - pos) pairs padded with 0; aux = mean sq |cos - label|."""
    dp = pos @ anchor  # (P,)
    dn = neg @ anchor  # (G,)
    diffs = dn[None, :] - dp[:, None]  # (P, G)
    diffs = jnp.where(neg_valid[None, :], diffs, _NEG_INF)
    x = jnp.concatenate([diffs.reshape(-1), jnp.zeros((1,))])
    contras = jax.scipy.special.logsumexp(x)

    both = jnp.concatenate([pos, neg], axis=0)
    bv = jnp.concatenate([jnp.ones((pos.shape[0],), bool), neg_valid])
    both_n = both / (jnp.linalg.norm(both, axis=-1, keepdims=True) + 1e-12)
    a_n = anchor / (jnp.linalg.norm(anchor) + 1e-12)
    cos = both_n @ a_n
    label = jnp.concatenate([jnp.ones((pos.shape[0],)), jnp.zeros((neg.shape[0],))])
    aux = jnp.sum(jnp.where(bv, (jnp.abs(cos - label)) ** 2, 0.0)) / jnp.maximum(
        jnp.sum(bv), 1.0
    )
    return contras, aux


def reid_loss_with_memory(
    pred_embds: jnp.ndarray,  # (B, T, Q, C) refiner embeds
    query_for_gt: jnp.ndarray,  # (B, N)
    valid: jnp.ndarray,  # (B, N)
    labels: jnp.ndarray,  # (B, N)
    memory: ClassMemory,
) -> Tuple[Dict[str, jnp.ndarray], ClassMemory]:
    """Offline CL loss (reference get_cl_loss_with_memory
    ``meta_architecture.py:1502-1579``): per frame i and matched instance,
    anchor = embed(i, slot); positives = that slot at all T frames; negatives =
    other slots at frame i plus the class-memory bank of the instance's class.
    Returns the losses and the updated memory (embeds are pushed after the
    loss, stop-gradient)."""
    B, T, Q, C = pred_embds.shape
    N = query_for_gt.shape[1]
    K, M = memory.embeds.shape[:2]
    embeds = pred_embds.astype(jnp.float32)

    def per_video(refs, q4g, val, lab):
        slot = jnp.clip(q4g, 0, Q - 1)
        inst_w = (val & (q4g >= 0)).astype(jnp.float32)  # (N,)

        mem_e = memory.embeds[jnp.clip(lab, 0, K - 1)]  # (N, M, C)
        mem_valid = (
            jnp.arange(M)[None, :] < jnp.minimum(memory.count[jnp.clip(lab, 0, K - 1)], M)[:, None]
        )  # (N, M)
        has_mem = mem_valid.any(axis=1)  # (N,)

        def per_frame_inst(i, n):
            anchor = refs[i, slot[n]]
            pos = refs[:, slot[n]]  # (T, C)
            not_self = jnp.arange(Q) != slot[n]
            negs_frame = refs[i]  # (Q, C); mask out the anchor slot
            c1, a1 = _multi_pos_item(anchor, pos, negs_frame, not_self)
            c2, a2 = _multi_pos_item(anchor, pos, mem_e[n], mem_valid[n])
            w1 = inst_w[n]
            w2 = inst_w[n] * has_mem[n].astype(jnp.float32)
            return c1 * w1 + c2 * w2, a1 * w1 + a2 * w2, w1 + w2

        ii, nn = jnp.meshgrid(jnp.arange(T), jnp.arange(N), indexing="ij")
        c, a, w = jax.vmap(jax.vmap(per_frame_inst))(ii, nn)
        return c.sum(), a.sum(), w.sum()

    contras, aux, counts = jax.vmap(per_video)(embeds, query_for_gt, valid, labels)
    num = jnp.maximum(jnp.sum(counts), 1.0)
    losses = {
        "loss_reid": jnp.sum(contras) / num,
        "loss_aux_reid": jnp.sum(aux) / num,
    }

    # --- push matched embeddings into the class memory (ring buffer) --------
    new_embeds = memory.embeds
    new_count = memory.count
    flat_embeds = jax.lax.stop_gradient(embeds)
    for b in range(B):
        for n in range(N):  # static small loop (N <= ~50)
            c = jnp.clip(labels[b, n], 0, K - 1)
            ok = valid[b, n] & (query_for_gt[b, n] >= 0)
            vals = flat_embeds[b, :, jnp.clip(query_for_gt[b, n], 0, Q - 1)]  # (T, C)
            base = new_count[c]
            idxs = jnp.where(ok, (base + jnp.arange(T)) % M, M)  # M = dropped
            new_embeds = new_embeds.at[c, idxs].set(
                jnp.where(ok, vals, 0.0), mode="drop"
            )
            new_count = new_count.at[c].add(jnp.where(ok, T, 0))
    return losses, ClassMemory(embeds=new_embeds, count=new_count)
