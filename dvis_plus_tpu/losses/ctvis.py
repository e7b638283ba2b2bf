"""CTVIS: contrastive tracking losses for segmenter finetuning.

Re-designs reference ``CTCLPlugin`` (``DVIS_Plus/dvis_Plus/ctvis.py:604-799``)
plus its ``TrainTracklet``/``SimpleTrainMemory`` (:451-601):

Per video, per instance n (with per-frame Hungarian matching giving the
query slot q(n, t)):
- anchors: the ReID embedding of the matched query at each valid frame;
- negatives at frame t: ``num_negatives`` embeddings drawn from the first
  ``num_negatives + 1`` query slots excluding the anchor slot (:726-731);
- positives at frame t >= 1: with prob 0.5 the similarity-guided fused
  embedding (SGFF, arXiv 2203.14208) of frames < t, else the most recent
  prior valid raw embedding; if the instance never appeared before t, the
  first valid later embedding (:524-541);
- the contrastive item pairs the anchor with [positive ++ negatives of
  frame t-1] and applies the IDOL logsumexp loss + squared-cosine aux
  (:744-770, loss_reid :816-860).

Static-shape deltas: invalid-frame negatives use the same ``num_negatives``
sample (the reference stores all Q); items are masked rather than skipped.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dvis_plus_tpu.losses.reid import _multi_pos_item


def _sgff_scan(embeds: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Similarity-guided fusion over frames.

    embeds (T, C) per-frame anchor embeds; valid (T,) — returns the fused
    embedding AFTER each frame (T, C) (TrainTracklet.update :490-512)."""
    T, C = embeds.shape

    def step(carry, xs):
        fused, acc_sum, acc_cnt = carry
        e, v = xs
        first = acc_cnt == 0
        e_n = e / (jnp.linalg.norm(e) + 1e-8)
        mean_prior = acc_sum / jnp.maximum(acc_cnt, 1)
        sim = jnp.dot(mean_prior, e_n)
        beta = jnp.maximum(sim, 0.0)
        new_fused = jnp.where(
            v, jnp.where(first, e, (1 - beta) * fused + beta * e), fused
        )
        acc_sum = jnp.where(v, acc_sum + e_n, acc_sum)
        acc_cnt = jnp.where(v, acc_cnt + 1, acc_cnt)
        return (new_fused, acc_sum, acc_cnt), new_fused

    init = (jnp.zeros((C,)), jnp.zeros((C,)), jnp.int32(0))
    _, fused_list = jax.lax.scan(step, init, (embeds, valid))
    return fused_list


def ctvis_reid_loss(
    rng: jax.Array,
    reid_embeds: jnp.ndarray,  # (B, T, Q, C) decoder pred_reid_embed
    query_for_gt: jnp.ndarray,  # (B, T, N) per-frame matched query slot
    frame_valid: jnp.ndarray,  # (B, N, T)
    num_negatives: int = 99,
    momentum_embed: bool = True,
) -> Dict[str, jnp.ndarray]:
    B, T, Q, C = reid_embeds.shape
    N = query_for_gt.shape[2]
    nn_ = min(num_negatives, Q - 1)

    def per_video(rng_b, embeds, q4g, fvalid):
        # anchors (T, N, C)
        anchors = jnp.take_along_axis(
            embeds, jnp.clip(q4g, 0, Q - 1)[..., None], axis=1
        )

        # negatives (T, N, nn_, C): first nn_+1 slots minus the anchor slot
        base = jnp.arange(nn_ + 1)[None, None, :]  # (1, 1, nn_+1)
        anchor_slot = jnp.clip(q4g, 0, Q - 1)[..., None]  # (T, N, 1)
        # replace the anchor slot (if present) with slot nn_+... shift trick:
        # keep slots != anchor, in order; if anchor not among them drop last
        is_anchor = base == anchor_slot  # (T, N, nn_+1)
        order = jnp.argsort(is_anchor, axis=-1, stable=True)  # non-anchor first
        neg_slots = jnp.take_along_axis(
            jnp.broadcast_to(base, is_anchor.shape), order, axis=-1
        )[..., :nn_]
        negs = embeds[
            jnp.arange(T)[:, None, None], neg_slots
        ]  # (T, N, nn_, C)

        # SGFF fused embeds per instance
        fused = jax.vmap(lambda e, v: _sgff_scan(e, v), in_axes=(1, 0), out_axes=1)(
            anchors, fvalid
        )  # (T, N, C)

        # positive index bookkeeping
        t_idx = jnp.arange(T)[:, None]
        valid_tn = fvalid.T  # (T, N)
        # last valid frame strictly before t
        def prev_scan(carry, v):
            out = carry
            new_carry = jnp.where(v[1], v[0], carry)
            return new_carry, out

        prev_idx = jax.lax.scan(
            prev_scan, jnp.full((N,), -1), (jnp.arange(T), valid_tn)
        )[1]  # (T, N) last valid frame < t
        # first valid frame strictly after t
        def next_scan(carry, v):
            out = carry
            new_carry = jnp.where(v[1], v[0], carry)
            return new_carry, out

        next_idx = jax.lax.scan(
            next_scan, jnp.full((N,), T), (jnp.arange(T)[::-1], valid_tn[::-1])
        )[1][::-1]  # (T, N) first valid frame > t

        rngs = jax.random.split(rng_b, T)
        c_total = jnp.float32(0.0)
        a_total = jnp.float32(0.0)
        w_total = jnp.float32(0.0)
        for t in range(1, T):
            has_prev = prev_idx[t] >= 0  # (N,)
            has_next = next_idx[t] < T
            use_mom = (
                jax.random.uniform(rngs[t], (N,)) > 0.5
                if momentum_embed
                else jnp.zeros((N,), bool)
            )
            pos_prev_raw = anchors[jnp.clip(prev_idx[t], 0, T - 1), jnp.arange(N)]
            pos_sgff = fused[t - 1]  # SGFF after frame t-1
            pos_from_prev = jnp.where(use_mom[:, None], pos_sgff, pos_prev_raw)
            pos_next = anchors[jnp.clip(next_idx[t], 0, T - 1), jnp.arange(N)]
            positive = jnp.where(has_prev[:, None], pos_from_prev, pos_next)
            item_w = (valid_tn[t] & (has_prev | has_next)).astype(jnp.float32)

            neg_t = negs[t - 1]  # previous frame's negatives (:541)
            c, a = jax.vmap(
                lambda an, po, ne: _multi_pos_item(
                    an, po[None], ne, jnp.ones((nn_,), bool)
                )
            )(anchors[t], positive, neg_t)
            c_total = c_total + jnp.sum(c * item_w)
            a_total = a_total + jnp.sum(a * item_w)
            w_total = w_total + jnp.sum(item_w)
        return c_total, a_total, w_total

    rngs = jax.random.split(rng, B)
    c, a, w = jax.vmap(per_video)(
        rngs,
        reid_embeds.astype(jnp.float32),
        query_for_gt,
        frame_valid,
    )
    num = jnp.maximum(jnp.sum(w), 1.0)
    return {"loss_reid": jnp.sum(c) / num, "loss_aux_reid": jnp.sum(a) / num}
