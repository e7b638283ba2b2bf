"""Video Instance Cutter: dynamic anchor queries as a fixed-capacity slot table.

Re-designs reference ``VideoInstanceCutter``
(``DVIS_DAQ/dvis_daq/track_module.py:102-800``). Per frame the query set is
[track queries (surviving instances) ++ ``num_new_ins`` new-instance queries
from one shared learned embedding] with mask-pooled positional embeds
(get_mask_pos_embed :771-797); decoding is L x [CrossAttn -> SelfAttn -> FFN]
(:341-348); a slot-attention branch models disappearance with bg slots and an
attention mask hiding a randomly "disappeared" GT during stage-3 training
(modeling_disappear :285-302, slot pass :350-365).

TPU re-design of the dynamic bookkeeping (the reference's python-dict
``video_ins_hub`` of ``VideoInstanceSequence`` objects, :16-99, :448-462):

- a **static slot table** of capacity ``num_track_slots`` with an ``alive``
  mask replaces the growing/shrinking track-query list; activation/kick-out
  policies (:408-434) become masked compaction (stable argsort) so surviving
  slots keep their identity state;
- per-slot similarity-guided positional fusion (SGFF, arXiv 2203.14208;
  reference ``update_pos`` :71-99) carries (sg_pos, raw-pos ring cache)
  through the carry;
- streaming inference bookkeeping (seq ids, miss counting, kick-out after
  ``kick_out_frame_num`` :606-770) lives in integer slot state;
- batch: the reference asserts B == 1 (:311); this module works on squeezed
  (no-batch) arrays and can be vmapped.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.losses.matcher import MatchCosts
from dvis_plus_tpu.models.daq.matcher import FrameMatchResult, new_ins_match
from dvis_plus_tpu.models.daq.slot_attention import SlotCrossAttentionLayer
from dvis_plus_tpu.models.segmenter.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    MLP,
    SelfAttentionLayer,
)
from dvis_plus_tpu.ops.assignment import auction_lap

_POS_CACHE = 10


class CutterState(NamedTuple):
    """Fixed-capacity track-slot table (the carry)."""

    track_query: jnp.ndarray  # (Qc, C) last output embed per slot
    sg_pos: jnp.ndarray  # (Qc, C) similarity-guided pos embed
    pos_cache: jnp.ndarray  # (Qc, _POS_CACHE, C) raw pos embeds ring
    pos_count: jnp.ndarray  # (Qc,)
    alive: jnp.ndarray  # (Qc,) bool
    gt_for_slot: jnp.ndarray  # (Qc,) int32 (training identity, -1 = none)
    invalid_frames: jnp.ndarray  # (Qc,)
    seq_id: jnp.ndarray  # (Qc,) stable instance ids (-1 = empty)
    next_seq: jnp.ndarray  # scalar
    is_first: jnp.ndarray  # scalar bool


def init_cutter_state(Qc: int, C: int, dtype=jnp.float32) -> CutterState:
    return CutterState(
        track_query=jnp.zeros((Qc, C), dtype),
        sg_pos=jnp.zeros((Qc, C), dtype),
        pos_cache=jnp.zeros((Qc, _POS_CACHE, C), dtype),
        pos_count=jnp.zeros((Qc,), jnp.int32),
        alive=jnp.zeros((Qc,), bool),
        gt_for_slot=jnp.full((Qc,), -1, jnp.int32),
        invalid_frames=jnp.zeros((Qc,), jnp.int32),
        seq_id=jnp.full((Qc,), -1, jnp.int32),
        next_seq=jnp.int32(0),
        is_first=jnp.asarray(True),
    )


def sgff_update(
    sg_pos: jnp.ndarray,  # (C,)
    cache: jnp.ndarray,  # (M, C)
    count: jnp.ndarray,  # scalar
    new_pos: jnp.ndarray,  # (C,)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Similarity-guided feature fusion (reference update_pos :71-99).

    The reference compares against ``pos_embeds[max(0, L-cache):-1]`` — the
    most recent ``min(count, M-1)`` PREVIOUS raw embeds (the list never pops;
    the slice excludes the new embed and caps at cache-1 entries). The ring
    reproduces that window: slot ``i`` holds append number
    ``count-1-((count-1-i) % M)``; only the last ``have`` appends count."""
    M = cache.shape[0]
    have = jnp.minimum(count, M - 1)
    first = count == 0

    idx = jnp.arange(M)
    last_app = count - 1 - ((count - 1 - idx) % M)  # append number in slot i
    valid = (last_app >= count - have) & (last_app >= 0)
    cache_n = cache / (jnp.linalg.norm(cache, axis=-1, keepdims=True) + 1e-8)
    new_n = new_pos / (jnp.linalg.norm(new_pos) + 1e-8)
    sim = jnp.sum(jnp.where(valid, cache_n @ new_n, 0.0)) / jnp.maximum(have, 1)
    beta = jnp.maximum(sim, 0.0)
    fused = jnp.where(first, new_pos, (1.0 - beta) * sg_pos + beta * new_pos)

    cache = cache.at[count % M].set(new_pos)
    return fused, cache, count + 1


class VideoInstanceCutter(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    feedforward_dim: int = 2048
    num_heads: int = 8
    num_layers: int = 6
    mask_dim: int = 256
    num_new_ins: int = 10
    num_slots: int = 5
    num_track_slots: int = 50
    training_select_thr: float = 0.1
    inference_select_thr: float = 0.1
    kick_out_frame_num: int = 8
    keep_threshold: float = 0.01
    ovis_infer: bool = True

    def setup(self):
        C = self.hidden_dim
        self.cross_layers = [
            CrossAttentionLayer(C, self.num_heads, name=f"cross_{j}")
            for j in range(self.num_layers)
        ]
        self.self_layers = [
            SelfAttentionLayer(C, self.num_heads, name=f"self_{j}")
            for j in range(self.num_layers)
        ]
        self.ffn_layers = [
            FFNLayer(C, self.feedforward_dim, name=f"ffn_{j}")
            for j in range(self.num_layers)
        ]
        self.slot_cross_layers = [
            SlotCrossAttentionLayer(C, self.num_heads, name=f"slot_cross_{j}")
            for j in range(self.num_layers)
        ]
        self.slot_ffn_layers = [
            FFNLayer(C, self.feedforward_dim, name=f"slot_ffn_{j}")
            for j in range(self.num_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        self.class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        self.mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")
        self.pos_embed = MLP(C, C, num_layers=3, name="pos_embed")
        self.mask_feature_proj = nn.Dense(self.mask_dim, name="mask_feature_proj")
        self.new_ins_embeds = self.param(
            "new_ins_embeds", nn.initializers.normal(1.0), (1, self.hidden_dim)
        )
        self.bg_slots = self.param(
            "bg_slots", nn.initializers.normal(1.0), (self.num_slots, self.hidden_dim)
        )

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------

    def _decode(
        self, queries, frame_embeds, query_pos=None, frame_pos=None, query_mask=None
    ):
        """(S, C) queries x (fQ, C) frame embeds -> (L+1, S, C) incl. input.

        ``query_mask`` (S,) bool: False = dead slot; live queries don't attend
        to dead ones in self-attention (static-capacity replacement for the
        reference's dynamically-sized track-query list)."""
        outs = [queries]
        x = queries[None]
        qp = jnp.zeros_like(x) if query_pos is None else query_pos[None]
        fp = (
            jnp.zeros((1,) + frame_embeds.shape, frame_embeds.dtype)
            if frame_pos is None
            else frame_pos[None]
        )
        sa_mask = None
        if query_mask is not None:
            sa_mask = jnp.where(query_mask[None, None, None, :], 0.0, -1e9)
        mem = frame_embeds[None]
        for j in range(self.num_layers):
            x = self.cross_layers[j](x, mem, fp, qp)
            # the reference cutter's self-attention takes NO query pos
            # (track_module.py:346/:646: layers called with tgt only)
            x = self.self_layers[j](x, 0.0, sa_mask)
            x = self.ffn_layers[j](x)
            outs.append(x[0])
        return jnp.stack(outs, axis=0)

    def _slot_decode(
        self, slots_feats, frame_embeds, slots_pos, slots_query, mask=None,
        row_valid=None,
    ):
        """(S', C) -> (L, S', C). ``row_valid`` (S',) masks dead table rows
        out of the slot-attention coupling (see SlotAttention.row_valid)."""
        x = slots_feats[None]
        outs = []
        rv = None if row_valid is None else row_valid[None]
        for j in range(self.num_layers):
            x = self.slot_cross_layers[j](
                x,
                frame_embeds[None],
                query_pos=slots_pos[None],
                slot_query=slots_query[None],
                mask=mask,
                row_valid=rv,
            )
            x = self.slot_ffn_layers[j](x)
            outs.append(x[0])
        return jnp.stack(outs, axis=0)

    def _prediction(self, outputs, mask_feat):
        """(L, S, C) x (H, W, Cm) -> ((L, S, K+1), (L, S, H, W))."""
        x = self.decoder_norm(outputs)
        logits = self.class_embed(x)
        membd = self.mask_embed(x)
        masks = jnp.einsum(
            "lsc,hwc->lshw", membd, mask_feat, preferred_element_type=jnp.float32
        )
        return logits, masks

    def _mask_pos(self, masks, ori_mask_feat):
        """Mask-pooled positional embeds (get_mask_pos_embed :771-797).

        masks (S, H, W) logits; ori_mask_feat (H, W, Cm) un-projected."""
        seg = jax.nn.sigmoid(masks.astype(jnp.float32)) > 0.5  # (S, H, W)
        segf = seg.reshape(seg.shape[0], -1).astype(jnp.float32)
        feats = ori_mask_feat.reshape(-1, ori_mask_feat.shape[-1]).astype(jnp.float32)
        pooled = (segf @ feats) / (segf.sum(axis=1, keepdims=True) + 1e-8)
        return self.pos_embed(pooled.astype(ori_mask_feat.dtype)), pooled

    def _match_slots_to_seg(self, slot_feats, seg_query_feat, row_valid):
        """match_with_embeds (:746-756): cosine LSA of [tracks; bg slots]
        against the learned segmenter query features."""
        a = slot_feats / (jnp.linalg.norm(slot_feats, axis=1, keepdims=True) + 1e-6)
        b = seg_query_feat / (
            jnp.linalg.norm(seg_query_feat, axis=1, keepdims=True) + 1e-6
        )
        Cm = 1.0 - a @ b.T  # (S', fQ)
        Cm = jnp.where(row_valid[:, None], Cm, 2.0)  # dead slots: uniform cost
        S_, fQ = Cm.shape
        if S_ <= fQ:
            return auction_lap(Cm)  # (S',) -> seg query index
        # more slots than segmenter queries: LSA assigns each query to one
        # slot, remaining slots take their per-row argmin (reference
        # match_with_embeds :746-756: least_cost_indices[lsa_rows] = lsa_cols)
        least = jnp.argmin(Cm, axis=1)  # (S',)
        slot4q = auction_lap(jnp.swapaxes(Cm, 0, 1))  # (fQ,) -> slot
        return least.at[slot4q].set(jnp.arange(fQ))

    # ------------------------------------------------------------------
    # slot-table maintenance
    # ------------------------------------------------------------------

    def _activate_slots(
        self,
        state: CutterState,
        activated: jnp.ndarray,  # (S,) bool over this frame's query set
        queries: jnp.ndarray,  # (S, C) final layer outputs
        tgt_ids: jnp.ndarray,  # (S,) matched GT per query (-1)
        raw_pos: jnp.ndarray,  # (S, C) mask-pooled pos embeds (MLP-projected)
        invalid_for_query: Optional[jnp.ndarray] = None,  # (S,) miss counters
        pos_update_for_query: Optional[jnp.ndarray] = None,  # (S,) bool
    ) -> Tuple[CutterState, jnp.ndarray]:
        """Compact activated queries into the fixed slot table; surviving
        track slots carry their SGFF / seq-id state (reference :408-462).

        Queries [0, Qc) are the previous track slots (when the previous state
        had any alive; on the first frame ``state.alive`` is all-False so no
        state is carried regardless of indices).

        Returns (new_state, src): ``src[slot]`` is the query index feeding
        each slot (clipped; only meaningful where ``new_state.alive``) so
        inference can emit slot-aligned per-frame outputs."""
        Qc = self.num_track_slots
        S, C = queries.shape
        order = jnp.argsort(~activated, stable=True)  # activated first
        n_act = jnp.sum(activated)
        slot_src = order[:Qc] if S >= Qc else jnp.pad(order, (0, Qc - S), constant_values=S)
        new_alive = jnp.arange(Qc) < jnp.minimum(n_act, Qc)

        src_c = jnp.clip(slot_src, 0, S - 1)
        new_track_query = jnp.where(new_alive[:, None], queries[src_c], 0.0)
        new_gt = jnp.where(new_alive, tgt_ids[src_c], -1)

        # carried state: source was an existing (alive) track slot
        src_slot = jnp.clip(src_c, 0, Qc - 1)
        carried = new_alive & (slot_src < Qc) & state.alive[src_slot]

        sg0 = jnp.where(carried[:, None], state.sg_pos[src_slot], 0.0)
        cache0 = jnp.where(carried[:, None, None], state.pos_cache[src_slot], 0.0)
        count0 = jnp.where(carried, state.pos_count[src_slot], 0)

        pos_new = raw_pos[src_c]
        sg1, cache1, count1 = jax.vmap(sgff_update)(sg0, cache0, count0, pos_new)
        if pos_update_for_query is not None:
            # missed-but-kept tracks carry their SGFF state unchanged — the
            # reference only calls update_pos on VALID queries (inference
            # :727-731 vs the invalid-kept branch :732-744, no update_pos)
            upd = pos_update_for_query[src_c]
            sg1 = jnp.where(upd[:, None], sg1, sg0)
            cache1 = jnp.where(upd[:, None, None], cache1, cache0)
            count1 = jnp.where(upd, count1, count0)
        sg1 = jnp.where(new_alive[:, None], sg1, 0.0)

        old_seq = jnp.where(carried, state.seq_id[src_slot], -1)
        need_new = new_alive & (old_seq < 0)
        new_ids = state.next_seq + jnp.cumsum(need_new) - 1
        seq = jnp.where(need_new, new_ids, old_seq)
        next_seq = state.next_seq + jnp.sum(need_new)

        if invalid_for_query is None:
            inval = jnp.zeros((Qc,), jnp.int32)
        else:
            inval = jnp.where(new_alive, invalid_for_query[src_c], 0)

        new_state = CutterState(
            track_query=new_track_query,
            sg_pos=sg1,
            pos_cache=jnp.where(new_alive[:, None, None], cache1, 0.0),
            pos_count=jnp.where(new_alive, count1, 0),
            alive=new_alive,
            gt_for_slot=new_gt,
            invalid_frames=inval,
            seq_id=jnp.where(new_alive, seq, -1),
            next_seq=next_seq,
            is_first=jnp.asarray(False),
        )
        return new_state, src_c

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        frame_embeds: jnp.ndarray,  # (T, fQ, C) segmenter queries (no-norm)
        mask_features: jnp.ndarray,  # (T, H, W, Cm)
        seg_query_feat: jnp.ndarray,  # (fQ, C) learned segmenter query feat
        seg_pred_masks: jnp.ndarray,  # (T, fQ, H, W) segmenter mask logits
        frame_match: List[FrameMatchResult],  # per-frame precomputed matches
        targets,  # VideoTargets-like: labels (N,), masks (N, T, H, W), frame_valid (N, T)
        rng: jax.Array,
        stage: int = 2,
        match_costs: MatchCosts = MatchCosts(),
    ):
        """Stage-2/3 training over a clip (reference forward :304-476).

        Returns (per-frame outputs list, per-frame slot outputs list). Each
        frame dict: pred_logits (L+1, S, K+1), pred_masks (L+1, S, H, W),
        tgt_for_query (S,), disappeared (N,) bool.
        """
        T, fQ, C = frame_embeds.shape
        Qc = self.num_track_slots
        nq = self.num_new_ins
        proj_mf = self.mask_feature_proj(mask_features)

        new_ins = jnp.broadcast_to(self.new_ins_embeds, (nq, C)).astype(frame_embeds.dtype)
        bg = self.bg_slots.astype(frame_embeds.dtype)

        state = init_cutter_state(Qc, C, frame_embeds.dtype)
        outputs, slot_outputs = [], []
        disappeared = jnp.zeros((targets.labels.shape[0],), bool)
        disappear_sim = jnp.full((), -1, jnp.int32)  # simulated disappear GT
        rngs = jax.random.split(rng, 3 * T)

        for i in range(T):
            fm_i = frame_match[i]
            valid_inst_i = targets.frame_valid[:, i]
            if i == 0:
                ms = self._decode(frame_embeds[0], frame_embeds[0])  # (L+1, fQ, C)
                logits, masks = self._prediction(ms, proj_mf[0])
                tgt_for_query = fm_i.tgt_for_query  # (fQ,)
                slot_out_i = None
            else:
                fq_pos, _ = self._mask_pos(seg_pred_masks[i], mask_features[i])
                queries = jnp.concatenate([state.track_query, new_ins], axis=0)
                qpos = jnp.concatenate([state.sg_pos, fq_pos[:nq]], axis=0)
                key_mask = jnp.concatenate([state.alive, jnp.ones((nq,), bool)])
                ms = self._decode(
                    queries, frame_embeds[i], query_pos=qpos, frame_pos=fq_pos,
                    query_mask=key_mask,
                )  # (L+1, Qc+nq, C)
                logits, masks = self._prediction(ms, proj_mf[i])

                tgt_for_track = jnp.concatenate(
                    [state.gt_for_slot, jnp.full((nq,), -1, jnp.int32)]
                )
                tgt_for_query = new_ins_match(
                    rngs[3 * i],
                    logits[-1],
                    masks[-1],
                    targets.labels,
                    targets.masks[:, i],
                    valid_inst_i,
                    tgt_for_track,
                    nq,
                    match_costs,
                )

                # ---- slot branch -----------------------------------------
                slot_feats_src = jnp.concatenate([state.track_query, bg], axis=0)
                row_valid = jnp.concatenate(
                    [state.alive, jnp.ones((self.num_slots,), bool)]
                )
                sq_idx = self._match_slots_to_seg(slot_feats_src, seg_query_feat, row_valid)
                slots_feats = seg_query_feat[sq_idx]
                slots_pos = slot_feats_src
                slots_query = jnp.concatenate([state.sg_pos, bg], axis=0)

                # stage-3 disappearance simulation (modeling_disappear :285-302)
                n_tracked = jnp.sum(state.gt_for_slot >= 0)
                can_sim = (stage == 3) & True
                pick = jax.random.randint(rngs[3 * i + 1], (), 0, Qc)
                # pick among slots with gt; re-map to a valid one
                has_gt = state.gt_for_slot >= 0
                pick_ok = has_gt[pick] & (n_tracked > 3) & jnp.asarray(can_sim)
                sim_tgt = jnp.where(pick_ok, state.gt_for_slot[pick], -1)
                disappear_sim = sim_tgt
                # hide that GT's frame queries from the slot branch
                hide = (fm_i.aux_tgt_for_query == sim_tgt) & (sim_tgt >= 0)  # (fQ,)
                attn_mask = jnp.where(hide[None, None, None, :], -1e9, 0.0)
                slot_ms = self._slot_decode(
                    slots_feats, frame_embeds[i], slots_pos, slots_query,
                    attn_mask, row_valid=row_valid,
                )
                s_logits, s_masks = self._prediction(slot_ms, proj_mf[i])
                slot_disappeared = disappeared
                slot_disappeared = jnp.where(
                    (jnp.arange(disappeared.shape[0]) == sim_tgt) & (sim_tgt >= 0),
                    True,
                    slot_disappeared,
                )
                slot_out_i = {
                    "pred_logits": s_logits,  # (L, Qc+num_slots, K+1)
                    "pred_masks": s_masks,
                    "tgt_for_query": jnp.concatenate(
                        [state.gt_for_slot, jnp.full((self.num_slots,), -1, jnp.int32)]
                    ),
                    "query_alive": row_valid,
                    "disappeared": slot_disappeared,
                }

            outputs.append(
                {
                    "pred_logits": logits,
                    "pred_masks": masks,
                    "tgt_for_query": tgt_for_query,
                    "query_alive": (
                        jnp.ones((fQ,), bool)
                        if i == 0
                        else jnp.concatenate([state.alive, jnp.ones((nq,), bool)])
                    ),
                    "disappeared": disappeared,
                }
            )
            if slot_out_i is not None:
                slot_outputs.append(slot_out_i)

            # ---- activation policy (:408-434) ----------------------------
            S = ms.shape[1]
            matched = tgt_for_query >= 0
            prob = jax.nn.softmax(logits[-1].astype(jnp.float32), axis=-1)
            score = prob[:, :-1].max(axis=1)
            if stage == 2:
                # keep matched minus the lower-score half of matches
                n_match = jnp.sum(matched)
                rank = jnp.sum(
                    (score[None, :] < score[:, None]) & matched[None, :], axis=1
                )  # rank among matched by score asc
                kick = matched & (rank < n_match // 2)
                activated = matched & ~kick
            else:  # stage 3
                activated = score > self.training_select_thr

            raw_pos_proj, raw_pos = self._mask_pos(masks[-1], mask_features[i])
            state, _ = self._activate_slots(
                state, activated, ms[-1], tgt_for_query, raw_pos_proj
            )

            # natural disappearance for the NEXT frame's losses (:464-473)
            nxt = i + 1 if i < T - 1 else T - 1
            tracked_now = jnp.zeros_like(disappeared).at[
                jnp.where(state.gt_for_slot >= 0, state.gt_for_slot, disappeared.shape[0])
            ].set(True, mode="drop")
            disappeared = tracked_now & ~targets.frame_valid[:, nxt]

        return outputs, slot_outputs

    # ------------------------------------------------------------------
    # streaming inference
    # ------------------------------------------------------------------

    def inference_step(
        self,
        state: CutterState,
        frame_embeds: jnp.ndarray,  # (fQ, C)
        mask_feature: jnp.ndarray,  # (H, W, Cm)
        seg_query_feat: jnp.ndarray,  # (fQ, C)
        seg_pred_masks: jnp.ndarray,  # (fQ, H, W) segmenter mask logits
        seg_valid: jnp.ndarray,  # (fQ,) first-frame validity (score > thr)
        first: bool = False,  # static: video start (two compiled executables)
    ):
        """One frame of streaming inference (reference inference :606-744).

        Returns (out dict for this frame's query set, new state). ``first`` is
        a python bool — the engine drives frames, so the first-frame
        executable (fQ queries, no pos) and the steady-state executable
        (Qc + nq queries) are separate compilations.
        """
        Qc = self.num_track_slots
        nq = self.num_new_ins
        fQ, C = frame_embeds.shape
        proj_mf = self.mask_feature_proj(mask_feature)

        new_ins = jnp.broadcast_to(self.new_ins_embeds, (nq, C)).astype(frame_embeds.dtype)
        bg = self.bg_slots.astype(frame_embeds.dtype)

        if first:
            ms = self._decode(frame_embeds, frame_embeds)
            logits, masks = self._prediction(ms, proj_mf)
            emb, logits, masks = ms[-1], logits[-1], masks[-1]
            valid = seg_valid
            was_track = jnp.zeros((fQ,), bool)
        else:
            fq_pos, _ = self._mask_pos(seg_pred_masks, mask_feature)
            queries = jnp.concatenate([state.track_query, new_ins], axis=0)
            qpos = jnp.concatenate([state.sg_pos, fq_pos[:nq]], axis=0)
            key_mask = jnp.concatenate([state.alive, jnp.ones((nq,), bool)])
            ms = self._decode(
                queries, frame_embeds, query_pos=qpos, frame_pos=fq_pos,
                query_mask=key_mask,
            )
            logits, masks = self._prediction(ms, proj_mf)

            # slot branch scores gate track-query survival (ovis_infer :718-731)
            slot_src = jnp.concatenate([state.track_query, bg], axis=0)
            row_valid = jnp.concatenate([state.alive, jnp.ones((self.num_slots,), bool)])
            sq_idx = self._match_slots_to_seg(slot_src, seg_query_feat, row_valid)
            slots_feats = seg_query_feat[sq_idx]
            slots_query = jnp.concatenate([state.sg_pos, bg], axis=0)
            slot_ms = self._slot_decode(
                slots_feats, frame_embeds, slot_src, slots_query,
                row_valid=row_valid,
            )
            s_logits, _ = self._prediction(slot_ms[-1:], proj_mf)

            prob = jax.nn.softmax(logits[-1].astype(jnp.float32), axis=-1)
            score = prob[:, :-1].max(axis=1)
            if self.ovis_infer:
                s_prob = jax.nn.softmax(s_logits[-1].astype(jnp.float32), axis=-1)
                s_score = s_prob[:, :-1].max(axis=1)
                trc_valid = (score[:Qc] > self.inference_select_thr) & (
                    s_score[:Qc] > self.keep_threshold
                )
            else:
                trc_valid = score[:Qc] > self.inference_select_thr
            det_valid = score[Qc:] > self.inference_select_thr
            valid = jnp.concatenate([trc_valid & state.alive, det_valid])
            was_track = jnp.concatenate([state.alive, jnp.zeros((nq,), bool)])
            emb, logits, masks = ms[-1], logits[-1], masks[-1]

        S_cur = emb.shape[0]

        if first:
            activated = valid
            invalid_for_query = jnp.zeros((S_cur,), jnp.int32)
        else:
            # survival bookkeeping: tracked-but-invalid slots persist for up
            # to kick_out_frame_num frames (:732-744)
            missed = was_track[:Qc] & ~valid[:Qc] & state.alive
            new_invalid = jnp.where(missed, state.invalid_frames + 1, 0)
            keep_missed = missed & (new_invalid < self.kick_out_frame_num)
            activated = valid | jnp.concatenate(
                [keep_missed, jnp.zeros((S_cur - Qc,), bool)]
            )
            invalid_for_query = jnp.concatenate(
                [new_invalid, jnp.zeros((S_cur - Qc,), jnp.int32)]
            )

        raw_pos_proj, _ = self._mask_pos(masks, mask_feature)
        tgt_dummy = jnp.full((S_cur,), -1, jnp.int32)
        new_state = self._activate_slots(
            state, activated, emb, tgt_dummy, raw_pos_proj, invalid_for_query,
            pos_update_for_query=valid,
        )
        new_state, src = new_state

        # slot-aligned outputs: row i describes the instance occupying slot i
        # AFTER this frame's activation/compaction — the host accumulates per
        # stable ``seq_id`` (the TPU replacement for the reference's
        # video_ins_hub dict bookkeeping, track_module.py:698-755)
        out = {
            "slot_logits": logits[src],  # (Qc, K+1)
            "slot_masks": masks[src],  # (Qc, H, W) mask logits
            "slot_embeds": new_state.track_query,  # (Qc, C)
            "slot_sg_pos": new_state.sg_pos,  # (Qc, C) SGFF pos (refiner pad)
            "alive": new_state.alive,  # (Qc,)
            "seq_id": new_state.seq_id,  # (Qc,)
        }
        return out, new_state
