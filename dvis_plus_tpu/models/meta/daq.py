"""DVIS-DAQ meta-architectures: frozen segmenter + Video Instance Cutter.

Re-designs reference ``DVIS_DAQ_online`` / ``DVIS_DAQ_offline``
(``DVIS_DAQ/dvis_daq/meta_architecture.py:33-1469``):

- training forward (:241-343): progressive frame-count curriculum picks a
  contiguous subclip (host-side, static per-length executables); frozen
  segmenter; per-frame FrameMatcher precomputed for the whole clip (:300-313);
  stage 2 -> 3 at ``increasing_step[0]`` (:316-319); cutter outputs + slot
  outputs scored by the DAQ criterion with ``slot_`` prefixed copies
  (:324-341);
- streaming inference (:1169+): per-frame cutter steps with the CutterState
  carry; per-slot logits averaged over frames a la post-processing; mask NMS
  for new queries and top-K selection happen in
  :func:`dvis_plus_tpu.engine.daq_inference`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import ModelConfig
from dvis_plus_tpu.losses.matcher import MatchCosts
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.daq.cutter import (
    CutterState,
    VideoInstanceCutter,
    init_cutter_state,
)
from dvis_plus_tpu.models.daq.matcher import FrameMatchResult, frame_match
from dvis_plus_tpu.models.segmenter.segmenter import Segmenter


class DAQOnline(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.segmenter = Segmenter(self.cfg)
        d = self.cfg.daq
        td = self.cfg.transformer_decoder
        self.cutter = VideoInstanceCutter(
            num_classes=self.cfg.num_classes,
            hidden_dim=td.hidden_dim,
            feedforward_dim=self.cfg.tracker.feedforward_dim,
            num_heads=self.cfg.tracker.num_heads,
            num_layers=self.cfg.tracker.num_layers,
            mask_dim=td.hidden_dim,
            num_new_ins=d.num_new_ins,
            num_slots=d.num_slots,
            num_track_slots=d.max_num_instances,
            training_select_thr=d.training_select_thr,
            inference_select_thr=d.inference_select_thr,
            kick_out_frame_num=d.kick_out_frame_num,
            keep_threshold=d.keep_threshold,
            ovis_infer=d.ovis_infer,
        )

    def _segment(self, images: jnp.ndarray):
        """(T, H, W, 3) -> per-frame segmenter outputs (stop-gradient)."""
        seg_out = self.segmenter(images)
        return jax.tree.map(jax.lax.stop_gradient, seg_out)

    def __call__(
        self,
        images: jnp.ndarray,  # (T, H, W, 3) one clip (reference asserts B==1)
        targets: VideoTargets,  # batch dim squeezed: labels (N,), ...
        rng: jax.Array,
        stage: int = 2,
    ):
        """Training forward: returns (outputs, slot_outputs) per-frame lists
        + the frame match results (for diagnostics)."""
        T = images.shape[0]
        seg_out = self._segment(images)
        ccfg = self.cfg.criterion
        costs = MatchCosts(
            class_weight=ccfg.class_weight,
            mask_weight=ccfg.mask_weight,
            dice_weight=ccfg.dice_weight,
            num_points=ccfg.train_num_points,
            solver=ccfg.matcher_solver,
        )

        mf = seg_out["mask_features"]  # (T, H4, W4, Cm)
        rngs = jax.random.split(rng, T + 1)
        fms: List[FrameMatchResult] = []
        for i in range(T):
            fms.append(
                frame_match(
                    rngs[i],
                    seg_out["pred_logits"][i],
                    seg_out["pred_masks"][i],
                    targets.labels,
                    targets.masks[:, i],
                    targets.frame_valid[:, i],
                    select_thr=0.01,  # aux_inference_select_thr
                    costs=costs,
                )
            )

        outputs, slot_outputs = self.cutter(
            seg_out["pred_embds_without_norm"],
            mf,
            seg_out["query_feat"],
            seg_out["pred_masks"],
            fms,
            targets,
            rngs[T],
            stage=stage,
            match_costs=costs,
        )
        return outputs, slot_outputs, fms

    def segment_only(self, images: jnp.ndarray):
        """Eval helper: per-frame segmenter outputs."""
        return self._segment(images)

    def cutter_step(
        self,
        state: CutterState,
        frame_embeds: jnp.ndarray,
        mask_feature: jnp.ndarray,
        seg_query_feat: jnp.ndarray,
        seg_pred_masks: jnp.ndarray,
        seg_valid: jnp.ndarray,
        first: bool = False,
    ):
        return self.cutter.inference_step(
            state, frame_embeds, mask_feature, seg_query_feat, seg_pred_masks,
            seg_valid, first=first,
        )

    def cutter_window(
        self,
        state: CutterState,
        frame_embeds: jnp.ndarray,  # (Tw, fQ, C)
        mask_features: jnp.ndarray,  # (Tw, H4, W4, Cm)
        seg_query_feat: jnp.ndarray,  # (fQ, C) frame-independent
        seg_pred_masks: jnp.ndarray,  # (Tw, fQ, H4, W4)
    ):
        """Steady-state streaming over a whole window in ONE executable:
        ``nn.scan`` of :meth:`cutter_step` (first=False) with the CutterState
        carry, so the engine dispatches once and pulls the stacked slot
        outputs once per window instead of per frame. (The reference steps
        python-side per frame, ``track_module.py:606-744``; per-frame host
        round-trips made the streaming path dispatch-bound on TPU.)"""
        dummy_valid = jnp.zeros((frame_embeds.shape[1],), bool)

        def body(mdl, carry, xs):
            fe_t, mf_t, pm_t = xs
            out, new_state = mdl.cutter.inference_step(
                carry, fe_t, mf_t, seg_query_feat, pm_t, dummy_valid,
                first=False,
            )
            return new_state, out

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        final_state, outs = scan(
            self, state, (frame_embeds, mask_features, seg_pred_masks)
        )
        return outs, final_state


def daq_train_loss(
    rng: jax.Array,
    outputs: List[Dict],
    slot_outputs: List[Dict],
    targets: VideoTargets,
    cfg,
) -> Dict[str, jnp.ndarray]:
    """Criterion on main + slot outputs; slot losses 'slot_' prefixed
    (reference :333-341, slot targets start at frame 1)."""
    from dvis_plus_tpu.engine.trainer import criterion_config
    from dvis_plus_tpu.models.daq.criterion import daq_criterion

    ccfg = criterion_config(cfg)
    T = len(outputs)
    r1, r2 = jax.random.split(rng)
    losses = daq_criterion(r1, outputs, targets, list(range(T)), ccfg)
    if slot_outputs:
        slot_losses = daq_criterion(
            r2, slot_outputs, targets, list(range(1, T)), ccfg
        )
        losses.update({f"slot_{k}": v for k, v in slot_losses.items()})
    return losses


class DAQOffline(nn.Module):
    """DAQ online + temporal refiner over top-K tracked slots
    (reference ``DVIS_DAQ_offline`` meta_architecture.py:868-1268:
    OFFLINE_TOPK_NUM instances from the cutter feed the padding-masked
    refiner; final logits fuse refined and online class probabilities)."""

    cfg: ModelConfig

    def setup(self):
        self.online = DAQOnline(self.cfg)
        td = self.cfg.transformer_decoder
        from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner

        self.refiner = TemporalRefiner(
            dtype=jnp.dtype(self.cfg.compute_dtype),
            num_classes=self.cfg.num_classes,
            hidden_dim=td.hidden_dim,
            feedforward_dim=self.cfg.refiner.feedforward_dim,
            num_heads=self.cfg.refiner.num_heads,
            num_layers=self.cfg.refiner.num_layers,
            mask_dim=td.hidden_dim,
            window=self.cfg.refiner.window_size,
        )

    def segment_only(self, images):
        return self.online._segment(images)

    def cutter_step(self, *args, **kwargs):
        return self.online.cutter.inference_step(*args, **kwargs)

    def cutter_window(self, *args, **kwargs):
        return self.online.cutter_window(*args, **kwargs)

    def __call__(
        self,
        images: jnp.ndarray,  # (T, H, W, 3) one clip
        targets: Optional[VideoTargets] = None,  # unused; kept for init parity
        rng: Optional[jax.Array] = None,
    ):
        """Training forward (reference DVIS_DAQ_offline.forward :1085-1137):
        frozen segmenter + frozen cutter run streaming inference in-graph
        (static slot table; the reference's no_grad common_inference), the
        per-sequence embed series feeds the trainable refiner.

        TPU redesign of the python-dict seq bookkeeping: sequences are capped
        at ``S = max_num_instances``; per frame the slot-aligned outputs are
        scattered into per-seq rows by the stable ``seq_id`` (later sequences
        drop — the reference keeps all, but with T <= 20 training frames and
        S = 50 capacity the cap is never hit in practice).

        Returns (online_out, refine_out): online_out carries the per-seq mean
        logits + full masks for matcher guidance (first training half)."""
        T = images.shape[0]
        seg_out = self.online._segment(images)
        cutter = self.online.cutter
        Qc = cutter.num_track_slots
        S = Qc  # seq capacity == slot capacity
        d = self.cfg.daq

        fe = seg_out["pred_embds_without_norm"]  # (T, fQ, C)
        mf = seg_out["mask_features"]  # (T, H4, W4, Cm)
        qf = seg_out["query_feat"]  # (fQ, C)
        pm = seg_out["pred_masks"]  # (T, fQ, H4, W4)
        C = fe.shape[-1]
        K1 = self.cfg.num_classes + 1
        H4, W4 = mf.shape[1:3]

        state = init_cutter_state(Qc, C, fe.dtype)
        embeds_seq = jnp.zeros((S, T, C), fe.dtype)
        logits_seq = jnp.zeros((S, T, K1), jnp.float32)
        masks_seq = jnp.full((S, T, H4, W4), -1e4, jnp.float32)
        sg_seq = jnp.zeros((S, C), fe.dtype)
        tv = jnp.zeros((S, T), bool)

        for t in range(T):
            if t == 0:
                prob = jax.nn.softmax(seg_out["pred_logits"][0].astype(jnp.float32), -1)
                valid0 = prob[:, :-1].max(axis=1) > d.aux_inference_select_thr
            else:
                valid0 = jnp.zeros((fe.shape[1],), bool)
            out, state = cutter.inference_step(
                state, fe[t], mf[t], qf, pm[t], valid0, first=(t == 0)
            )
            out = jax.tree.map(jax.lax.stop_gradient, out)
            sid = jnp.where(out["alive"], out["seq_id"], S)  # S = drop row
            sid = jnp.where(sid < S, sid, S)
            embeds_seq = embeds_seq.at[sid, t].set(out["slot_embeds"], mode="drop")
            logits_seq = logits_seq.at[sid, t].set(
                out["slot_logits"].astype(jnp.float32), mode="drop"
            )
            masks_seq = masks_seq.at[sid, t].set(
                out["slot_masks"].astype(jnp.float32), mode="drop"
            )
            sg_seq = sg_seq.at[sid].set(out["slot_sg_pos"], mode="drop")
            tv = tv.at[sid, t].set(True, mode="drop")

        cnt = tv.sum(axis=1)
        seq_valid = cnt > 0
        mean_logits = (logits_seq * tv[..., None]).sum(axis=1) / jnp.maximum(
            cnt[:, None], 1
        )  # (S, K+1)
        probs = jax.nn.softmax(mean_logits, axis=-1)
        scores = jnp.where(seq_valid, probs[:, :-1].max(axis=1), -1.0)
        inst_mask = offline_topk_mask(scores, seq_valid, d.offline_topk_num)

        # absent frames carry the sequence's SGFF pos embed (reference
        # common_inference :1254-1266, padding_embed = identity)
        embeds_filled = jnp.where(tv[..., None], embeds_seq, sg_seq[:, None])
        inst = jnp.swapaxes(embeds_filled, 0, 1)[None]  # (1, T, S, C)
        frame_embeds = fe[None]  # (1, T, fQ, C)
        refine_out = self.refiner(
            inst, frame_embeds, mf[None], training=True,
            instance_mask=inst_mask[None],
        )
        online_out = {
            "pred_logits": mean_logits[None, None],  # (1, 1, S, K+1)
            "pred_masks": masks_seq[None],  # (1, S, T, H4, W4)
        }
        return online_out, refine_out

    def refine(
        self,
        slot_embeds: jnp.ndarray,  # (1, T, Qc, C) per-frame tracked embeds
        frame_embeds: jnp.ndarray,  # (1, T, fQ, C) segmenter queries
        mask_features: jnp.ndarray,  # (1, T, H, W, Cm)
        topk_mask: jnp.ndarray,  # (1, Qc) offline top-K selection
    ):
        return self.refiner(
            slot_embeds, frame_embeds, mask_features, training=False,
            instance_mask=topk_mask,
        )

    def refine_embeds(self, slot_embeds, frame_embeds, topk_mask, time_mask=None):
        """HBM-bounded refiner pass (no mask features); pair with
        :meth:`refine_mask_window` per time chunk."""
        return self.refiner.embed_pass(
            slot_embeds, frame_embeds, instance_mask=topk_mask, time_mask=time_mask
        )

    def refine_mask_window(self, mask_embed, mask_features):
        return self.refiner.mask_window(mask_embed, mask_features)


def offline_topk_mask(
    mean_scores: jnp.ndarray,  # (Qc,) per-slot mean class score over frames
    alive: jnp.ndarray,  # (Qc,)
    topk: int,
) -> jnp.ndarray:
    """Select OFFLINE_TOPK_NUM alive slots by score (reference :606-607)."""
    Qc = mean_scores.shape[0]
    masked = jnp.where(alive, mean_scores, -1.0)
    thresh = jax.lax.top_k(masked, min(topk, Qc))[0][-1]
    return alive & (masked >= thresh)


def mask_nms_keep(
    masks: jnp.ndarray,  # (S, H, W) mask logits, sorted context not required
    scores: jnp.ndarray,  # (S,)
    valid: jnp.ndarray,  # (S,)
    thr: float,
) -> jnp.ndarray:
    """Sequential mask NMS (reference meta_architecture.py OVIS inference:
    suppress lower-scoring masks that overlap a kept mask above thr)."""
    S = masks.shape[0]
    bin_masks = masks > 0.0
    areas = bin_masks.reshape(S, -1).sum(axis=1)
    inter = jnp.einsum(
        "sa,ta->st",
        bin_masks.reshape(S, -1).astype(jnp.float32),
        bin_masks.reshape(S, -1).astype(jnp.float32),
    )
    ratio = inter / jnp.maximum(areas[:, None], 1.0)  # overlap of s inside t
    order = jnp.argsort(-scores)

    def body(i, keep):
        s = order[i]

        def check(j, acc):
            t = order[j]
            return acc | (keep[t] & (ratio[s, t] > thr))

        suppressed = jax.lax.fori_loop(0, i, check, False)
        return keep.at[s].set(valid[s] & ~suppressed)

    keep = jnp.zeros((S,), bool)
    return jax.lax.fori_loop(0, S, body, keep)
