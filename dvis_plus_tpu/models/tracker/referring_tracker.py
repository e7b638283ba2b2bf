"""Referring tracker (DVIS++ online stage 2): frame-recurrent transformer
decoder with query-identity denoising.

Re-designs reference ``ReferringTracker_noiser``
(``DVIS_Plus/dvis_Plus/tracker.py:94-380``) and ``Noiser``
(``DVIS_Plus/dvis_Plus/noiser.py``):

- per frame: cosine-similarity Hungarian alignment of current segmenter
  queries to the previous frame (noiser.match_embds :43-56), optional
  weighted-average shuffle noise during training ('wa' mode :18-28), then
  ``num_layers`` x [ReferringCrossAttention(identity, q=reference, k=frame
  queries, v=frame queries) -> SelfAttn -> FFN] (tracker.py:239-329). On the
  first frame of a video the per-layer query is ``ref_proj`` of the previous
  layer's output (:258-259); on subsequent frames it is the fixed
  ``ref_proj(last_output)`` reference (:278, :313);
- recurrent state (reference module attributes ``last_outputs`` /
  ``last_frame_embeds`` :174-186) is an explicit pytree carry threaded through
  ``nn.scan`` and returned to the caller — the streaming ``resume=True``
  protocol is "pass the carry back in";
- heads (:368-380): class head on concat(reference, output) (2C -> K+1), mask
  head MLP -> einsum with 1x1-projected mask features;
- the per-frame scipy Hungarian host round-trip becomes the in-graph solver,
  keeping the whole streaming loop on device.

Layouts: embeds (B, T, Q, C); mask features NHWC (B, T, H, W, C).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.models.segmenter.transformer_decoder import (
    FFNLayer,
    MLP,
    MultiHeadAttention,
    SelfAttentionLayer,
)
from dvis_plus_tpu.ops.assignment import auction_lap


class TrackerState(NamedTuple):
    """Streaming carry across frames/windows (device-resident)."""

    last_output: jnp.ndarray  # (B, Q, C) last-layer output of prev frame
    last_frame_embeds: jnp.ndarray  # (B, Q, C) aligned segmenter embeds
    is_first: jnp.ndarray  # scalar bool: next frame starts a new video


def init_tracker_state(B: int, Q: int, C: int, dtype=jnp.float32) -> TrackerState:
    z = jnp.zeros((B, Q, C), dtype)
    return TrackerState(last_output=z, last_frame_embeds=z, is_first=jnp.asarray(True))


def match_embds(ref: jnp.ndarray, cur: jnp.ndarray, solver: str = "auction") -> jnp.ndarray:
    """(Q, C) x (Q, C) -> permutation aligning cur to ref (noiser.py:43-56).

    solver: "auction" (default; ~1 bidding round on well-separated cosine
    costs) or "jv" (exact sequential JV — the reference's scipy
    linear_sum_assignment semantics, used for parity runs)."""
    ref_n = ref / (jnp.linalg.norm(ref, axis=1, keepdims=True) + 1e-6)
    cur_n = cur / (jnp.linalg.norm(cur, axis=1, keepdims=True) + 1e-6)
    C = 1.0 - cur_n @ ref_n.T  # (Q_cur, Q_ref)
    C = jnp.where(jnp.isnan(C), 0.0, C)
    if solver == "jv":
        from dvis_plus_tpu.ops.hungarian import hungarian

        q, _ = hungarian(C.T.astype(jnp.float32))
        return q  # (Q_ref,) -> current index
    return auction_lap(C.T.astype(jnp.float32))  # (Q_ref,) -> current index


def _wa_compose(cur_no_norm: jnp.ndarray, perm: jnp.ndarray, w: jnp.ndarray):
    """Pure 'wa' composition given a shuffle ``perm`` (Q,) and weights ``w``
    (Q, 1): init = cur*w + cur[perm]*(1-w); returned index switches to the
    shuffle where w < 0.5 (noiser.py:18-28)."""
    Q = cur_no_norm.shape[0]
    noise_init = cur_no_norm * w.astype(cur_no_norm.dtype) + cur_no_norm[perm] * (
        1.0 - w.astype(cur_no_norm.dtype)
    )
    ret_idx = jnp.where(w[:, 0] < 0.5, perm, jnp.arange(Q))
    return ret_idx, noise_init


def _cc_compose(cur_no_norm: jnp.ndarray, perm: jnp.ndarray, split: jnp.ndarray):
    """Pure 'cc' composition given a shuffle ``perm`` (Q,) and per-query
    channel split points ``split`` (Q, 1): the first split_i channels come
    from the query itself, the rest from the shuffled one; the returned
    index switches to the shuffle where split < C//2 (noiser.py:30-41)."""
    Q, C = cur_no_norm.shape
    chan = jnp.arange(C)[None, :]
    keep = (chan < split).astype(cur_no_norm.dtype)
    mixed = cur_no_norm * keep + cur_no_norm[perm] * (1.0 - keep)
    ret_idx = jnp.where(split[:, 0] < C // 2, perm, jnp.arange(Q))
    return ret_idx, mixed


def _rs_noise(rng: jax.Array, cur_no_norm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random-shuffle noise (noiser.py:12-16)."""
    perm = jax.random.permutation(rng, cur_no_norm.shape[0])
    return perm, cur_no_norm[perm]


def _wa_noise(rng: jax.Array, cur_no_norm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-average shuffle noise (noiser.py:18-28). (Q, C) -> (idx, init)."""
    Q = cur_no_norm.shape[0]
    k1, k2 = jax.random.split(rng)
    perm = jax.random.permutation(k1, Q)
    w = jax.random.uniform(k2, (Q, 1), dtype=jnp.float32)
    return _wa_compose(cur_no_norm, perm, w)


def _cc_noise(rng: jax.Array, cur_no_norm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-crossover noise (noiser.py:30-41): per query, a random channel
    split point mixes its own embedding with a shuffled one."""
    Q, C = cur_no_norm.shape
    k1, k2 = jax.random.split(rng)
    split = jax.random.randint(k1, (Q, 1), 0, C)
    perm = jax.random.permutation(k2, Q)
    return _cc_compose(cur_no_norm, perm, split)


def noiser(
    rng: jax.Array,
    ref_embeds: jnp.ndarray,
    cur_embeds: jnp.ndarray,
    cur_no_norm: jnp.ndarray,
    activate: jnp.ndarray,
    noise_ratio: float,
    mode: str = "wa",
    solver: str = "auction",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (indices, noised_init) (noiser.py:58-77; modes none/rs/wa/cc)."""
    matched = match_embds(ref_embeds, cur_embeds, solver)
    k1, k2 = jax.random.split(rng)
    use_noise = activate & (jax.random.uniform(k1) < noise_ratio)
    if mode == "none":
        return matched, cur_no_norm[matched]
    noise_fn = {"rs": _rs_noise, "wa": _wa_noise, "cc": _cc_noise}[mode]
    noise_idx, noise_init = noise_fn(k2, cur_no_norm)
    idx = jnp.where(use_noise, noise_idx, matched)
    init = jnp.where(use_noise, noise_init, cur_no_norm[matched])
    return idx, init


class ReferringCrossAttentionLayer(nn.Module):
    """identity + MHA(q=tgt, k=key, v=memory), post-norm (tracker.py:8-92)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, identity, tgt, key, memory):
        out = MultiHeadAttention(self.dim, self.num_heads, name="attn")(tgt, key, memory)
        return nn.LayerNorm(epsilon=1e-5, dtype=identity.dtype, name="norm")(identity + out)


class _FrameStep(nn.Module):
    """One recurrent frame step; scanned over T with broadcast params."""

    hidden_dim: int
    feedforward_dim: int
    num_heads: int
    num_layers: int
    noise_ratio: float
    training: bool
    noise_mode: str = "wa"
    matcher: str = "auction"  # "jv" = exact reference scipy-LSA semantics

    @nn.compact
    def __call__(self, carry: TrackerState, xs):
        cur, cur_nn, rng_f = xs  # (B, Q, C), (B, Q, C), key
        B, Q, C = cur.shape
        st = carry
        is_first = st.is_first

        ref_proj = MLP(C, C, num_layers=3, name="ref_proj")

        # --- noiser -------------------------------------------------------
        ref_for_match = jnp.where(is_first, cur, st.last_frame_embeds)
        activate = jnp.asarray(self.training) & ~is_first
        mode = "wa" if self.noise_mode == "hard" else self.noise_mode
        idx, init = jax.vmap(
            lambda r, rf, c, cn: noiser(
                r, rf, c, cn, activate, self.noise_ratio, mode, self.matcher
            )
        )(jax.random.split(rng_f, B), ref_for_match, cur, cur_nn)
        init = init.astype(cur.dtype)  # noiser math may promote to fp32
        aligned_embeds = jnp.take_along_axis(cur, idx[..., None], axis=1)

        frame_key = cur_nn
        # fixed reference for non-first frames / heads (tracker.py:276-279)
        reference = jnp.where(is_first, ref_proj(frame_key), ref_proj(st.last_output))

        # --- L-layer referring decoder -----------------------------------
        ms = []
        output = init
        for j in range(self.num_layers):
            if j == 0:
                identity, tgt = init, reference
            else:
                identity = output
                tgt = jnp.where(is_first, ref_proj(output), reference)
            output = ReferringCrossAttentionLayer(C, self.num_heads, name=f"cross_{j}")(
                identity, tgt, frame_key, frame_key
            )
            output = SelfAttentionLayer(C, self.num_heads, name=f"self_{j}")(
                output, jnp.zeros_like(output)
            )
            output = FFNLayer(C, self.feedforward_dim, name=f"ffn_{j}")(output)
            ms.append(output)
        ms = jnp.stack(ms, axis=0)  # (L, B, Q, C)

        new_state = TrackerState(
            last_output=ms[-1],
            last_frame_embeds=aligned_embeds,
            is_first=jnp.asarray(False),
        )
        return new_state, (ms, reference, idx)


class ReferringTracker(nn.Module):
    """Frame-recurrent referring tracker with explicit streaming carry.

    ``ov=True`` swaps the (K+1)-way class head for the FC-CLIP head: merged
    concat(reference, output) -> Dense + mask-pooled features -> CLIP-space
    classification against a text classifier (reference
    ``ReferringTracker_noiser_OV``, ov_dvis/video_dvis_modules_ov.py:28,
    prediction :288-313)."""

    num_classes: int
    hidden_dim: int = 256
    feedforward_dim: int = 2048
    num_heads: int = 8
    num_layers: int = 6
    mask_dim: int = 256
    noise_ratio: float = 0.5
    noise_mode: str = "wa"  # none | rs | wa | cc ('hard' aliases 'wa')
    matcher: str = "auction"  # frame-alignment LAP solver; "jv" for parity
    ov: bool = False
    clip_embed_dim: int = 768

    @nn.compact
    def __call__(
        self,
        frame_embeds: jnp.ndarray,  # (B, T, Q, C) normed segmenter embeds
        mask_features: jnp.ndarray,  # (B, T, H, W, mask_dim)
        frame_embeds_no_norm: Optional[jnp.ndarray] = None,
        state: Optional[TrackerState] = None,  # None = video start
        rng: Optional[jax.Array] = None,
        training: bool = False,
        text_classifier: Optional[jnp.ndarray] = None,
        num_templates: Optional[Tuple[int, ...]] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], TrackerState]:
        B, T, Q, C = frame_embeds.shape
        if frame_embeds_no_norm is None:
            frame_embeds_no_norm = frame_embeds
        if rng is None:
            rng = jax.random.key(0)

        if not self.ov:
            # the OV reference tracker has NO mask_feature_proj — it masks and
            # pools the segmenter's raw mask features (ov_dvis/
            # video_dvis_modules_ov.py:28-100 registers no such layer; cf.
            # close-vocab tracker.py:166)
            mask_features = nn.Dense(self.mask_dim, dtype=mask_features.dtype, name="mask_feature_proj")(mask_features)

        if state is None:
            state = init_tracker_state(B, Q, C, frame_embeds.dtype)
        else:
            # scan carry dtype must match the compute dtype exactly — drivers
            # may hand back an fp32 carry while AMP runs the frames in bf16
            state = TrackerState(
                last_output=state.last_output.astype(frame_embeds.dtype),
                last_frame_embeds=state.last_frame_embeds.astype(frame_embeds.dtype),
                is_first=state.is_first,
            )

        xs = (
            jnp.swapaxes(frame_embeds, 0, 1),
            jnp.swapaxes(frame_embeds_no_norm, 0, 1),
            jax.random.split(rng, T),
        )
        # remat the per-frame step during training: recompute the 6-layer
        # referring decoder in the backward pass instead of storing every
        # layer's activations per frame (HBM budgeting, SURVEY §7 "memory
        # choreography")
        step_cls = nn.remat(_FrameStep) if training else _FrameStep
        step = nn.scan(
            step_cls,
            variable_broadcast="params",
            variable_axes={},
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(
            hidden_dim=self.hidden_dim,
            feedforward_dim=self.feedforward_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            noise_ratio=self.noise_ratio,
            training=training,
            noise_mode=self.noise_mode,
            matcher=self.matcher,
            name="frame_step",
        )
        final_state, (outputs, references, indices) = step(state, xs)
        # outputs: (T, L, B, Q, C); references: (T, B, Q, C); indices: (T, B, Q)

        emit = outputs if training else outputs[:, -1:]
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=frame_embeds.dtype, name="decoder_norm")
        mask_embed = MLP(C, self.mask_dim, num_layers=3, name="mask_embed")

        x = decoder_norm(emit)  # (T, L', B, Q, C)
        cls_in = jnp.concatenate(
            [jnp.broadcast_to(references[:, None], x.shape), x], axis=-1
        )
        membd = mask_embed(x)
        masks = jnp.einsum(
            "tlbqc,bthwc->lbqthw", membd, mask_features, preferred_element_type=jnp.float32
        )
        if self.ov:
            from dvis_plus_tpu.models.ov.heads import get_classification_logits, mask_pooling

            assert text_classifier is not None and num_templates is not None
            Tn, Ln, Bn, Qn, _ = x.shape
            merged = nn.Dense(C, dtype=cls_in.dtype, name="merge")(cls_in)  # (T, L', B, Q, C)
            # pool the tracker's mask features under each predicted mask
            mf_flat = jnp.broadcast_to(
                mask_features[None], (Ln,) + mask_features.shape
            ).reshape(Ln * Bn * Tn, *mask_features.shape[2:])
            masks_flat = jnp.transpose(masks, (0, 1, 3, 2, 4, 5)).reshape(
                Ln * Bn * Tn, Qn, *masks.shape[-2:]
            )
            pooled = mask_pooling(mf_flat, masks_flat)  # (LBT, Q, Cm)
            pooled = pooled.reshape(Ln, Bn, Tn, Qn, -1).transpose(2, 0, 1, 3, 4)
            pooled = nn.LayerNorm(epsilon=1e-5, dtype=pooled.dtype, name="maskpool_norm")(pooled)
            pooled = nn.Dense(C, dtype=pooled.dtype, name="maskpool_proj")(pooled)
            cls_emb = MLP(C, self.clip_embed_dim, num_layers=3, name="class_embed_ov")(
                pooled + merged
            )
            scale = self.param(
                "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
            )
            logits = get_classification_logits(
                cls_emb, text_classifier, scale, num_templates
            )
        else:
            logits = nn.Dense(self.num_classes + 1, dtype=cls_in.dtype, name="class_embed")(cls_in)
        logits = jnp.transpose(logits, (1, 2, 0, 3, 4))  # (L', B, T, Q, K+1)

        out = {
            "pred_logits": logits[-1],
            "pred_masks": masks[-1],
            "aux_pred_logits": [logits[j] for j in range(logits.shape[0] - 1)],
            "aux_pred_masks": [masks[j] for j in range(masks.shape[0] - 1)],
            "pred_embds": jnp.transpose(emit[:, -1], (1, 0, 2, 3)),  # (B, T, Q, C)
            "pred_references": jnp.transpose(references, (1, 0, 2, 3)),
            "indices": jnp.transpose(indices, (1, 0, 2)),  # (B, T, Q)
        }
        return out, final_state
