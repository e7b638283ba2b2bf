"""OV-DVIS++ meta-architectures (open vocabulary).

Re-designs ``DVIS_Plus/ov_dvis/meta_architecture_ov.py`` (``MinVIS_OV`` :59,
``DVIS_online_OV`` :944, ``DVIS_offline_OV`` :1753):

- segmenter = frozen CLIP ConvNeXt trunk + MSDeformAttn pixel decoder + the
  OV masked-attention decoder (the FCCLIPHead stack,
  mask_former_head.py:154);
- per-dataset text classifiers with learned void embeddings (one per training
  dataset, :152-157) are built host-side by
  :mod:`dvis_plus_tpu.models.ov.text` and passed in as arrays;
- tracker/refiner reuse the close-vocab modules with ``ov=True`` class heads;
- inference ensembling (mask-pooled CLIP out-of-vocab head + geometric
  ensemble + void renormalization, :566-645) is
  :func:`ov_ensemble_inference`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import ModelConfig
from dvis_plus_tpu.models.ov.clip_backbone import CLIPBackbone
from dvis_plus_tpu.models.ov.heads import (
    geometric_ensemble,
    get_classification_logits,
    mask_pooling,
)
from dvis_plus_tpu.models.ov.ov_decoder import OVMaskedTransformerDecoder
from dvis_plus_tpu.models.segmenter.pixel_decoder import MSDeformAttnPixelDecoder
from dvis_plus_tpu.models.tracker.referring_tracker import ReferringTracker, TrackerState
from dvis_plus_tpu.models.refiner.temporal_refiner import TemporalRefiner


class OVSegmenter(nn.Module):
    """CLIP backbone + pixel decoder + OV query decoder (FCCLIPHead)."""

    cfg: ModelConfig

    def setup(self):
        self.backbone = CLIPBackbone(
            embed_dim=self.cfg.ov.clip_embed_dim,
            depths=self.cfg.backbone.clip_depths,
            dims=self.cfg.backbone.clip_dims,
            model_type=self.cfg.backbone.clip_model_type,
            resnet_width=self.cfg.backbone.clip_resnet_width,
            attnpool_spacial=self.cfg.backbone.clip_attnpool_spacial,
        )
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            conv_dim=self.cfg.pixel_decoder.conv_dim,
            mask_dim=self.cfg.pixel_decoder.mask_dim,
            num_enc_layers=self.cfg.pixel_decoder.transformer_enc_layers,
            n_heads=self.cfg.pixel_decoder.transformer_nheads,
            d_ffn=self.cfg.pixel_decoder.transformer_dim_feedforward,
            n_points=self.cfg.pixel_decoder.num_points,
            transformer_in_features=self.cfg.pixel_decoder.transformer_in_features,
            value_dtype=self.cfg.pixel_decoder.msdeform_value_dtype,
            island_dtype=self.cfg.pixel_decoder.island_dtype,
            impl=self.cfg.pixel_decoder.msdeform_impl,
        )
        # learned void embedding rows (one per training dataset; reference
        # meta_architecture_ov.py:152-157) — normalized and appended to every
        # text classifier in-graph via :meth:`full_classifier`
        self.void_embedding = self.param(
            "void_embedding", nn.initializers.normal(1.0),
            (self.cfg.ov.num_void_embeddings, self.cfg.ov.clip_embed_dim),
        )
        td = self.cfg.transformer_decoder
        self.transformer_decoder = OVMaskedTransformerDecoder(
            hidden_dim=td.hidden_dim,
            num_queries=td.num_queries,
            num_heads=td.nheads,
            dim_feedforward=td.dim_feedforward,
            num_layers=td.dec_layers,
            mask_dim=td.mask_dim,
            clip_embed_dim=self.cfg.ov.clip_embed_dim,
        )

    def full_classifier(
        self, text_classifier: jnp.ndarray, void_index: Optional[int] = None
    ) -> jnp.ndarray:
        """Append the learned void row(s) (reference
        ``get_text_classifier_with_void``, meta_architecture_ov.py:192-229).

        - ``void_index=i``: dataset i's PRIVATE void row (row 0 = the base
          ``void_embedding``, rows 1.. = ``additional_void_embedding``),
          normalized, with gradient — the training path (:205-211).
        - ``void_index=None``: no private row (unseen vocabulary at eval):
          rows are detached and merged per ``ov.void_merge_mode`` (:213-226)
          — 'coco' (default) = row 0, 'mean' = mean row, 'max' = all rows
          kept as one max-ensembled template group.
        """
        v = self.void_embedding
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
        if void_index is not None:
            rows = jax.lax.dynamic_slice_in_dim(v, int(void_index), 1, axis=0)
        else:
            v = jax.lax.stop_gradient(v)
            mode = self.cfg.ov.void_merge_mode
            if mode == "mean":
                rows = v.mean(axis=0, keepdims=True)
            elif mode == "max":
                rows = v  # max-ensembled downstream via num_templates
            elif mode == "coco":
                rows = v[:1]
            else:
                raise NotImplementedError(mode)
        return jnp.concatenate([text_classifier, rows.astype(text_classifier.dtype)], 0)

    def __call__(
        self,
        images: jnp.ndarray,  # (BT, H, W, 3)
        text_classifier: jnp.ndarray,
        num_templates: Sequence[int],
        void_index: Optional[int] = None,
    ) -> Dict[str, Any]:
        if text_classifier.shape[0] < sum(num_templates):
            text_classifier = self.full_classifier(text_classifier, void_index)
        compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        features = self.backbone(images.astype(compute_dtype))
        # backbone is frozen (reference clip.py:33); also optimizer-masked
        features = jax.tree.map(jax.lax.stop_gradient, features)
        mask_features, multi_scale = self.pixel_decoder(
            {k: v for k, v in features.items() if k.startswith("res")}
        )
        out = self.transformer_decoder(
            [m.astype(compute_dtype) for m in multi_scale],
            mask_features.astype(compute_dtype),
            text_classifier,
            num_templates,
        )
        out["clip_vis_dense"] = features["clip_vis_dense"]
        if self.is_initializing():
            # touch the out-of-vocab head so init covers the pool_clip path
            dense0 = features["clip_vis_dense"]
            if self.cfg.backbone.clip_model_type == "resnet":
                _ = self.backbone.masked_attention_pool(
                    dense0, jnp.zeros((dense0.shape[0], 1) + dense0.shape[1:3],
                                      compute_dtype)
                )
            else:
                _ = self.backbone.visual_prediction(
                    jnp.zeros((1, dense0.shape[-1]), compute_dtype)
                )
        return out

    def pool_clip(self, clip_dense: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        """Out-of-vocab head (reference visual_prediction_forward dispatch,
        clip.py:112-117): ConvNeXt = binary mask-pool + MLP head; RN = masked
        attention pooling."""
        if self.cfg.backbone.clip_model_type == "resnet":
            return self.backbone.masked_attention_pool(clip_dense, masks)
        pooled = mask_pooling(clip_dense, masks)
        return self.backbone.visual_prediction(pooled)

    def clip_logit_scale(self):
        return self.backbone.logit_scale


class DVISOnlineOV(nn.Module):
    """OV segmenter + OV referring tracker (DVIS_online_OV :944)."""

    cfg: ModelConfig

    def setup(self):
        self.segmenter = OVSegmenter(self.cfg)
        td = self.cfg.transformer_decoder
        self.tracker = ReferringTracker(
            num_classes=0,  # unused in OV mode
            hidden_dim=td.hidden_dim,
            feedforward_dim=self.cfg.tracker.feedforward_dim,
            num_heads=self.cfg.tracker.num_heads,
            num_layers=self.cfg.tracker.num_layers,
            mask_dim=td.hidden_dim,
            noise_ratio=self.cfg.tracker.noise_ratio,
            matcher=self.cfg.tracker.matcher_solver,
            ov=True,
            clip_embed_dim=self.cfg.ov.clip_embed_dim,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # (B, T, H, W, 3)
        text_classifier: jnp.ndarray,
        num_templates: Tuple[int, ...],
        state: Optional[TrackerState] = None,
        rng: Optional[jax.Array] = None,
        training: bool = False,
        void_index: Optional[int] = None,
    ):
        B, T = images.shape[:2]
        seg_out = self.segmenter(
            images.reshape((B * T,) + images.shape[2:]), text_classifier,
            num_templates, void_index,
        )
        seg_out = jax.tree.map(jax.lax.stop_gradient, seg_out)
        C = seg_out["pred_embds"].shape[-1]
        frame_embds = seg_out["pred_embds"].reshape(B, T, -1, C)
        frame_embds_nn = seg_out["pred_embds_without_norm"].reshape(B, T, -1, C)
        mf = seg_out["mask_features"]
        mask_features = mf.reshape((B, T) + mf.shape[1:])
        tc_full = text_classifier
        if text_classifier.shape[0] < sum(num_templates):
            tc_full = self.segmenter.full_classifier(text_classifier, void_index)
        track_out, new_state = self.tracker(
            frame_embds,
            mask_features,
            frame_embeds_no_norm=frame_embds_nn,
            state=state,
            rng=rng,
            training=training,
            text_classifier=tc_full,
            num_templates=num_templates,
        )
        return seg_out, track_out, new_state

    def pool_clip(self, clip_dense, masks):
        return self.segmenter.pool_clip(clip_dense, masks)

    def full_classifier(self, text_classifier, void_index: Optional[int] = None):
        return self.segmenter.full_classifier(text_classifier, void_index)

    def clip_logit_scale(self):
        return self.segmenter.clip_logit_scale()


class DVISOfflineOV(nn.Module):
    """+ OV temporal refiner (DVIS_offline_OV :1753)."""

    cfg: ModelConfig

    def setup(self):
        self.online = DVISOnlineOV(self.cfg)
        td = self.cfg.transformer_decoder
        self.refiner = TemporalRefiner(
            dtype=jnp.dtype(self.cfg.compute_dtype),
            num_classes=0,
            hidden_dim=td.hidden_dim,
            feedforward_dim=self.cfg.refiner.feedforward_dim,
            num_heads=self.cfg.refiner.num_heads,
            num_layers=self.cfg.refiner.num_layers,
            mask_dim=td.hidden_dim,
            window=self.cfg.refiner.window_size,
            ov=True,
            clip_embed_dim=self.cfg.ov.clip_embed_dim,
        )

    def __call__(
        self,
        images: jnp.ndarray,
        text_classifier: jnp.ndarray,
        num_templates: Tuple[int, ...],
        state: Optional[TrackerState] = None,
        rng: Optional[jax.Array] = None,
        training: bool = False,
        void_index: Optional[int] = None,
    ):
        B, T = images.shape[:2]
        seg_out, track_out, new_state = self.online(
            images, text_classifier, num_templates, state=state, rng=rng,
            training=False, void_index=void_index,
        )
        track_out = jax.tree.map(jax.lax.stop_gradient, track_out)
        C = seg_out["pred_embds_without_norm"].shape[-1]
        frame_embds = seg_out["pred_embds_without_norm"].reshape(B, T, -1, C)
        mf = seg_out["mask_features"]
        mask_features = mf.reshape((B, T) + mf.shape[1:])
        tc_full = text_classifier
        if text_classifier.shape[0] < sum(num_templates):
            tc_full = self.online.full_classifier(text_classifier, void_index)
        refine_out = self.refiner(
            track_out["pred_embds"],
            frame_embds,
            mask_features,
            training=training,
            text_classifier=tc_full,
            num_templates=num_templates,
        )
        return seg_out, track_out, refine_out, new_state

    # ---- windowed-inference pieces (HBM-bounded; engine/ov_inference.py) ----

    def online_forward(self, images, text_classifier, num_templates, state=None,
                       void_index: Optional[int] = None):
        return self.online(
            images, text_classifier, num_templates, state=state,
            void_index=void_index,
        )

    def refine_embeds(self, instance_embeds, frame_embeds, time_mask=None):
        return self.refiner.embed_pass(instance_embeds, frame_embeds, time_mask=time_mask)

    def refine_mask_window(self, mask_embed, mask_features):
        return self.refiner.mask_window(mask_embed, mask_features)

    def refine_ov_classify(self, fused, pooled, text_classifier, num_templates,
                           void_index: Optional[int] = None):
        if text_classifier.shape[0] < sum(num_templates):
            text_classifier = self.online.full_classifier(text_classifier, void_index)
        return self.refiner.ov_classify(fused, pooled, text_classifier, num_templates)

    def pool_clip(self, clip_dense, masks):
        return self.online.pool_clip(clip_dense, masks)

    def full_classifier(self, text_classifier, void_index: Optional[int] = None):
        return self.online.full_classifier(text_classifier, void_index)

    def clip_logit_scale(self):
        return self.online.clip_logit_scale()


def ov_ensemble_inference(
    in_vocab_logits: jnp.ndarray,  # (T, Q, K+1) from the model
    pooled_clip_embeds: Optional[jnp.ndarray],  # (T, Q, Cc) pool_clip output
    text_classifier: jnp.ndarray,
    num_templates: Sequence[int],
    logit_scale: jnp.ndarray,
    category_overlapping: jnp.ndarray,  # (K,)
    alpha: float = 0.4,
    beta: float = 0.8,
    out_vocab_logits: Optional[jnp.ndarray] = None,  # precomputed (T, Q, K+1)
) -> jnp.ndarray:
    """Final OV logits (reference :566-645): out-of-vocab CLIP logits +
    geometric ensemble + void renormalization. Returns (T, Q, K+1) log-probs.

    Pass either ``pooled_clip_embeds`` (classified here) or precomputed
    ``out_vocab_logits``."""
    if out_vocab_logits is None:
        out_vocab_logits = get_classification_logits(
            pooled_clip_embeds, text_classifier, logit_scale, num_templates
        )
    return geometric_ensemble(
        in_vocab_logits, out_vocab_logits, category_overlapping, alpha, beta
    )
