"""VideoMaskFormer: clip-level Mask2Former pretraining meta-architecture, and
the image (T=1) Mask2Former used for COCO segmenter pretraining.

Re-designs reference ``VideoMaskFormer``
(``DVIS_Plus/mask2former_video/video_maskformer_model.py:24-290``) and the
image ``MaskFormer`` (``DVIS_Plus/mask2former/maskformer_model.py:20``):

- video: backbone + pixel decoder per frame, clip-joint query decoder
  (:class:`ClipMaskedTransformerDecoder`), clip-level Hungarian + criterion
  (``match_mode='clip'``), top-K video instance inference;
- image: the same stack with T == 1 — instance/panoptic/semantic inference
  reuse the task heads in :mod:`dvis_plus_tpu.models.meta.dvis_online`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvis_plus_tpu.core.config import ModelConfig
from dvis_plus_tpu.losses.criterion import CriterionConfig, LayerOutputs, video_criterion
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.segmenter.clip_decoder import ClipMaskedTransformerDecoder
from dvis_plus_tpu.models.segmenter.pixel_decoder import MSDeformAttnPixelDecoder
from dvis_plus_tpu.models.segmenter.segmenter import build_backbone


class VideoMaskFormer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.backbone = build_backbone(self.cfg)
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
        )
        td = self.cfg.transformer_decoder
        self.transformer_decoder = ClipMaskedTransformerDecoder(
            num_classes=self.cfg.num_classes,
            hidden_dim=td.hidden_dim,
            num_queries=td.num_queries,
            num_heads=td.nheads,
            dim_feedforward=td.dim_feedforward,
            num_layers=td.dec_layers,
            mask_dim=td.mask_dim,
        )

    def __call__(self, images: jnp.ndarray) -> Dict[str, Any]:
        """images: (B, T, H, W, 3) normalized. Clip-level predictions."""
        B, T = images.shape[:2]
        compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        flat = images.reshape((B * T,) + images.shape[2:]).astype(compute_dtype)
        features = self.backbone(flat)
        mask_features, multi_scale = self.pixel_decoder(features)
        return self.transformer_decoder(
            [m.astype(compute_dtype) for m in multi_scale],
            mask_features.astype(compute_dtype),
            num_frames=T,
        )


def video_maskformer_train_loss(
    rng: jax.Array,
    out: Dict[str, Any],
    targets: VideoTargets,
    cfg: CriterionConfig,
    num_masks: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    outputs = LayerOutputs(pred_logits=out["pred_logits"], pred_masks=out["pred_masks"])
    aux = [
        LayerOutputs(pred_logits=lg, pred_masks=mk)
        for lg, mk in zip(out["aux_pred_logits"], out["aux_pred_masks"])
    ]
    losses, _ = video_criterion(
        rng, outputs, aux, targets, cfg._replace(match_mode="clip"), num_masks=num_masks
    )
    return losses


class ImageMaskFormer(VideoMaskFormer):
    """COCO image pretraining = the video model with one frame."""

    def __call__(self, images: jnp.ndarray) -> Dict[str, Any]:
        if images.ndim == 4:
            images = images[:, None]
        return super().__call__(images)
