"""Segmenter = backbone + pixel decoder + masked-attention query decoder.

Replaces the reference's ``MaskFormerHead`` glue
(``DVIS_Plus/mask2former/modeling/meta_arch/mask_former_head.py:18``) plus
detectron2's ``build_backbone``/``build_sem_seg_head`` registries with one flax
module. Frames ride the batch dim: input (BT, H, W, 3) normalized images,
output the per-frame prediction dict from
:class:`~dvis_plus_tpu.models.segmenter.transformer_decoder.MaskedTransformerDecoder`.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from dvis_plus_tpu.core.config import ModelConfig
from dvis_plus_tpu.models.backbones.resnet import resnet50, resnet101
from dvis_plus_tpu.models.segmenter.pixel_decoder import MSDeformAttnPixelDecoder
from dvis_plus_tpu.models.segmenter.transformer_decoder import MaskedTransformerDecoder


def build_backbone(cfg: ModelConfig) -> nn.Module:
    name = cfg.backbone.name
    dtype = jnp.dtype(cfg.compute_dtype)  # AMP-style compute (params fp32)
    if name == "resnet50":
        return resnet50(out_features=cfg.backbone.out_features, dtype=dtype)
    if name == "resnet101":
        return resnet101(out_features=cfg.backbone.out_features, dtype=dtype)
    if name.startswith("swin"):
        from dvis_plus_tpu.models.backbones.swin import build_swin

        return build_swin(cfg.backbone, dtype=dtype)
    if name == "vit_adapter_dinov2":
        from dvis_plus_tpu.models.backbones.vit_adapter import build_vit_adapter

        return build_vit_adapter(cfg.backbone, dtype=dtype)
    raise ValueError(f"Unknown backbone: {name}")


class Segmenter(nn.Module):
    """Frame-level Mask2Former segmenter (the frozen stage-1 model of DVIS)."""

    cfg: ModelConfig

    def setup(self):
        self.backbone = build_backbone(self.cfg)
        if self.cfg.pixel_decoder.name == "fpn":
            from dvis_plus_tpu.models.segmenter.pixel_decoder import FPNPixelDecoder

            self.pixel_decoder = FPNPixelDecoder(
                conv_dim=self.cfg.pixel_decoder.conv_dim,
                mask_dim=self.cfg.pixel_decoder.mask_dim,
            )
        else:
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
        td = self.cfg.transformer_decoder
        self.transformer_decoder = MaskedTransformerDecoder(
            num_classes=self.cfg.num_classes,
            hidden_dim=td.hidden_dim,
            num_queries=td.num_queries,
            num_heads=td.nheads,
            dim_feedforward=td.dim_feedforward,
            num_layers=td.dec_layers,
            mask_dim=td.mask_dim,
            reid_branch=td.reid_branch,
            reid_hidden_dim=td.reid_hidden_dim,
        )

    def __call__(self, images: jnp.ndarray) -> Dict[str, Any]:
        """images: (BT, H, W, 3) normalized. Returns per-frame prediction dict."""
        compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        features = self.backbone(images.astype(compute_dtype))
        mask_features, multi_scale = self.pixel_decoder(features)
        return self.transformer_decoder(
            [m.astype(compute_dtype) for m in multi_scale],
            mask_features.astype(compute_dtype),
        )
