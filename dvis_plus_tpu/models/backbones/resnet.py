"""ResNet backbone (NHWC, TPU-native).

The reference uses detectron2's ``build_resnet_backbone`` (selected by config,
e.g. ``DVIS_Plus/configs/.../Base-OVIS-VideoInstanceSegmentation.yaml``):
caffe-style R50/R101 with stride-in-1x1 bottlenecks and frozen BatchNorm.
Matching that structure keeps torch->jax weight ports exact. On TPU:

- NHWC layout (XLA's native conv layout on TPU; channels ride the lane dim).
- FrozenBN folds to a per-channel affine (y = x * scale + bias) which XLA
  fuses into the surrounding convs.
- res2..res5 pyramid out, matching the d2 Backbone contract
  (``forward(NCHW) -> {res2..res5}`` in the reference; here NHWC).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics == per-channel affine.

    Parameters mirror torch BN buffers (weight, bias, running_mean,
    running_var) so checkpoint ports are 1:1; all are non-trainable in spirit
    (freezing is enforced by the optimizer mask, matching the reference's
    FrozenBatchNorm2d semantics).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mul = (scale * (var + self.eps) ** -0.5).astype(x.dtype)
        add = (bias - mean * scale * (var + self.eps) ** -0.5).astype(x.dtype)
        return x * mul + add


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True  # caffe/d2 style: stride lives in the 1x1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (params fp32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut",
            )(x)
            shortcut = FrozenBN(self.out_channels, name="shortcut_norm")(shortcut)

        y = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=(s1, s1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="norm1")(y))
        y = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=(s3, s3),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="norm2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBN(self.out_channels, name="norm3")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """R50/R101 pyramid backbone. Input NHWC float; output {res2..res5} NHWC."""

    depths: Sequence[int] = (3, 4, 6, 3)  # R50
    width: int = 64
    stride_in_1x1: bool = True
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        y = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv1",
        )(x)
        y = nn.relu(FrozenBN(self.width, name="stem_norm1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs: Dict[str, jnp.ndarray] = {}
        channels = self.width * 4
        bottleneck = self.width
        for stage_idx, depth in enumerate(self.depths):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(depth):
                y = Bottleneck(
                    out_channels=channels,
                    bottleneck_channels=bottleneck,
                    stride=stride if block_idx == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"res{stage_idx + 2}_block{block_idx}",
                )(y)
            outs[f"res{stage_idx + 2}"] = y
            channels *= 2
            bottleneck *= 2
        return {k: v for k, v in outs.items() if k in self.out_features}


def resnet50(**kw) -> ResNet:
    return ResNet(depths=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(depths=(3, 4, 23, 3), **kw)
