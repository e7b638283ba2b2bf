"""CLIP ModifiedResNet (RN50) trunk + masked attention pooling.

The reference's R50 OV rows run the open_clip RN50 visual trunk
(ov_dvis/backbones/clip.py:131-148 extract_features_resnet, :158-202
visual_prediction_forward_resnet). open_clip is not installed in this env
(PARITY.md: ConvNeXt trunk oracle is env-blocked the same way), so parity is
checked against a torch twin of the public CLIP ModifiedResNet architecture
built in this file — the same evidence class as the text-tower-vs-torch-MHA
check. The converter path (convert_open_clip_resnet / convert_clip_attnpool)
is exercised end-to-end through the torch state_dict.
"""
import math
from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch twin (public CLIP ModifiedResNet architecture)
# ---------------------------------------------------------------------------


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        ("-1", nn.AvgPool2d(stride)),
                        ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False)),
                        ("1", nn.BatchNorm2d(planes * 4)),
                    ]
                )
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class TModifiedResNet(nn.Module):
    def __init__(self, layers=(1, 1, 1, 1), width=16):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        mods = [TBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * TBottleneck.expansion
        for _ in range(1, blocks):
            mods.append(TBottleneck(self._inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        out = {}
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        out["stem"] = x
        x = self.avgpool(x)
        for i, layer in enumerate([self.layer1, self.layer2, self.layer3, self.layer4]):
            x = layer(x)
            out[f"res{i + 2}"] = x
        return out


class TAttnPool(nn.Module):
    def __init__(self, spacial_dim, embed_dim, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = embed_dim // 64


def torch_masked_pool(attnpool, x, masks):
    """The reference's visual_prediction_forward_resnet math
    (ov_dvis/backbones/clip.py:158-202) on a torch twin attnpool."""
    batch, channel, height, width = x.shape
    pe = attnpool.positional_embedding
    spatial = pe[1:, None, :]
    orig = int(math.sqrt(spatial.shape[0]))
    spatial = spatial.permute(1, 2, 0).reshape(1, channel, orig, orig)
    spatial = F.interpolate(spatial, size=(height, width), mode="bilinear",
                            align_corners=False)
    spatial = spatial.permute(2, 3, 0, 1).reshape(height * width, 1, channel)
    x = x.reshape(batch, channel, height * width).permute(2, 0, 1)
    key_value = x + spatial
    num_masks = masks.shape[1]
    masks = masks.reshape(batch, num_masks, height * width)
    masks = (masks > 0).to(masks.dtype)
    query = x.mean(0, keepdim=True) + pe[:1, None, :]
    query = query.repeat_interleave(num_masks, dim=0)
    attn_mask = (masks < 0.5).unsqueeze(1).expand(-1, attnpool.num_heads, -1, -1)
    attn_mask = attn_mask.reshape(batch * attnpool.num_heads, query.shape[0],
                                  key_value.shape[0])
    out = F.multi_head_attention_forward(
        query=query, key=key_value, value=key_value,
        embed_dim_to_check=key_value.shape[-1],
        num_heads=attnpool.num_heads,
        q_proj_weight=attnpool.q_proj.weight,
        k_proj_weight=attnpool.k_proj.weight,
        v_proj_weight=attnpool.v_proj.weight,
        in_proj_weight=None,
        in_proj_bias=torch.cat([attnpool.q_proj.bias, attnpool.k_proj.bias,
                                attnpool.v_proj.bias]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=attnpool.c_proj.weight,
        out_proj_bias=attnpool.c_proj.bias,
        use_separate_proj_weight=True, training=False, need_weights=False,
        attn_mask=attn_mask,
    )[0].permute(1, 0, 2)
    return out


def _randomize_bn(mod, rng):
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.weight.data = torch.tensor(rng.randn(n), dtype=torch.float32)
            m.bias.data = torch.tensor(rng.randn(n) * 0.1, dtype=torch.float32)
            m.running_mean.data = torch.tensor(rng.randn(n) * 0.1, dtype=torch.float32)
            m.running_var.data = torch.tensor(rng.rand(n) + 0.5, dtype=torch.float32)


LAYERS, WIDTH = (1, 1, 1, 1), 16


def test_modified_resnet_trunk_matches_torch_twin():
    from dvis_plus_tpu.models.ov.clip_backbone import (
        ModifiedResNet,
        convert_open_clip_resnet,
    )

    rng = np.random.RandomState(0)
    tw = TModifiedResNet(LAYERS, WIDTH).eval()
    _randomize_bn(tw, rng)
    sd = {f"visual.{k}": v.numpy() for k, v in tw.state_dict().items()}
    params = {"params": convert_open_clip_resnet(sd, layers=LAYERS)}

    x = rng.rand(2, 40, 48, 3).astype(np.float32)
    with torch.no_grad():
        ref = tw(torch.tensor(x).permute(0, 3, 1, 2))
    model = ModifiedResNet(LAYERS, WIDTH)
    got = model.apply(params, jnp.asarray(x))
    for k in ("res2", "res3", "res4", "res5"):
        r = ref[k].permute(0, 2, 3, 1).numpy()
        g = np.asarray(got[k])
        assert g.shape == r.shape, (k, g.shape, r.shape)
        err = np.abs(g - r).max() / (np.abs(r).max() + 1e-8)
        assert err < 2e-5, (k, err)
    assert np.allclose(got["clip_vis_dense"], got["res5"])


def test_masked_attention_pool_matches_torch_twin():
    from dvis_plus_tpu.models.ov.clip_backbone import (
        CLIPAttentionPool,
        convert_clip_attnpool,
    )

    rng = np.random.RandomState(1)
    C, OUT, S = 128, 64, 4
    tw = TAttnPool(S, C, OUT).eval()
    sd = {f"visual.attnpool.{k}": v.detach().numpy() for k, v in
          tw.state_dict().items()}
    params = {"params": convert_clip_attnpool(sd)}

    B, H, W, N = 2, 5, 6, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    masks = rng.randn(B, N, H, W).astype(np.float32)
    masks[:, 0] += 1.0  # ensure non-empty
    masks = np.where(masks > 0, 1.0, -1.0).astype(np.float32)
    # every mask must be non-empty for the torch comparison (all-masked rows
    # softmax to NaN in torch; our kernel guards them — tested below)
    for b in range(B):
        for n in range(N):
            if not (masks[b, n] > 0).any():
                masks[b, n, 0, 0] = 1.0

    with torch.no_grad():
        ref = torch_masked_pool(
            tw, torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(masks)
        ).numpy()
    pool = CLIPAttentionPool(embed_dim=C, output_dim=OUT, spacial_dim=S)
    got = np.asarray(pool.apply(params, jnp.asarray(x), jnp.asarray(masks)))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert err < 2e-5, err

    # empty mask: torch would NaN; we fall back to unmasked attention
    empty = np.full((B, 1, H, W), -1.0, np.float32)
    out_e = np.asarray(pool.apply(params, jnp.asarray(x), jnp.asarray(empty)))
    assert np.all(np.isfinite(out_e))


def test_ov_segmenter_resnet_end_to_end():
    """OVSegmenter with clip_model_type=resnet: forward + pool_clip produce
    the right shapes (the RN50 out-of-vocab head path is reachable)."""
    from dvis_plus_tpu.core.config import Config
    from dvis_plus_tpu.models.meta.ov import OVSegmenter

    cfg = Config().model
    cfg.num_classes = 3
    cfg.ov.enabled = True
    cfg.ov.clip_embed_dim = 32
    cfg.backbone.clip_model_type = "resnet"
    cfg.backbone.clip_depths = (1, 1, 1, 1)
    cfg.backbone.clip_dims = (64, 128, 256, 512)
    cfg.backbone.clip_resnet_width = 16
    cfg.backbone.clip_attnpool_spacial = 4
    cfg.pixel_decoder.conv_dim = 32
    cfg.pixel_decoder.mask_dim = 32
    cfg.pixel_decoder.transformer_enc_layers = 1
    cfg.pixel_decoder.transformer_dim_feedforward = 64
    cfg.transformer_decoder.hidden_dim = 32
    cfg.transformer_decoder.num_queries = 8
    cfg.transformer_decoder.nheads = 4
    cfg.transformer_decoder.dim_feedforward = 64
    cfg.transformer_decoder.dec_layers = 2
    cfg.transformer_decoder.mask_dim = 32

    model = OVSegmenter(cfg)
    tc = jnp.asarray(np.random.RandomState(2).randn(6, 32), jnp.float32)
    nt = (2, 2, 2, 1)  # 3 classes x 2 templates + 1 void row
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r, i: model.init(r, i, tc, nt))(
        jax.random.key(0), imgs
    )
    out = model.apply(params, imgs, tc, nt)
    assert out["pred_logits"].shape == (2, 8, 4)
    assert out["clip_vis_dense"].shape[-1] == 16 * 32
    pooled = model.apply(
        params, out["clip_vis_dense"], out["pred_masks"],
        method=OVSegmenter.pool_clip,
    )
    assert pooled.shape == (2, 8, 32)
    assert np.all(np.isfinite(np.asarray(pooled)))
