import pytest
"""Backbone pyramid contracts (res2..res5, NHWC) + torch ResNet port parity."""
import jax
import jax.numpy as jnp
import numpy as np

from dvis_plus_tpu.core.config import BackboneConfig
from dvis_plus_tpu.models.backbones.resnet import resnet50
from dvis_plus_tpu.models.backbones.swin import build_swin


@pytest.mark.slow
def test_resnet_pyramid_shapes():
    model = resnet50()
    x = jnp.zeros((2, 64, 96, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (2, 16, 24, 256)
    assert out["res3"].shape == (2, 8, 12, 512)
    assert out["res4"].shape == (2, 4, 6, 1024)
    assert out["res5"].shape == (2, 2, 3, 2048)


def test_resnet_matches_torch():
    """Port weights from a hand-built torch mini-ResNet (torchvision-style
    naming); features must match the torch forward bit-for-bit-ish."""
    import torch
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, mid, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(mid)
            self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(mid)
            self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if cin != cout or stride != 1:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )
            self.relu = tnn.ReLU()

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    class MiniResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(8)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = tnn.Sequential(Bottleneck(8, 8, 32))
            self.layer2 = tnn.Sequential(Bottleneck(32, 16, 64, stride=2))

        def forward(self, x):
            y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            r2 = self.layer1(y)
            r3 = self.layer2(r2)
            return r2, r3

    torch.manual_seed(0)
    tm = MiniResNet()
    # randomize BN stats so the affine fold is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    from dvis_plus_tpu.core.checkpoint import convert_torch_resnet
    from dvis_plus_tpu.models.backbones.resnet import ResNet

    model = ResNet(
        depths=(1, 1), width=8, stride_in_1x1=False, out_features=("res2", "res3")
    )
    params = convert_torch_resnet(sd, depths=(1, 1))

    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    out = model.apply(params, jnp.asarray(x))

    with torch.no_grad():
        r2, r3 = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out["res2"]), r2.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["res3"]), r3.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_swin_tiny_shapes():
    cfg = BackboneConfig(name="swin_t")
    model = build_swin(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 16, 24, 96)
    assert out["res3"].shape == (1, 8, 12, 192)
    assert out["res4"].shape == (1, 4, 6, 384)
    assert out["res5"].shape == (1, 2, 3, 768)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_swin_nondivisible_input():
    """Window padding path: input not divisible by window or patch size."""
    cfg = BackboneConfig(name="swin_t")
    model = build_swin(cfg)
    x = jnp.zeros((1, 67, 93, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape[1:3] == (17, 24)  # ceil(67/4), ceil(93/4)


@pytest.mark.slow
def test_swin_param_shapes_stable_across_input_sizes():
    """Params initialized at one video size must apply at any other: mixed-
    size eval crashed when the window size (and so the relative-position
    table shape) was clamped to small feature maps (regression)."""
    cfg = BackboneConfig(name="swin_t")
    model = build_swin(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 96, 64, 3)))
    # maps at stride 32 become 2x3 and 3x2 (< window 7): same params must fit
    for shape in ((1, 64, 96, 3), (1, 96, 64, 3), (1, 128, 128, 3)):
        out = model.apply(params, jnp.zeros(shape))
        assert np.all(np.isfinite(np.asarray(out["res5"])))


@pytest.mark.slow
def test_vit_adapter_tiny():
    from dvis_plus_tpu.models.backbones.vit_adapter import ViTAdapter
    import jax

    model = ViTAdapter(
        embed_dim=32, depth=4, num_heads=4, patch_size=16, conv_inplane=8,
        deform_num_heads=4, interaction_indexes=((0, 1), (2, 3)),
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 16, 16, 32)  # stride 4
    assert out["res3"].shape == (1, 8, 8, 32)
    assert out["res4"].shape == (1, 4, 4, 32)
    assert out["res5"].shape == (1, 2, 2, 32)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
