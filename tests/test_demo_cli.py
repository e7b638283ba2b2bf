"""demo_video.py end-to-end on synthetic frames with a tiny config: plain
windowed run, the long-video --chunk-size keep protocol (reference
demo_long_video.py:120-126), and the OV custom-vocabulary demo (reference
demo_video/open_vocabulary/demo.py --thing_classes)."""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e lane

N_FRAMES = 6

TINY_YAML = """
model:
  meta_architecture: {arch}
  num_classes: 2
  compute_dtype: float32
  pixel_decoder:
    conv_dim: 32
    mask_dim: 32
    transformer_enc_layers: 1
    transformer_dim_feedforward: 64
  transformer_decoder:
    hidden_dim: 32
    num_queries: 8
    nheads: 4
    dim_feedforward: 64
    dec_layers: 2
    mask_dim: 32
  tracker: {{num_layers: 1, feedforward_dim: 64}}
  refiner: {{num_layers: 1, feedforward_dim: 64}}
{extra}
input: {{min_size_test: 64, max_size_test: 96}}
test: {{window_size: 3, max_num: 5}}
"""

OV_EXTRA = """  ov:
    enabled: true
    clip_embed_dim: 24
  backbone:
    clip_depths: [1, 1, 1, 1]
    clip_dims: [8, 16, 24, 32]
"""


def _frames(tmp_path):
    import cv2

    frames = tmp_path / "frames"
    os.makedirs(frames)
    rng = np.random.RandomState(0)
    for t in range(N_FRAMES):
        cv2.imwrite(str(frames / f"{t:05d}.jpg"), rng.randint(0, 255, (64, 96, 3), np.uint8))
    return str(frames)


def _run_demo(tmp_path, arch, extra_yaml, extra_args):
    import demo_video

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(TINY_YAML.format(arch=arch, extra=extra_yaml))
    out = str(tmp_path / "out")
    argv = [
        "demo_video.py", "--config-file", str(cfg_path),
        "--input", _frames(tmp_path), "--output", out,
    ] + extra_args
    old = sys.argv
    sys.argv = argv
    try:
        demo_video.main()
    finally:
        sys.argv = old
    pngs = [f for f in os.listdir(out) if f.endswith(".jpg")]
    assert len(pngs) == N_FRAMES, pngs
    return out


def test_demo_minvis(tmp_path):
    _run_demo(tmp_path, "minvis", "", ["--vocabulary", "cat,dog"])


def test_demo_online_chunked_keep(tmp_path):
    _run_demo(tmp_path, "dvis_online", "", ["--chunk-size", "3"])


def test_demo_ov_custom_vocab(tmp_path):
    _run_demo(
        tmp_path, "dvis_online", OV_EXTRA,
        ["--random-text", "--thing-classes", "cat,dog", "--stuff-classes", "sky"],
    )
