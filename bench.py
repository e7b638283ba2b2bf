"""Benchmark: DVIS++ online (R50) streaming video inference throughput.

Measures end-to-end frames/sec/chip of the jit-compiled segmenter+tracker
window step at 720p (the BASELINE.json metric: "Video frames/sec/chip (R50 &
Swin-L, 720p clips)"), against the driver north star of 30 video fps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dvis_plus_tpu.core.config import Config
    from dvis_plus_tpu.models.meta.dvis_online import DVISOnline
    from dvis_plus_tpu.models.tracker.referring_tracker import init_tracker_state

    cfg = Config()
    cfg.model.num_classes = 40
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.transformer_decoder.num_queries = 100
    # TPU-native serving config: bf16 deformable-attention values (halves
    # gather bytes; offsets/softmax/weights stay fp32). The parity-strict
    # fp32-island config measures ~5.4-5.9 fps on the same setup.
    cfg.model.pixel_decoder.msdeform_value_dtype = "bfloat16"

    model = DVISOnline(cfg.model)

    T_w = 5  # streaming window (cfg TEST.WINDOW_SIZE default)
    H, W = 736, 1280  # 720p padded to size_divisibility=32
    images = jnp.zeros((1, T_w, H, W, 3), jnp.float32)
    # jit the init: eager init would run op-by-op through the TPU runtime
    params = jax.jit(model.init)(jax.random.key(0), images)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    @jax.jit
    def window_step(params, images, state):
        seg_out, track_out, new_state = model.apply(params, images, state=state)
        return (
            track_out["pred_logits"],
            track_out["pred_masks"],
            track_out["pred_embds"],
            new_state,
        )

    C2 = cfg.model.transformer_decoder.hidden_dim * (
        2 if cfg.model.transformer_decoder.reid_branch else 1
    )
    state = init_tracker_state(1, cfg.model.transformer_decoder.num_queries, C2)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(1, T_w, H, W, 3).astype(np.float32))

    def sync(x):
        # scalar device->host pull: reliable full sync (block_until_ready can
        # return early through the axon relay)
        return float(jnp.sum(x[:, :, ::64, ::64].astype(jnp.float32)))

    # warmup / compile
    logits, masks, embds, state = window_step(params, frames, state)
    sync(masks)

    n_windows = 6
    start = time.perf_counter()
    for _ in range(n_windows):
        logits, masks, embds, state = window_step(params, frames, state)
    sync(masks)
    elapsed = time.perf_counter() - start

    fps = (n_windows * T_w) / elapsed
    # north star: 30 video fps on v5e-8 => 3.75 fps/chip (BASELINE.json);
    # this bench runs on ONE chip, so compare per-chip rates
    result = {
        "metric": "video_frames_per_sec_per_chip_r50_online_720p",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / (30.0 / 8.0), 3),
        "params": n_params,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
