"""Optimizer: AdamW with detectron2-style parameter groups + full-model
gradient clipping + stage freezing.

Re-designs the reference ``Trainer.build_optimizer``
(``DVIS_Plus/train_net_video.py:138-216``):

- base LR with ``BACKBONE_MULTIPLIER`` (0.1) on backbone params;
- weight decay 0 on norm layers and embeddings (d2
  ``WEIGHT_DECAY_NORM``/``WEIGHT_DECAY_EMBED`` both 0.0 in the shipped
  configs); everything else ``WEIGHT_DECAY`` (0.05);
- ``FullModelGradientClippingOptimizer``: global-norm clip at
  ``CLIP_VALUE`` (0.01) across ALL params, not per-group;
- stage freezing (reference ``requires_grad_(False)``,
  meta_architecture.py:480-484, 1153-1155) expressed as an optax mask that
  zeroes updates for frozen subtrees — the TPU-friendly equivalent.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import optax


def _path_str(path) -> str:
    return "/".join(
        p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
    )


def _is_backbone(path: str) -> bool:
    return "backbone" in path


def _no_weight_decay(path: str, leaf) -> bool:
    p = path.lower()
    if leaf.ndim <= 1:  # biases, norm scales, 1-d embeddings
        return True
    return any(
        k in p
        for k in (
            "norm",
            "query_embed",
            "query_feat",
            "level_embed",
            "pos_embed",
            "relative_position",
            "absolute_pos",
        )
    )


def make_optimizer(
    base_lr_schedule: optax.Schedule,
    weight_decay: float = 0.05,
    backbone_multiplier: float = 0.1,
    clip_value: float = 0.01,
    betas: Tuple[float, float] = (0.9, 0.999),
    frozen_predicate: Callable[[str], bool] = lambda p: False,
) -> optax.GradientTransformation:
    """AdamW with param groups. ``frozen_predicate(path)`` -> True freezes."""

    def label_fn(params):
        def label(path, leaf):
            p = _path_str(path)
            if frozen_predicate(p):
                return "frozen"
            return "backbone" if _is_backbone(p) else "main"

        return jax.tree_util.tree_map_with_path(label, params)

    def wd_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: not _no_weight_decay(_path_str(path), leaf), params
        )

    def adamw(mult: float) -> optax.GradientTransformation:
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1]),
            optax.masked(
                optax.add_decayed_weights(weight_decay), wd_mask
            ),
            optax.scale_by_schedule(lambda c: -mult * base_lr_schedule(c)),
        )

    return optax.chain(
        optax.clip_by_global_norm(clip_value),
        optax.multi_transform(
            {
                "main": adamw(1.0),
                "backbone": adamw(backbone_multiplier),
                "frozen": optax.set_to_zero(),
            },
            label_fn,
        ),
    )


def make_frozen_predicate(frozen_components: Sequence[str]) -> Callable[[str], bool]:
    """Map config freeze names to param subtrees.

    'segmenter' freezes backbone + pixel decoder + transformer decoder
    (online stage); 'tracker' additionally freezes the tracker (offline)."""
    prefixes = []
    for comp in frozen_components:
        if comp == "segmenter":
            prefixes.append("segmenter")
        elif comp == "tracker":
            prefixes.append("tracker")
        elif comp == "backbone":
            prefixes.append("backbone")
        else:
            prefixes.append(comp)

    def pred(path: str) -> bool:
        return any(p in path for p in prefixes)

    return pred


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 10,
    warmup_factor: float = 0.001,
) -> optax.Schedule:
    """d2 WarmupMultiStepLR (SOLVER.STEPS/GAMMA/WARMUP_*)."""

    def schedule(count):
        import jax.numpy as jnp

        count = jnp.asarray(count)
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor + (1.0 - warmup_factor) * (count / jnp.maximum(warmup_iters, 1)),
            1.0,
        )
        decay = 1.0
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * warm * decay

    return schedule
