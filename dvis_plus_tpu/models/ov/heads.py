"""Open-vocabulary classification heads and ensembling.

Re-designs the OV head math from ``DVIS_Plus/ov_dvis/meta_architecture_ov.py``:

- :func:`get_classification_logits` (:44-57): cosine logits against the text
  classifier with clamped exp(logit_scale), max-ensembled over each class's
  prompt templates (the last block is the learned void row set);
- :func:`mask_pooling` (ODISE MaskPooling, video_mask2former_transformer_
  decoder_ov.py:39-67): binary (>0) mask-averaged dense features;
- :func:`geometric_ensemble` (:608-641): in-vocab vs out-of-vocab (CLIP)
  probability fusion with alpha (seen) / beta (unseen) exponents gated by the
  category-overlap mask, then void-probability re-normalization (:636-641).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def get_classification_logits(
    x: jnp.ndarray,  # (..., C) query embeddings
    text_classifier: jnp.ndarray,  # (R, C) rows = class-template embeds ++ void rows
    logit_scale: jnp.ndarray,  # scalar (log scale)
    num_templates: Sequence[int],  # rows per class; last entry = void rows
) -> jnp.ndarray:
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    t = text_classifier / (
        jnp.linalg.norm(text_classifier, axis=-1, keepdims=True) + 1e-12
    )
    scale = jnp.minimum(jnp.exp(logit_scale), 100.0)
    logits = scale * x @ t.T  # (..., R)
    outs = []
    cur = 0
    for n in num_templates[:-1]:
        outs.append(logits[..., cur : cur + n].max(axis=-1))
        cur += n
    outs.append(logits[..., -num_templates[-1] :].max(axis=-1))
    return jnp.stack(outs, axis=-1)  # (..., K+1)


def mask_pooling(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C) dense features; mask (B, Q, Hm, Wm) logits ->
    (B, Q, C) binary-mask-averaged features (no gradient through the mask)."""
    B, H, W, C = x.shape
    if mask.shape[-2:] != (H, W):
        mask = jax.image.resize(mask, mask.shape[:-2] + (H, W), method="bilinear", antialias=False)
    m = jax.lax.stop_gradient((mask > 0.0).astype(x.dtype))  # (B, Q, H, W)
    denom = m.sum(axis=(-1, -2), keepdims=False)[..., None] + 1e-8  # (B, Q, 1)
    return jnp.einsum("bhwc,bqhw->bqc", x, m) / denom


def geometric_ensemble(
    in_vocab_logits: jnp.ndarray,  # (..., K+1) incl. void column
    out_vocab_logits: jnp.ndarray,  # (..., K+1) CLIP-pooled logits incl. void
    category_overlapping: jnp.ndarray,  # (K,) 1 = seen during training
    alpha: float = 0.4,
    beta: float = 0.8,
    valid_masking: Optional[jnp.ndarray] = None,  # (..., 1) masks with pixels
) -> jnp.ndarray:
    """Returns fused log-probabilities (..., K+1) (reference :608-641)."""
    in_probs = jax.nn.softmax(in_vocab_logits.astype(jnp.float32), axis=-1)[..., :-1]
    out_probs = jax.nn.softmax(out_vocab_logits.astype(jnp.float32), axis=-1)[..., :-1]
    if valid_masking is not None:
        a = alpha * valid_masking
        b = beta * valid_masking
    else:
        a = alpha
        b = beta
    seen = category_overlapping.astype(jnp.float32)
    log_seen = jnp.log(
        jnp.clip(in_probs ** (1.0 - a) * out_probs**a, 1e-20, 1.0)
    ) * seen
    log_unseen = jnp.log(
        jnp.clip(in_probs ** (1.0 - b) * out_probs**b, 1e-20, 1.0)
    ) * (1.0 - seen)
    cls_results = log_seen + log_unseen  # (..., K)

    is_void = jax.nn.softmax(in_vocab_logits.astype(jnp.float32), axis=-1)[..., -1:]
    probs = jnp.concatenate(
        [jax.nn.softmax(cls_results, axis=-1) * (1.0 - is_void), is_void], axis=-1
    )
    return jnp.log(probs + 1e-8)
