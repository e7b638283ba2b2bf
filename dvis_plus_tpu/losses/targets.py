"""Static-shape padded ground-truth targets.

The reference carries per-video python lists of variable-length target dicts
(``labels``/``masks``/``ids`` built in ``prepare_targets``, e.g. reference
``DVIS_Plus/dvis_Plus/meta_architecture.py:708-757``). Under jit everything must
be static, so GT is padded to a fixed per-clip instance capacity ``N`` with a
validity mask; absent frames are encoded exactly as the reference does
(``ids == -1`` -> empty mask for that frame).
"""
from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp


@chex.dataclass
class VideoTargets:
    """Padded per-clip ground truth.

    Attributes:
      labels: (B, N) int32 class index per instance slot (0..K-1; arbitrary for
        invalid slots).
      masks: (B, N, T, H, W) float32/bool binary masks at the prediction
        resolution (stride 4); all-zero in frames where the instance is absent.
      valid: (B, N) bool — slot holds a real instance (appears in >=1 frame).
      frame_valid: (B, N, T) bool — instance present in frame t (reference
        ``gt_ids != -1``).
    """

    labels: jnp.ndarray
    masks: jnp.ndarray
    valid: jnp.ndarray
    frame_valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.labels.shape[1]

    @property
    def num_frames(self) -> int:
        return self.frame_valid.shape[2]

    def num_instances(self) -> jnp.ndarray:
        """(B,) number of real instances per clip."""
        return jnp.sum(self.valid, axis=1)
