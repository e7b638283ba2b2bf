"""Metrics logging / observability.

Replaces detectron2's ``EventStorage`` + ``print_csv_format`` stack (reference
``train_net_video.py:38,269``; SURVEY §5.1/§5.5) with a small JSON-lines
metrics writer + rolling console summaries, plus ``jax.profiler`` trace hooks
for on-TPU tracing (SURVEY §5.1 "TPU build: add jax.profiler trace hooks").
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class EventWriter:
    """JSONL metrics log + smoothed console reporting."""

    def __init__(self, output_dir: str, window: int = 20):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._file = open(self.path, "a")
        self._hist = defaultdict(lambda: deque(maxlen=window))
        self._t_last = time.time()

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time(), **{k: float(v) for k, v in metrics.items()}}
        self._file.write(json.dumps(row) + "\n")
        self._file.flush()
        for k, v in metrics.items():
            self._hist[k].append(float(v))

    def smoothed(self, key: str) -> Optional[float]:
        h = self._hist.get(key)
        return sum(h) / len(h) if h else None

    def log_console(self, step: int, keys=("total_loss",)) -> None:
        now = time.time()
        dt = now - self._t_last
        self._t_last = now
        parts = [f"iter {step}"]
        for k in keys:
            s = self.smoothed(k)
            if s is not None:
                parts.append(f"{k} {s:.4f}")
        parts.append(f"({dt:.2f}s)")
        logger.info("  ".join(parts))

    def close(self):
        self._file.close()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context — view with TensorBoard/XProf."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> Dict[str, int]:
    """Best-effort HBM usage (replaces the reference's cuda empty_cache/OOM
    bookkeeping, mask2former_video/utils/memory.py — on TPU the equivalent
    guard is picking window sizes from this + remat, not retry loops)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use": stats.get("bytes_in_use", -1),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            "bytes_limit": stats.get("bytes_limit", -1),
        }
    except Exception:
        return {}


def pick_window_size(
    base_window: int,
    height: int,
    width: int,
    num_queries: int,
    hbm_budget_bytes: int = 12 * 1024**3,
) -> int:
    """Static replacement for retry_if_cuda_oom (SURVEY §5.3): shrink the
    streaming window until the dominant mask tensor fits the HBM budget.

    Peak is the (L, Q, T, H/4, W/4) fp32 mask stack of the tracker window."""
    per_frame = num_queries * (height // 4) * (width // 4) * 4  # bytes fp32
    w = base_window
    while w > 1 and per_frame * w * 8 > hbm_budget_bytes:  # 8x headroom factor
        w -= 1
    return max(w, 1)
