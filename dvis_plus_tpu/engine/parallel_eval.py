"""Single-process multi-device video-parallel eval.

The reference parallelizes dataset evaluation by spawning one DDP process per
GPU and striding the dataset across ranks (detectron2 ``InferenceSampler`` +
``launch`` in ``DVIS_Plus/train_net_video.py``). The TPU-native analog for a
single host with N local chips: one worker thread per device, each running the
ordinary per-video driver on its record-strided shard with the parameters
placed on its own device. JAX dispatch is asynchronous and thread-safe, so one
Python process keeps all chips busy; each worker builds its own jitted window
fns (the drivers key them in a per-call dict), and identical HLO hits the
persistent compilation cache across devices.

Evaluator calls are buffered per worker and replayed into the real evaluator
in original dataset order after the join, so results files are byte-identical
to a sequential run regardless of worker timing.

Enable with ``test.eval_devices=N`` (0 = all local devices). Composes with
cross-host eval sharding (data/build.py ``shard_records``): processes stripe
the dataset first, local workers stripe the process's shard.
"""
from __future__ import annotations

import logging
import threading
from typing import Callable, Iterator, List

import jax

from dvis_plus_tpu.core.config import Config

logger = logging.getLogger(__name__)


class RecordingEvaluator:
    """Buffers evaluator calls for ordered replay after the worker join."""

    def __init__(self):
        self.calls: List[tuple] = []

    def process(self, *args, **kwargs) -> None:
        self.calls.append(("process", args, kwargs))

    def process_bdd(self, *args, **kwargs) -> None:
        self.calls.append(("process_bdd", args, kwargs))

    def replay_into(self, evaluator, calls) -> None:
        for name, args, kwargs in calls:
            getattr(evaluator, name)(*args, **kwargs)


def eval_device_count(cfg: Config) -> int:
    n = int(getattr(cfg.test, "eval_devices", 1))
    n_local = len(jax.local_devices())
    if n == 0:
        n = n_local
    return max(1, min(n, n_local))


def run_device_parallel(
    cfg: Config,
    driver: Callable,  # driver(params, loader, evaluator)
    make_loader: Callable[[int, int], Iterator[dict]],
    evaluator,
    params,
) -> None:
    """Fan a per-video eval driver out over the local devices.

    ``make_loader(i, n)`` must yield the videos ``records[i::n]`` of this
    host's shard (build_test_loader's ``shard`` argument), so the round-robin
    replay below restores original dataset order.
    """
    n = eval_device_count(cfg)
    if n <= 1:
        driver(params, make_loader(0, 1), evaluator)
        return
    if int(getattr(cfg.test, "refiner_shard_devices", 0)) > 1:
        raise ValueError(
            "test.eval_devices and test.refiner_shard_devices both claim the "
            "local devices; enable one or the other"
        )

    devices = jax.local_devices()[:n]
    buffers = [RecordingEvaluator() for _ in range(n)]
    errors: List = [None] * n

    def work(i: int) -> None:
        try:
            p = jax.device_put(params, devices[i])
            driver(p, make_loader(i, n), buffers[i])
        except Exception as e:  # surfaced after join
            errors[i] = e

    threads = [
        threading.Thread(target=work, args=(i,), name=f"eval-dev{i}", daemon=True)
        for i in range(n)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errors:
        if e is not None:
            raise e

    # worker i buffered videos i, i+n, i+2n, ... — interleave back to
    # original order so output files match a sequential run
    ordered: List[tuple] = []
    j = 0
    while True:
        emitted = False
        for b in buffers:
            if j < len(b.calls):
                ordered.append(b.calls[j])
                emitted = True
        if not emitted:
            break
        j += 1
    buffers[0].replay_into(evaluator, ordered)
    logger.info("device-parallel eval: %d videos over %d devices", len(ordered), n)
