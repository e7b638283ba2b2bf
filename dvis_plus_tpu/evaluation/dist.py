"""Cross-host evaluator aggregation.

Replaces the reference's ``comm.gather(predictions, dst=0)``
(``DVIS_Plus/dvis_Plus/data_video/ytvis_eval.py:115-143``): each host
serializes its local prediction rows and process 0 concatenates them. On a
single process this is the identity; under ``jax.distributed`` the rows ride
``multihost_utils.process_allgather`` as uint8 payloads (JSON), padded to the
max length across hosts.
"""
from __future__ import annotations

import json
from typing import List

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


def gather_predictions(local_rows: List[dict]) -> List[dict]:
    """Returns the concatenated rows from every host on process 0 (all
    processes receive the full list; only process 0 should write files)."""
    if jax.process_count() == 1:
        return local_rows
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(local_rows).encode(), np.uint8)
    n = np.asarray([payload.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    max_n = int(sizes.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: payload.size] = payload
    all_payloads = np.asarray(multihost_utils.process_allgather(padded))
    rows: List[dict] = []
    for i in range(jax.process_count()):
        buf = all_payloads[i, : int(sizes[i])].tobytes()
        rows.extend(json.loads(buf.decode()))
    return rows
