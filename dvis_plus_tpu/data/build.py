"""Data loaders: infinite shuffled train loader with threaded prefetch +
ratio-weighted combined loader + sequential test loader.

Re-designs the reference's loader stack
(``DVIS_Plus/dvis_Plus/data_video/build.py:113-232`` and
``combined_loader.py:16-45``): d2's ``build_detection_train_loader`` becomes a
host-side generator pool (decode/resize on CPU threads) feeding device batches
(double-buffered by the caller via ``jax.device_put`` overlap), and
``CombinedDataLoader`` keeps its infinite ``random.choices`` ratio-sampling
semantics verbatim.
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.data.catalog import get_dataset, get_metadata
from dvis_plus_tpu.data.mapper import YTVISDatasetMapper


def mapper_for_type(cfg: Config, dataset_type: str, is_train: bool,
                    dataset_name: str = "", need_map: bool = False):
    """Dataset-type -> mapper dispatch (reference train_net_video.py:86-127:
    video_instance/video_panoptic/video_semantic/image_instance mapper_dict,
    plus DAQ's video_sot)."""
    if dataset_type == "video_instance":
        id_to_contiguous = None
        if need_map and dataset_name:
            # cross-dataset category mapping (COCO -> YTVIS/OVIS ids,
            # reference dataset_mapper.py:185-192)
            md = get_metadata(dataset_name)
            id_to_contiguous = md.thing_dataset_id_to_contiguous_id
        return YTVISDatasetMapper(cfg, is_train=is_train, id_to_contiguous=id_to_contiguous)
    if dataset_type == "video_panoptic":
        from dvis_plus_tpu.data.datasets.vps_vss import PanopticVideoMapper

        cats = []
        if dataset_name:
            md = get_metadata(dataset_name)
            cats = getattr(md, "categories", None) or []
        # things-first contiguous training classes (reference
        # dataset_mapper_vps.py:111-119)
        return PanopticVideoMapper(cfg, is_train=is_train, categories=cats)
    if dataset_type == "video_semantic":
        from dvis_plus_tpu.data.datasets.vps_vss import SemanticVideoMapper

        num_classes = cfg.model.num_classes
        return SemanticVideoMapper(cfg, is_train=is_train, num_classes=num_classes)
    if dataset_type == "image_instance":
        from dvis_plus_tpu.data.pseudo_video import CocoPseudoVideoMapper

        return CocoPseudoVideoMapper(cfg, is_train=is_train)
    if dataset_type == "image_panoptic":
        # COCO panoptic -> pseudo-video (the zero-shot OV training recipe;
        # reference train_net_video_ov.py:98 'image_panoptic' ->
        # OpenVocabularyCocoPanoClipDatasetMapper)
        from dvis_plus_tpu.data.pseudo_video import CocoPanopticPseudoVideoMapper

        cats = None
        if dataset_name:
            md = get_metadata(dataset_name)
            cats = getattr(md, "categories", None)
        return CocoPanopticPseudoVideoMapper(cfg, is_train=is_train, categories=cats)
    if dataset_type == "video_sot":
        from dvis_plus_tpu.data.mapper_sot import SOTDatasetMapper

        return SOTDatasetMapper(cfg, is_train=is_train)
    raise NotImplementedError(f"dataset_type {dataset_type}")


def _collate(samples: List[dict]) -> dict:
    """Stack per-clip arrays into batch arrays (all same static shape)."""
    out = {}
    for key in ("images", "labels", "masks", "valid", "frame_valid"):
        if key in samples[0]:
            out[key] = np.stack([s[key] for s in samples], axis=0)
    out["meta"] = [
        {k: s[k] for k in ("image_size", "height", "width", "video_id")}
        for s in samples
    ]
    return out


def build_train_loader(
    cfg: Config,
    dataset_name: str,
    mapper: Optional[Callable] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
    num_workers: int = 4,
) -> Iterator[dict]:
    """Infinite shuffled loader over one dataset."""
    records = get_dataset(dataset_name)
    mapper = mapper or YTVISDatasetMapper(cfg, is_train=True)
    batch_size = batch_size or cfg.solver.ims_per_batch
    rng = random.Random(seed)

    def sample_iter():
        counter = 0
        while True:
            order = list(range(len(records)))
            rng.shuffle(order)
            for i in order:
                counter += 1
                yield records[i], seed * 1_000_003 + counter

    src = sample_iter()
    lock = threading.Lock()
    q: "queue.Queue[dict]" = queue.Queue(maxsize=2 * batch_size)

    def worker():
        while True:
            with lock:
                rec, s = next(src)
            try:
                q.put(mapper(rec, seed=s))
            except Exception as e:  # surface data errors without killing training
                q.put(e)

    for _ in range(num_workers):
        threading.Thread(target=worker, daemon=True).start()

    def batches():
        while True:
            items = []
            while len(items) < batch_size:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                items.append(item)
            yield _collate(items)

    return batches()


class CombinedDataLoader:
    """Infinite ratio-weighted mixture of loaders (combined_loader.py:16-45)."""

    def __init__(self, loaders: Sequence[Iterator], ratios: Sequence[float], seed: int = 0):
        assert len(loaders) == len(ratios)
        self.loaders = list(loaders)
        self.ratios = list(ratios)
        self.rng = random.Random(seed)

    def __iter__(self):
        return self

    def __next__(self):
        idx = self.rng.choices(range(len(self.loaders)), weights=self.ratios, k=1)[0]
        batch = next(self.loaders[idx])
        # source-loader tag: OV training routes the per-dataset text
        # classifier by it (reference keys the classifier off the mapper's
        # dataset 'name' field, meta_architecture_ov.py:525-540)
        if isinstance(batch, dict):
            batch["dataset_index"] = idx
        return batch


def build_combined_train_loader(cfg: Config, seed: int = 0) -> Iterator[dict]:
    names = cfg.datasets.train
    types = list(cfg.datasets.dataset_type) or ["video_instance"] * len(names)
    need_map = list(cfg.datasets.dataset_need_map) or [False] * len(names)
    if len(types) < len(names):
        types = types + [types[-1]] * (len(names) - len(types))
    if len(need_map) < len(names):
        need_map = need_map + [False] * (len(names) - len(need_map))
    mappers = [
        mapper_for_type(cfg, t, True, dataset_name=n, need_map=m)
        for n, t, m in zip(names, types, need_map)
    ]
    if len(names) == 1:
        return build_train_loader(cfg, names[0], mapper=mappers[0], seed=seed)
    loaders = [
        build_train_loader(cfg, name, mapper=mappers[i], seed=seed + i)
        for i, name in enumerate(names)
    ]
    ratios = list(cfg.datasets.dataset_ratio) or [1.0] * len(loaders)
    return CombinedDataLoader(loaders, ratios, seed=seed)


def shard_records(records: Sequence, index: int, count: int) -> List:
    """Process-strided eval sharding (reference d2 InferenceSampler: each DDP
    rank evaluates ``indices[rank::world_size]``; evaluators re-join rows via
    ``gather_predictions``)."""
    return list(records)[index::count]


def build_test_loader(
    cfg: Config,
    dataset_name: str,
    mapper: Optional[Callable] = None,
    dataset_type: Optional[str] = None,
    shard: Optional[tuple] = None,
) -> Iterator[dict]:
    """Sequential one-video-at-a-time eval loader (reference
    build_detection_test_loader: batch size 1, no aug randomness); the mapper
    is routed by dataset type (reference train_net_video.py:117-127). Under
    ``jax.distributed`` each host evaluates its process-strided shard of the
    videos; the evaluators gather rows across hosts at ``evaluate``. An
    explicit ``shard=(index, count)`` further stripes the host's videos across
    local eval workers (engine/parallel_eval.py)."""
    records = get_dataset(dataset_name)
    import jax

    if jax.process_count() > 1:
        records = shard_records(records, jax.process_index(), jax.process_count())
    if shard is not None:
        records = shard_records(records, shard[0], shard[1])
    if mapper is None:
        if dataset_type is None:
            try:
                idx = list(cfg.datasets.test).index(dataset_name)
                dataset_type = (list(cfg.datasets.dataset_type_test) + ["video_instance"] * 8)[idx]
            except ValueError:
                dataset_type = "video_instance"
        mapper = mapper_for_type(cfg, dataset_type, False, dataset_name=dataset_name)

    def gen():
        for rec in records:
            yield mapper(rec, seed=0)

    return gen()


def prefetch_to_device(iterator: Iterator[dict], size: int = 2, sharding=None):
    """Double-buffered host->device prefetch (the reference overlaps loading
    via d2 worker processes; here a small deque of in-flight device puts keeps
    the TPU fed while the host decodes the next clips)."""
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
