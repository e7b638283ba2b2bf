"""Train / eval CLI for all close-vocabulary configs.

Re-designs reference ``DVIS_Plus/train_net_video.py:318-329`` (detectron2
``launch`` + ``DefaultTrainer``) as an explicit JAX loop:

  python train_net_video.py --config-file configs/dvis_online_r50_ytvis19.yaml \
      [--eval-only] [--resume] [key.path=value ...]

Distributed: instead of ``--num-gpus`` process spawning, the device mesh is
discovered from ``jax.devices()`` (all local chips; multi-host via
``jax.distributed.initialize`` when JAX_COORDINATOR is set) and the batch is
sharded over the mesh's data axis.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("dvis_plus_tpu")


def build_model(cfg):
    arch = cfg.model.meta_architecture
    if arch in ("minvis", "ctvis"):
        from dvis_plus_tpu.models.segmenter.segmenter import Segmenter

        return Segmenter(cfg.model)
    if arch == "dvis_online":
        from dvis_plus_tpu.models.meta.dvis_online import DVISOnline

        return DVISOnline(cfg.model)
    if arch == "dvis_offline":
        from dvis_plus_tpu.models.meta.dvis_offline import DVISOffline

        return DVISOffline(cfg.model)
    if arch == "daq_online":
        from dvis_plus_tpu.models.meta.daq import DAQOnline

        return DAQOnline(cfg.model)
    if arch == "daq_offline":
        from dvis_plus_tpu.models.meta.daq import DAQOffline

        return DAQOffline(cfg.model)
    if arch == "maskformer":
        from dvis_plus_tpu.models.meta.video_maskformer import ImageMaskFormer

        return ImageMaskFormer(cfg.model)
    if arch == "video_maskformer":
        from dvis_plus_tpu.models.meta.video_maskformer import VideoMaskFormer

        return VideoMaskFormer(cfg.model)
    raise ValueError(arch)


def init_params(cfg, model, rng):
    T = cfg.input.sampling_frame_num
    div = cfg.model.size_divisibility

    def rup(x):
        return ((x + div - 1) // div) * div

    H = rup(max(cfg.input.min_size_train))
    W = rup(cfg.input.max_size_train)
    arch = cfg.model.meta_architecture
    if arch in ("minvis", "ctvis"):
        images = jnp.zeros((T, H, W, 3), jnp.float32)
        return jax.jit(model.init)(rng, images)
    if arch.startswith("daq"):
        from dvis_plus_tpu.losses.targets import VideoTargets

        N = cfg.model.criterion.max_num_instances
        targets = VideoTargets(
            labels=jnp.zeros((N,), jnp.int32),
            masks=jnp.zeros((N, T, H // 4, W // 4), bool),
            valid=jnp.zeros((N,), bool).at[0].set(True),
            frame_valid=jnp.zeros((N, T), bool).at[0].set(True),
        )
        images = jnp.zeros((T, H, W, 3), jnp.float32)
        return jax.jit(model.init)(rng, images, targets, jax.random.key(1))
    images = jnp.zeros((1, T, H, W, 3), jnp.float32)
    return jax.jit(model.init)(rng, images)


def register_all_datasets():
    """Register every dataset family (reference builtin.py:22-122 + vps/vss
    + COCO pseudo-video); missing files register lazily."""
    root = os.environ.get("DVIS_DATASETS", "datasets")
    from dvis_plus_tpu.data.datasets.ytvis import register_all_ytvis
    from dvis_plus_tpu.data.datasets.vps_vss import (
        register_all_vipseg,
        register_all_vspw,
    )

    register_all_ytvis(root)
    register_all_vipseg(root)
    register_all_vspw(root)
    try:
        from dvis_plus_tpu.data.datasets.coco import register_all_coco

        register_all_coco(root)
    except ImportError:
        pass


def do_train(cfg, args):
    from dvis_plus_tpu.core import checkpoint as ckpt
    from dvis_plus_tpu.data.build import build_combined_train_loader
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.losses.targets import VideoTargets
    from dvis_plus_tpu.parallel.mesh import build_mesh, shard_batch

    register_all_datasets()
    model = build_model(cfg)
    rng = jax.random.key(cfg.seed)
    params = init_params(cfg, model, rng)
    if cfg.weights:
        params = ckpt.load_weights(cfg.weights, params, cfg=cfg)

    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    start_step = 0
    ckpt_dir = os.path.join(cfg.output_dir, "checkpoints")
    if args.resume and os.path.isdir(ckpt_dir):
        latest = sorted(os.listdir(ckpt_dir))
        if latest:
            state = ckpt.restore(os.path.join(ckpt_dir, latest[-1]), state)
            start_step = int(state.step)
            logger.info("resumed from step %d", start_step)

    mesh = build_mesh(model_parallel_size=cfg.parallel.model_parallel_size)
    loader = build_combined_train_loader(cfg, seed=cfg.seed)

    from dvis_plus_tpu.utils.events import EventWriter

    writer = EventWriter(cfg.output_dir)
    log_every = 20
    t0 = time.time()
    import random as _random

    curriculum_rng = _random.Random(cfg.seed + 17)
    is_daq = cfg.model.meta_architecture.startswith("daq")
    # on-TPU tracing window (cfg.profile_dir / cfg.profile_steps; env
    # DVIS_PROFILE_DIR / DVIS_PROFILE_STEPS override) — writes an xplane
    # trace viewable with XProf / tools/profiling/parse_xplane.py
    # (SURVEY §5.1 trace hooks)
    prof_dir = os.environ.get("DVIS_PROFILE_DIR", "") or cfg.profile_dir
    prof_lo, _, _hi = (
        os.environ.get("DVIS_PROFILE_STEPS", "") or cfg.profile_steps
    ).partition("-")
    prof_lo, prof_hi = int(prof_lo), int(_hi or int(prof_lo) + 3)
    prof_on = False
    for step in range(start_step, cfg.solver.max_iter):
        raw = next(loader)
        if is_daq:
            from dvis_plus_tpu.engine.trainer import daq_curriculum_slice

            raw = daq_curriculum_slice(cfg, step, raw, curriculum_rng)
        batch = Batch(
            images=raw["images"],
            targets=VideoTargets(
                labels=raw["labels"],
                masks=raw["masks"],
                valid=raw["valid"],
                frame_valid=raw["frame_valid"],
            ),
        )
        batch = shard_batch(batch, mesh)
        if prof_dir:
            if step == prof_lo and not prof_on:
                jax.profiler.start_trace(prof_dir)
                prof_on = True
            elif step == prof_hi and prof_on:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                prof_on = False
                logger.info("profiler trace written to %s", prof_dir)
        state, metrics = train_step(state, batch, rng)
        if step % log_every == 0:
            writer.write(step, {k: float(v) for k, v in metrics.items()})
            writer.log_console(step)
        if (step + 1) % cfg.solver.checkpoint_period == 0 or step + 1 == cfg.solver.max_iter:
            path = os.path.join(ckpt_dir, f"step_{step + 1:07d}")
            ckpt.save(path, jax.device_get(state))
            logger.info("saved %s", path)
    if prof_dir and prof_on:  # loop ended inside the trace window
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", prof_dir)
    return state


def do_eval(cfg, args):
    from dvis_plus_tpu.core import checkpoint as ckpt
    from dvis_plus_tpu.data.build import build_test_loader
    from dvis_plus_tpu.data.catalog import get_metadata

    register_all_datasets()
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    if cfg.weights:
        params = ckpt.load_weights(cfg.weights, params, cfg=cfg)

    results = {}
    types = list(cfg.datasets.dataset_type_test) or []
    for idx, dataset_name in enumerate(cfg.datasets.test):
        dataset_type = types[idx] if idx < len(types) else "video_instance"
        loader = build_test_loader(cfg, dataset_name, dataset_type=dataset_type)
        results[dataset_name] = run_task_eval(
            cfg, model, params, loader, dataset_name, dataset_type
        )
        logger.info("%s: %s", dataset_name, results[dataset_name])
    print(json.dumps(results, indent=2))
    return results


def run_task_eval(cfg, model, params, loader, dataset_name, dataset_type):
    """Route the per-dataset eval by task (reference test.task dispatch:
    inference_video_{vis,vps,vss} meta_architecture.py:818/:869/:954 +
    per-type evaluators train_net_video.py:218-273). With
    ``test.eval_devices>1`` the driver fans out video-parallel over the local
    chips (engine/parallel_eval.py)."""
    from dvis_plus_tpu.data.catalog import get_metadata
    from dvis_plus_tpu.engine.parallel_eval import run_device_parallel

    md = get_metadata(dataset_name)
    out_dir = os.path.join(cfg.output_dir, "inference", dataset_name)
    task = cfg.test.task

    def make_loader(i, n):
        if n == 1 and loader is not None:
            return loader
        from dvis_plus_tpu.data.build import build_test_loader

        return build_test_loader(
            cfg, dataset_name, dataset_type=dataset_type, shard=(i, n)
        )

    if task in ("vos", "mots"):
        from dvis_plus_tpu.engine.daq_inference import run_daq_inference
        from dvis_plus_tpu.evaluation.evaluators import UniYTVISEvaluator

        # MOTS rides the YTVIS-format rows (reference UniYTVISEvaluator)
        evaluator = UniYTVISEvaluator(
            dataset_name, out_dir,
            contiguous_to_dataset_id={
                v: k
                for k, v in getattr(md, "thing_dataset_id_to_contiguous_id", {}).items()
            },
            gt_json=getattr(md, "json_file", None),
        )
        run_device_parallel(
            cfg,
            lambda p, ld, ev: run_daq_inference(cfg, model, p, ld, ev),
            make_loader, evaluator, params,
        )
        return evaluator.evaluate() if task != "vos" else {"task": "vos"}
    if task == "vps" or dataset_type == "video_panoptic":
        from dvis_plus_tpu.engine.inference import run_vps_inference
        from dvis_plus_tpu.evaluation.evaluators import VPSEvaluator

        from dvis_plus_tpu.data.datasets.vps_vss import panoptic_contiguous_maps

        cats = getattr(md, "categories", None) or []
        if cats:
            _, contig_to_dataset, n_thing = panoptic_contiguous_maps(cats)
        else:
            contig_to_dataset, n_thing = {}, 58  # VIPSeg things
        evaluator = VPSEvaluator(
            dataset_name, out_dir, contiguous_to_dataset_id=contig_to_dataset,
            gt_json=getattr(md, "json_file", None),
            gt_dir=getattr(md, "gt_dir", None),
        )
        run_device_parallel(
            cfg,
            lambda p, ld, ev: run_vps_inference(cfg, model, p, ld, ev, n_thing),
            make_loader, evaluator, params,
        )
        return evaluator.evaluate()
    if task == "vss" or dataset_type == "video_semantic":
        from dvis_plus_tpu.engine.inference import run_vss_inference
        from dvis_plus_tpu.evaluation.evaluators import VSSEvaluator

        evaluator = VSSEvaluator(
            dataset_name, out_dir,
            gt_root=getattr(md, "gt_root", None),
            split=getattr(md, "split", "val"),
            num_classes=getattr(md, "num_classes", cfg.model.num_classes),
        )
        run_device_parallel(
            cfg,
            lambda p, ld, ev: run_vss_inference(cfg, model, p, ld, ev),
            make_loader, evaluator, params,
        )
        return evaluator.evaluate()

    from dvis_plus_tpu.engine.inference import run_vis_inference
    from dvis_plus_tpu.evaluation.evaluators import YTVISEvaluator

    evaluator = YTVISEvaluator(
        dataset_name, out_dir,
        contiguous_to_dataset_id={
            v: k
            for k, v in getattr(md, "thing_dataset_id_to_contiguous_id", {}).items()
        },
        gt_json=getattr(md, "json_file", None),
    )
    run_device_parallel(
        cfg,
        lambda p, ld, ev: run_vis_inference(cfg, model, p, ld, ev),
        make_loader, evaluator, params,
    )
    return evaluator.evaluate()


def main():
    from dvis_plus_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default=None)
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from dvis_plus_tpu.core.config import load_config, save_config

    cfg = load_config(args.config_file, args.opts)
    os.makedirs(cfg.output_dir, exist_ok=True)
    from dvis_plus_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache(cfg.compile_cache_dir)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s: %(message)s"
    )
    save_config(cfg, os.path.join(cfg.output_dir, "config.yaml"))

    if args.eval_only:
        do_eval(cfg, args)
    else:
        do_train(cfg, args)


if __name__ == "__main__":
    main()
