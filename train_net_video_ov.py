"""Train / eval CLI for OV-DVIS++ (open vocabulary).

Re-designs reference ``DVIS_Plus/train_net_video_ov.py`` (333 LoC, the same
Trainer pattern as train_net_video.py with ``add_ov_dvis_config``): an
explicit JAX train loop plus an OV eval loop with the geometric-ensemble
inference driver. Text classifiers are built host-side once per dataset from
the prompt-engineered vocabulary files
(``dvis_plus_tpu/data/ov_vocab/*_with_prompt_eng.txt``, mirrored from
reference ``ov_dvis/data_video/datasets/ov_datasets``) through the converted
open_clip text tower, then passed into the jitted step as arrays.

Weights: ``--clip-weights`` points at an open_clip checkpoint (.pth state
dict or .npz); ``--bpe`` at the public CLIP bpe_simple_vocab_16e6.txt.gz.
Without them the CLI FAILS rather than silently using random classifiers;
``--random-text`` opts into the debug fallback explicitly.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

logger = logging.getLogger("dvis_plus_tpu.ov")

_VOCAB_BY_DATASET = {
    # dataset-name prefix -> shipped prompt-engineered vocabulary file
    "ytvis_2019": "ytvis19_instance_with_prompt_eng.txt",
    "ytvis_2021": "ytvis21_instance_with_prompt_eng.txt",
    "ytvis_2022": "ytvis21_instance_with_prompt_eng.txt",
    "ovis": "ovis_instance_with_prompt_eng.txt",
    "coco": "coco_panoptic_with_prompt_eng.txt",
    "panoVSPW": "vipseg_panoptic_with_prompt_eng.txt",
    # VSPW semantic shares VIPSeg's 124-class taxonomy (reference vss_ov.py
    # builds its categories from the same list); file row i = shifted
    # dataset id i, which IS our VSS class space (no things-first reorder)
    "VSPW": "vipseg_panoptic_with_prompt_eng.txt",
    "lvvis": "lsvis_instance_with_prompt_eng.txt",
}


def _ov_arch(cfg) -> str:
    arch = cfg.model.meta_architecture
    if cfg.model.ov.enabled and not arch.endswith("_ov") and arch not in ("ctvis",):
        arch = {"minvis": "minvis_ov", "dvis_online": "dvis_online_ov",
                "dvis_offline": "dvis_offline_ov"}.get(arch, arch)
    return arch


def build_ov_model(cfg):
    from dvis_plus_tpu.models.meta.ov import DVISOnlineOV, DVISOfflineOV, OVSegmenter

    arch = _ov_arch(cfg)
    if arch in ("minvis_ov", "ctvis"):
        return OVSegmenter(cfg.model)
    if arch == "dvis_online_ov":
        return DVISOnlineOV(cfg.model)
    if arch == "dvis_offline_ov":
        return DVISOfflineOV(cfg.model)
    raise ValueError(arch)


def _maybe_things_first(dataset_name: str, classes):
    """For panoptic (vps) datasets the OV class space is things-first, like
    the training mapper's contiguous ids and the reference's ``classes_ov``
    (vps_ov.py: ``thing_classes_ov + stuff_classes_ov``) — the panoptic
    top-K decides thing-vs-stuff by ``class < num_things``. Vocabulary file
    rows are keyed by dataset id; reorder via the registered categories."""
    from dvis_plus_tpu.data.catalog import get_metadata
    from dvis_plus_tpu.data.datasets.vps_vss import panoptic_contiguous_maps

    try:
        md = get_metadata(dataset_name)
    except KeyError:
        return classes
    cats = getattr(md, "categories", None)
    if getattr(md, "evaluator_type", "") != "vps" or not cats:
        return classes
    _, contig_to_dataset, _ = panoptic_contiguous_maps(cats)
    if len(cats) == len(classes) and {c["id"] for c in cats} == set(range(len(classes))):
        return [classes[contig_to_dataset[i]] for i in range(len(classes))]
    # registered categories disagree with the shipped vocabulary (e.g. a
    # reduced synthetic GT): the GT json defines the eval class space —
    # build things-first synonym lists from the category names instead
    by_id = {c["id"]: c for c in cats}
    return [[by_id[contig_to_dataset[i]]["name"]] for i in range(len(cats))]


def vocabulary_for(dataset_name: str):
    """Prompt-engineered synonym lists for a dataset (reference
    ov_datasets/*_with_prompt_eng.txt); falls back to catalog class names."""
    from dvis_plus_tpu.models.ov.text import load_vocabulary_file

    vocab_dir = os.environ.get(
        "DVIS_OV_VOCAB",
        os.path.join(os.path.dirname(__file__), "dvis_plus_tpu", "data", "ov_vocab"),
    )
    for prefix, fname in _VOCAB_BY_DATASET.items():
        if dataset_name.startswith(prefix):
            path = os.path.join(vocab_dir, fname)
            if os.path.exists(path):
                classes = load_vocabulary_file(path)
                # drop the invalid_class_id row if present
                if classes and classes[0] and classes[0][0] == "invalid_class_id":
                    classes = classes[1:]
                return _maybe_things_first(dataset_name, classes)
    from dvis_plus_tpu.data.catalog import get_metadata

    md = get_metadata(dataset_name)
    names = list(getattr(md, "thing_classes", []) or []) + list(
        getattr(md, "stuff_classes", []) or []
    )
    if not names:
        raise ValueError(f"no vocabulary available for {dataset_name}")
    return [[n] for n in names]


def make_text_encoder(cfg, args):
    """Returns encode_fn(prompts) -> (N, Cc) numpy embeddings."""
    if args.random_text:
        logger.warning(
            "--random-text: classifiers are random hashes; quality is meaningless"
        )

        def encode_fn(prompts):
            rng = np.random.RandomState(abs(hash(tuple(prompts))) % 2**31)
            return rng.randn(len(prompts), cfg.model.ov.clip_embed_dim).astype(
                np.float32
            )

        return encode_fn

    if not args.clip_weights or not args.bpe:
        raise SystemExit(
            "OV requires --clip-weights <open_clip checkpoint> and --bpe "
            "<bpe_simple_vocab_16e6.txt.gz> (or pass --random-text for a "
            "debug run with meaningless classifiers)"
        )
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.core.checkpoint import load_torch_state_dict
    from dvis_plus_tpu.models.ov.clip_backbone import (
        CLIPTextEncoder,
        convert_open_clip_text,
    )
    from dvis_plus_tpu.models.ov.text import SimpleTokenizer

    sd = load_torch_state_dict(args.clip_weights)
    layers = len(
        {k.split(".resblocks.")[1].split(".")[0] for k in sd if ".resblocks." in k}
    )
    width = np.asarray(
        sd.get("positional_embedding", sd.get("text.positional_embedding"))
    ).shape[1]
    heads = width // 64
    enc = CLIPTextEncoder(
        width=width, heads=heads, layers=layers,
        embed_dim=cfg.model.ov.clip_embed_dim,
    )
    params = {"params": convert_open_clip_text(sd, layers=layers, heads=heads)}
    tokenizer = SimpleTokenizer(args.bpe)
    apply = jax.jit(enc.apply)

    def encode_fn(prompts):
        tokens = jnp.asarray(tokenizer.tokenize(prompts))
        return np.asarray(apply(params, tokens))

    return encode_fn


def void_index_for(cfg, dataset_name):
    """Which private void row a dataset uses (reference
    ``get_text_classifier_with_void``: train dataset i -> row i; at eval the
    ``test2train`` mapping picks the source dataset's row; otherwise None ->
    the merged/detached void row per ``ov.void_merge_mode``)."""
    train = list(cfg.datasets.train)
    if dataset_name in train:
        return train.index(dataset_name)
    t2t = cfg.model.ov.test2train
    if t2t and t2t in train:
        return train.index(t2t)
    return None


def build_classifier(cfg, dataset_name, encode_fn, void_embeds=None, void_index=None):
    from dvis_plus_tpu.models.ov.text import TextClassifierCache

    classes = vocabulary_for(dataset_name)
    # void rows are LEARNED model params appended in-graph (full_classifier);
    # num_templates ends with the count of rows full_classifier appends:
    # exactly 1 (private row i, or the merged row) unless merge mode 'max'
    # keeps every row as one max-ensembled group (reference :213-228)
    if void_index is not None or cfg.model.ov.void_merge_mode != "max":
        void_rows = 1
    else:
        void_rows = cfg.model.ov.num_void_embeddings
    cache = TextClassifierCache(encode_fn, num_void=void_rows)
    tc, nt = cache.get(dataset_name, classes, void_embeds)
    return tc, nt, classes


def do_train(cfg, args, encode_fn):
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.core import checkpoint as ckpt
    from dvis_plus_tpu.data.build import build_combined_train_loader
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.losses.targets import VideoTargets
    from dvis_plus_tpu.parallel.mesh import build_mesh, shard_batch
    from dvis_plus_tpu.utils.events import EventWriter
    from train_net_video import register_all_datasets

    register_all_datasets()
    cfg.model.meta_architecture = _ov_arch(cfg)
    model = build_ov_model(cfg)
    # one classifier per TRAINING dataset: the reference keys the text
    # classifier off each batch's source dataset (`name` field,
    # meta_architecture_ov.py:525-540) so the supervised mixture recipes
    # (COCO-panoptic + ytvis19/21 + ovis + VIPSeg) train each batch against
    # its own vocabulary — and dataset i trains its own PRIVATE void row i
    # (get_text_classifier_with_void :205-211). Each classifier gets its own
    # jitted step closure sharing one TrainState.
    classifiers = [
        build_classifier(cfg, name, encode_fn, void_index=i)[:2]
        for i, name in enumerate(cfg.datasets.train)
    ]
    tc, nt = classifiers[0]

    T = cfg.input.sampling_frame_num
    div = cfg.model.size_divisibility
    H = ((max(cfg.input.min_size_train) + div - 1) // div) * div
    W = ((cfg.input.max_size_train + div - 1) // div) * div
    arch = cfg.model.meta_architecture
    if arch == "minvis_ov":
        images = jnp.zeros((T, H, W, 3), jnp.float32)
    else:
        images = jnp.zeros((1, T, H, W, 3), jnp.float32)
    params = jax.jit(
        lambda r, i: model.init(r, i, jnp.asarray(tc), tuple(nt))
    )(jax.random.key(cfg.seed), images)
    if cfg.weights:
        params = ckpt.load_weights(cfg.weights, params, cfg=cfg)

    steps = []
    init_state = None
    for i, (tc_i, nt_i) in enumerate(classifiers):
        step_i, init_i = build_train_step(
            cfg, model, text_classifier=tc_i, num_templates=nt_i, void_index=i
        )
        steps.append(step_i)
        init_state = init_state or init_i
    state = init_state(params)
    mesh = build_mesh(model_parallel_size=cfg.parallel.model_parallel_size)
    loader = build_combined_train_loader(cfg, seed=cfg.seed)
    writer = EventWriter(cfg.output_dir)
    rng = jax.random.key(cfg.seed)
    ckpt_dir = os.path.join(cfg.output_dir, "checkpoints")
    for step in range(int(state.step), cfg.solver.max_iter):
        raw = next(loader)
        batch = Batch(
            images=raw["images"],
            targets=VideoTargets(
                labels=raw["labels"], masks=raw["masks"],
                valid=raw["valid"], frame_valid=raw["frame_valid"],
            ),
        )
        batch = shard_batch(batch, mesh)
        state, metrics = steps[raw.get("dataset_index", 0)](state, batch, rng)
        if step % 20 == 0:
            writer.write(step, {k: float(v) for k, v in metrics.items()})
            writer.log_console(step)
        if (step + 1) % cfg.solver.checkpoint_period == 0 or step + 1 == cfg.solver.max_iter:
            path = os.path.join(ckpt_dir, f"step_{step + 1:07d}")
            ckpt.save(path, jax.device_get(state))
            logger.info("saved %s", path)
    return state


def do_eval(cfg, args, encode_fn):
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.core import checkpoint as ckpt
    from dvis_plus_tpu.data.build import build_test_loader
    from dvis_plus_tpu.data.catalog import get_metadata
    from dvis_plus_tpu.engine.ov_inference import run_ov_inference
    from dvis_plus_tpu.evaluation.evaluators import YTVISEvaluator
    from dvis_plus_tpu.models.ov.text import category_overlapping_mask
    from train_net_video import register_all_datasets

    register_all_datasets()
    cfg.model.meta_architecture = _ov_arch(cfg)
    model = build_ov_model(cfg)

    # the seen/unseen split is computed against the UNION of all training
    # datasets' vocabularies (reference prepare_class_names_from_metadata
    # called with all_train_metadatas, meta_architecture_ov.py:172-174) —
    # a class seen in ANY training dataset ensembles with alpha, not beta
    train_classes = []
    for name in cfg.datasets.train:
        train_classes += vocabulary_for(name)

    results = {}
    params = None
    for dataset_name in cfg.datasets.test:
        # which private void row this dataset evaluates with (test2train /
        # exact-name match; else the merged 'coco' row)
        vi = void_index_for(cfg, dataset_name)
        tc, nt, test_classes = build_classifier(
            cfg, dataset_name, encode_fn, void_index=vi
        )
        overlap = category_overlapping_mask(train_classes, test_classes)
        if params is None:
            T = cfg.test.window_size
            H = ((cfg.input.min_size_test + 31) // 32) * 32
            W = ((cfg.input.max_size_test + 31) // 32) * 32
            arch = cfg.model.meta_architecture
            shape = (T, H, W, 3) if arch == "minvis_ov" else (1, T, H, W, 3)
            params = jax.jit(
                lambda r, i: model.init(r, i, jnp.asarray(tc), tuple(nt))
            )(jax.random.key(0), jnp.zeros(shape, jnp.float32))
            if cfg.weights:
                params = ckpt.load_weights(cfg.weights, params, cfg=cfg)
        md = get_metadata(dataset_name)
        out_dir = os.path.join(cfg.output_dir, "inference", dataset_name)
        task = cfg.test.task or getattr(md, "evaluator_type", "vis")
        from dvis_plus_tpu.engine.ov_inference import ov_video_logits_masks_fn
        from dvis_plus_tpu.engine.parallel_eval import run_device_parallel

        if task == "vps":
            # OV panoptic: ensembled logits through the shared panoptic
            # top-K (reference OV inference_video_vps :845-918)
            from dvis_plus_tpu.data.datasets.vps_vss import panoptic_contiguous_maps
            from dvis_plus_tpu.engine.inference import run_vps_inference
            from dvis_plus_tpu.evaluation.evaluators import VPSEvaluator

            cats = getattr(md, "categories", None) or []
            if cats:
                _, contig_to_dataset, n_thing = panoptic_contiguous_maps(cats)
            else:
                contig_to_dataset, n_thing = {}, 58
            evaluator = VPSEvaluator(
                dataset_name, out_dir, contiguous_to_dataset_id=contig_to_dataset,
                gt_json=getattr(md, "json_file", None),
                gt_dir=getattr(md, "gt_dir", None),
            )

            def runner(p, ld, ev):
                fn = ov_video_logits_masks_fn(
                    cfg, model, p, tc, nt, overlap, void_index=vi
                )
                run_vps_inference(cfg, model, p, ld, ev, n_thing, logits_masks_fn=fn)

        elif task == "vss":
            from dvis_plus_tpu.engine.inference import run_vss_inference
            from dvis_plus_tpu.evaluation.evaluators import VSSEvaluator

            evaluator = VSSEvaluator(
                dataset_name, out_dir,
                gt_root=getattr(md, "gt_root", None),
                split=getattr(md, "split", "val"),
                num_classes=getattr(md, "num_classes", cfg.model.num_classes),
            )

            def runner(p, ld, ev):
                fn = ov_video_logits_masks_fn(
                    cfg, model, p, tc, nt, overlap, void_index=vi
                )
                run_vss_inference(cfg, model, p, ld, ev, logits_masks_fn=fn)

        else:
            evaluator = YTVISEvaluator(
                dataset_name,
                out_dir,
                contiguous_to_dataset_id={
                    v: k
                    for k, v in getattr(md, "thing_dataset_id_to_contiguous_id", {}).items()
                },
                gt_json=getattr(md, "json_file", None),
            )

            def runner(p, ld, ev):
                run_ov_inference(
                    cfg, model, p, ld, ev, tc, nt, overlap, void_index=vi
                )

        run_device_parallel(
            cfg,
            runner,
            lambda i, n: build_test_loader(
                cfg, dataset_name, shard=(i, n) if n > 1 else None
            ),
            evaluator,
            params,
        )
        results[dataset_name] = evaluator.evaluate()
        logger.info("%s: %s", dataset_name, results[dataset_name])
    print(json.dumps(results, indent=2))
    return results


def main():
    from dvis_plus_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--clip-weights", default=os.environ.get("DVIS_CLIP_WEIGHTS", ""))
    parser.add_argument("--bpe", default=os.environ.get("DVIS_CLIP_BPE", ""))
    parser.add_argument("--random-text", action="store_true",
                        help="debug: random text classifiers (meaningless quality)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from dvis_plus_tpu.core.config import load_config, save_config

    cfg = load_config(args.config_file, args.opts)
    cfg.model.ov.enabled = True
    from dvis_plus_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache(cfg.compile_cache_dir)
    os.makedirs(cfg.output_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
    save_config(cfg, os.path.join(cfg.output_dir, "config.yaml"))

    encode_fn = make_text_encoder(cfg, args)
    if args.eval_only:
        do_eval(cfg, args, encode_fn)
    else:
        do_train(cfg, args, encode_fn)


if __name__ == "__main__":
    main()
