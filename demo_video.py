"""Video segmentation demo: run a trained model on a folder of frames and
write color-overlaid visualizations.

Re-designs reference ``DVIS_Plus/demo_video/demo.py`` and
``demo_long_video.py`` (and the OV variant's ``--thing_classes/--stuff_classes``
custom vocabulary): frames stream through the model in windows with the
tracker carry kept alive (the ``keep=True`` protocol,
``demo_long_video.py:120-126``), so arbitrarily long videos run in constant
memory.

  python demo_video.py --config-file cfg.yaml --input frames_dir \
      --output out_dir [--windows-size 10] [--confidence-threshold 0.3] \
      [--vocabulary "cat,dog"]            # OV models: custom class list
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def color_for(i: int) -> np.ndarray:
    rng = np.random.RandomState(i * 7919 + 13)
    return rng.randint(64, 255, (3,), dtype=np.int32)


def visualize(frame_rgb, masks, scores, labels, ids, class_names, thr):
    import cv2

    vis = frame_rgb.astype(np.float32)
    texts = []
    for m, s, l, i in zip(masks, scores, labels, ids):
        if s < thr:
            continue
        color = color_for(int(i)).astype(np.float32)
        vis = np.where(m[..., None], 0.55 * vis + 0.45 * color, vis)
        ys, xs = np.nonzero(m)
        if len(ys):
            name = class_names[l] if l < len(class_names) else str(l)
            texts.append((f"{name} {s:.2f}", (int(xs.min()), max(int(ys.min()) - 4, 10)),
                          tuple(int(c) for c in color)))
    vis = vis.astype(np.uint8)  # cv2.putText requires uint8
    for txt, org, color in texts:
        cv2.putText(vis, txt, org, cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return vis


def main():
    from dvis_plus_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--input", required=True, help="directory of frames")
    parser.add_argument("--output", required=True)
    parser.add_argument("--windows-size", type=int, default=None)
    parser.add_argument("--chunk-size", type=int, default=0,
                        help="long-video mode: frames per host chunk; the tracker "
                             "carry persists across chunks (reference "
                             "demo_long_video.py keep=True protocol) so memory "
                             "stays constant in video length")
    parser.add_argument("--confidence-threshold", type=float, default=0.3)
    parser.add_argument("--vocabulary", default=None, help="OV: comma-separated classes")
    parser.add_argument("--thing-classes", default=None,
                        help="OV: comma-separated custom thing classes (reference demo_video/open_vocabulary/demo.py --thing_classes)")
    parser.add_argument("--stuff-classes", default=None, help="OV: custom stuff classes")
    parser.add_argument("--merge", action="store_true",
                        help="OV: merge the custom vocabulary with the config dataset's")
    parser.add_argument("--clip-weights", default=os.environ.get("DVIS_CLIP_WEIGHTS", ""))
    parser.add_argument("--bpe", default=os.environ.get("DVIS_CLIP_BPE", ""))
    parser.add_argument("--random-text", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.core.config import load_config
    from dvis_plus_tpu.core import checkpoint as ckpt
    from dvis_plus_tpu.utils.jax_cache import enable_persistent_compilation_cache

    from dvis_plus_tpu.data.catalog import get_metadata, is_registered
    from dvis_plus_tpu.data.mapper import YTVISDatasetMapper
    from dvis_plus_tpu.engine.inference import _online_video, _minvis_video
    from dvis_plus_tpu.models.meta.minvis import inference_video
    from train_net_video import build_model, init_params

    cfg = load_config(args.config_file, args.opts)
    enable_persistent_compilation_cache(cfg.compile_cache_dir)
    if args.windows_size:
        cfg.test.window_size = args.windows_size

    ov_mode = cfg.model.ov.enabled or args.thing_classes or args.stuff_classes
    if ov_mode:
        # custom-vocabulary OV demo (reference demo_video/open_vocabulary/
        # demo.py --thing_classes/--stuff_classes/--merge): the text
        # classifier is built from the user-supplied class list
        from train_net_video_ov import (
            _ov_arch, build_ov_model, build_classifier, make_text_encoder,
            vocabulary_for,
        )

        cfg.model.ov.enabled = True
        cfg.model.meta_architecture = _ov_arch(cfg)
        model = build_ov_model(cfg)
        encode_fn = make_text_encoder(cfg, args)
        classes = []
        if args.merge or not (args.thing_classes or args.stuff_classes):
            try:
                classes = list(vocabulary_for(cfg.datasets.test[0]))
            except Exception:
                classes = []
        for arg in (args.thing_classes, args.stuff_classes):
            if arg:
                classes += [[c.strip()] for c in arg.split(",") if c.strip()]
        assert classes, "OV demo needs --thing-classes/--stuff-classes or a registered dataset vocabulary"
        from dvis_plus_tpu.models.ov.text import TextClassifierCache

        tc, nt = TextClassifierCache(encode_fn).get("demo", classes)
        T = cfg.test.window_size
        div = cfg.model.size_divisibility
        Hd = ((cfg.input.min_size_test + div - 1) // div) * div
        Wd = ((cfg.input.max_size_test + div - 1) // div) * div
        shape = (T, Hd, Wd, 3) if cfg.model.meta_architecture == "minvis_ov" else (1, T, Hd, Wd, 3)
        params = jax.jit(
            lambda r, i: model.init(r, i, jnp.asarray(tc), tuple(nt))
        )(jax.random.key(0), jnp.zeros(shape, jnp.float32))
        if cfg.weights:
            params = ckpt.load_weights(cfg.weights, params, cfg=cfg)
    else:
        model = build_model(cfg)
        params = init_params(cfg, model, jax.random.key(0))
        if cfg.weights:
            params = ckpt.load_weights(cfg.weights, params, cfg=cfg)

    frame_files = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if f.lower().endswith((".jpg", ".png", ".jpeg"))
    )
    assert frame_files, f"no frames in {args.input}"
    first = cv2.imread(frame_files[0])
    H0, W0 = first.shape[:2]

    record = {
        "file_names": frame_files,
        "height": H0,
        "width": W0,
        "length": len(frame_files),
        "video_id": 0,
    }
    mapper = YTVISDatasetMapper(cfg, is_train=False)

    arch = cfg.model.meta_architecture
    if args.chunk_size and arch in ("dvis_online", "dvis_online_ov") and not ov_mode:
        # long-video streaming: chunks of frames, tracker carry kept alive
        # (reference demo_long_video.py:120-126 keep protocol)
        from dvis_plus_tpu.engine.inference import _pad_to
        from dvis_plus_tpu.models.tracker.referring_tracker import init_tracker_state
        import jax as _jax

        W_sz = cfg.test.window_size
        td = cfg.model.transformer_decoder
        C2 = td.hidden_dim * (2 if td.reid_branch else 1)
        state = init_tracker_state(
            1, td.num_queries, C2, jnp.dtype(cfg.model.compute_dtype)
        )

        @_jax.jit
        def win(params, imgs, state):
            seg_out, track_out, new_state = model.apply(params, imgs[None], state=state)
            return (
                track_out["pred_logits"][0],
                track_out["pred_masks"][0],
                new_state,
            )

        t0 = time.time()
        os.makedirs(args.output, exist_ok=True)
        chunk = max(args.chunk_size, W_sz)
        names = None
        for ds in cfg.datasets.test:
            if is_registered(ds):
                names = get_metadata(ds).thing_classes
                break
        if args.vocabulary:
            names = [c.strip() for c in args.vocabulary.split(",")]
        names = names or [str(i) for i in range(cfg.model.num_classes)]
        total = 0
        for start in range(0, len(frame_files), chunk):
            sub = dict(record, file_names=frame_files[start : start + chunk],
                       length=len(frame_files[start : start + chunk]))
            sample = mapper(sub, seed=0)
            images = sample["images"]
            Tc = images.shape[0]
            n_w = (Tc + W_sz - 1) // W_sz
            padded = _pad_to(images, n_w * W_sz)
            lg_l, mk_l = [], []
            for i in range(n_w):
                lg, mk, state = win(params, jnp.asarray(padded[i * W_sz : (i + 1) * W_sz]), state)
                lg_l.append(lg)
                mk_l.append(mk)
            logits = jnp.concatenate(lg_l, 0)[:Tc].mean(axis=0)
            masks = jnp.concatenate(mk_l, 1)[:, :Tc]
            h, w = [int(v) for v in sample["image_size"]]
            res = inference_video(
                logits, masks, img_size=(h, w), output_size=(H0, W0),
                padded_size=images.shape[1:3], topk=cfg.test.max_num,
            )
            scores = np.asarray(res.scores)
            labels = np.asarray(res.labels)
            out_masks = np.asarray(res.masks)
            for t in range(Tc):
                path = frame_files[start + t]
                frame = cv2.imread(path)[:, :, ::-1]
                vis = visualize(frame, out_masks[:, t], scores, labels,
                                np.arange(len(scores)), names, args.confidence_threshold)
                cv2.imwrite(os.path.join(args.output, os.path.basename(path)), vis[:, :, ::-1])
            total += Tc
        dt = time.time() - t0
        print(f"{total} frames in {dt:.1f}s ({total/dt:.2f} fps), chunked x{chunk} with carry")
        return

    sample = mapper(record, seed=0)
    images = sample["images"]

    t0 = time.time()
    fns = {}
    if ov_mode:
        from dvis_plus_tpu.engine.ov_inference import (
            _minvis_ov_video, _online_ov_video, _offline_ov_video,
        )

        overlap = np.ones((len(nt) - 1,), np.float32)
        ov_args = (jnp.asarray(tc), tuple(nt), jnp.asarray(overlap),
                   cfg.model.ov.geometric_ensemble_alpha,
                   cfg.model.ov.geometric_ensemble_beta)
        arch = cfg.model.meta_architecture
        aux = None  # OV archs pass no aux logits (meta_architecture_ov.py:1344, :2148)
        if arch == "minvis_ov":
            logits, masks = _minvis_ov_video(cfg, model, params, images, fns, cfg.test.window_size, *ov_args)
        elif arch == "dvis_online_ov":
            logits, masks = _online_ov_video(cfg, model, params, images, fns, cfg.test.window_size, *ov_args)
        else:
            logits, masks = _offline_ov_video(cfg, model, params, images, fns, cfg.test.window_size, *ov_args)
    elif cfg.model.meta_architecture in ("minvis", "ctvis"):
        logits, masks, aux = _minvis_video(cfg, model, params, images, fns, cfg.test.window_size)
    else:
        logits, masks, aux = _online_video(cfg, model, params, images, fns, cfg.test.window_size)

    h, w = [int(v) for v in sample["image_size"]]
    res = inference_video(
        logits, masks[:, : len(frame_files)],
        img_size=(h, w), output_size=(H0, W0),
        padded_size=images.shape[1:3], topk=cfg.test.max_num,
        aux_pred_cls=aux,
    )
    dt = time.time() - t0
    print(f"{len(frame_files)} frames in {dt:.1f}s ({len(frame_files)/dt:.2f} fps)")

    names = None
    for ds in cfg.datasets.test:
        if is_registered(ds):
            names = get_metadata(ds).thing_classes
            break
    if args.vocabulary:
        names = [c.strip() for c in args.vocabulary.split(",")]
    if ov_mode:
        names = [syns[0] for syns in classes]
    names = names or [str(i) for i in range(cfg.model.num_classes)]

    os.makedirs(args.output, exist_ok=True)
    scores = np.asarray(res.scores)
    labels = np.asarray(res.labels)
    out_masks = np.asarray(res.masks)
    for t, path in enumerate(frame_files):
        frame = cv2.imread(path)[:, :, ::-1]
        vis = visualize(
            frame, out_masks[:, t], scores, labels, np.arange(len(scores)),
            names, args.confidence_threshold,
        )
        cv2.imwrite(os.path.join(args.output, os.path.basename(path)), vis[:, :, ::-1])
    print(f"wrote {len(frame_files)} visualizations to {args.output}")


if __name__ == "__main__":
    main()
