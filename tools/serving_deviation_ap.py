"""Measure the AP cost of each documented serving deviation (VERDICT r3 #3).

The reference serves exactly what it trains: fp32 deformable-attention
values inside an autocast-disabled island (mask2former/modeling/pixel_decoder/
msdeformattn.py:314) and scipy linear_sum_assignment for MinVIS frame
alignment. Our serving defaults deviate for TPU speed (bf16 compute, bf16
deformable values, auction LAP) with parity knobs to flip back. Real zoo
weights are env-blocked, so this harness produces the only within-env AP
evidence: overfit the staged DVIS++ recipe (segmenter -> online tracker ->
offline refiner) on the synthetic video set with PARITY settings, then score
the SAME weights under each serving knob and report the AP delta per knob.

Run (any backend; the PARITY.md table is from the real v5e chip):
    python tools/serving_deviation_ap.py [--steps-scale 1.0]

Prints one markdown table (for PARITY.md) plus a JSON line. The fast
assertions live in tests/test_serving_deviation_ap.py, which reuses
``measure()`` at reduced step counts.
"""
from __future__ import annotations

import copy
import json
import tempfile


def _variants(base_platform_tpu: bool):
    """(name, {cfg-dot-path: value}) per deviation knob; 'serving' = all."""
    v = [
        ("parity", {}),
        ("bf16_compute", {"model.compute_dtype": "bfloat16"}),
        ("bf16_msdeform_values",
         {"model.pixel_decoder.msdeform_value_dtype": "bfloat16"}),
        ("auction_matcher", {"model.tracker.matcher_solver": "auction"}),
        ("serving_defaults", {
            "model.compute_dtype": "bfloat16",
            "model.pixel_decoder.msdeform_value_dtype": "bfloat16",
            "model.tracker.matcher_solver": "auction",
        }),
    ]
    if base_platform_tpu:
        # opt-in Pallas local-window deformable kernel (offset clamp +-8 px)
        # only compiles on real TPU
        v.insert(4, ("pallas_local_msdeform",
                     {"model.pixel_decoder.msdeform_impl": "pallas_local"}))
    return v


def _swin_variants(base_platform_tpu: bool):
    """Swin serving knobs (VERDICT r4 next #3 — the headline bench serves
    ``swin_fast_softmax=True``). ``fast_softmax`` only engages when the
    compute dtype is bf16 (swin.py: q.dtype check), so each knob row is
    measured on top of bf16 compute and bf16_compute itself is the
    reference point for isolating the attention-score deviation."""
    v = [
        ("parity", {}),
        ("bf16_compute", {"model.compute_dtype": "bfloat16"}),
        ("swin_fast_softmax", {
            "model.compute_dtype": "bfloat16",
            "model.backbone.swin_fast_softmax": True,
        }),
    ]
    if base_platform_tpu:
        # fused Pallas window attention (fp32 softmax in VMEM) compiles on
        # real TPU only
        v.append(("swin_fused_attn", {
            "model.compute_dtype": "bfloat16",
            "model.backbone.swin_fused_attn": True,
        }))
    return v


def measure_swin(out_dir: str, steps_scale: float = 1.0, seed: int = 0) -> dict:
    """Overfit a Swin-backbone MinVIS segmenter at parity settings, then
    score the SAME weights under each Swin serving knob.

    Returns {"swin": {variant: AP}, "platform": ...}. Swin-T-proportioned
    dims scaled to the synthetic set; the knobs under test
    (fast_softmax bf16 scores, fused Pallas window attention) are the exact
    code paths the Swin-L headline bench serves (bench.py swinl_offline)."""
    import copy as _copy

    import jax

    from tests.test_overfit_families import eval_ap, tiny_cfg, train
    from train_net_video import build_model, init_params

    platform = jax.devices()[0].platform
    is_tpu = platform == "tpu"

    def scaled(n):
        return max(20, int(n * steps_scale))

    cfg = tiny_cfg("minvis")
    cfg.model.backbone.name = "swin_t"
    cfg.model.backbone.swin_embed_dim = 32
    cfg.model.backbone.swin_depths = (1, 1, 2, 1)
    cfg.model.backbone.swin_num_heads = (2, 4, 8, 16)
    cfg.model.backbone.swin_window_size = 4
    cfg.model.backbone.swin_drop_path_rate = 0.0
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(seed))
    params, _ = train(cfg, model, params, scaled(150), seed=seed)

    import pathlib

    out = pathlib.Path(out_dir)
    results: dict = {"platform": platform, "swin": {}}
    for name, knobs in _swin_variants(is_tpu):
        cfg_v = _copy.deepcopy(cfg)
        for path, value in knobs.items():
            _set_path(cfg_v, path, value)
        model_v = build_model(cfg_v)
        ap = eval_ap(cfg_v, model_v, params, out, f"swin_{name}")
        results["swin"][name] = round(float(ap), 4)
    return results


def _vit_variants():
    """ViT-Adapter serving knobs: blockwise flash trunk attention (bitexact
    dense fallback on CPU, bf16-blockwise on TPU — the vitl bench serves it)
    and the coarse stride-8 extractor (2x-pooled queries + bilinear residual
    upsample; an approximation, so its AP row is the evidence gate for ever
    serving it)."""
    return [
        ("parity", {}),
        ("bf16_compute", {"model.compute_dtype": "bfloat16"}),
        ("vit_flash_attention", {
            "model.compute_dtype": "bfloat16",
            "model.backbone.vit_flash_attention": True,
        }),
        ("vit_extractor_coarse", {
            "model.compute_dtype": "bfloat16",
            "model.backbone.vit_extractor_coarse": True,
        }),
        ("vit_serving", {
            "model.compute_dtype": "bfloat16",
            "model.backbone.vit_flash_attention": True,
            "model.backbone.vit_extractor_coarse": True,
        }),
    ]


def measure_vit(out_dir: str, steps_scale: float = 1.0, seed: int = 0) -> dict:
    """Overfit a ViT-Adapter-backbone MinVIS segmenter at parity settings
    (fp32, dense trunk attention, exact extractor), then score the SAME
    weights under each ViT serving knob. ViT-L-proportioned structure at tiny
    dims (frozen random trunk + trainable adapter, 2 interactions + the extra
    extractors — the exact code paths the vitl bench serves)."""
    import copy as _copy

    import jax

    from tests.test_overfit_families import eval_ap, tiny_cfg, train
    from train_net_video import build_model, init_params

    platform = jax.devices()[0].platform

    def scaled(n):
        return max(20, int(n * steps_scale))

    cfg = tiny_cfg("minvis")
    cfg.model.backbone.name = "vit_adapter_dinov2"
    cfg.model.backbone.vit_embed_dim = 32
    cfg.model.backbone.vit_depth = 2
    cfg.model.backbone.vit_num_heads = 2
    cfg.model.backbone.vit_interaction_indexes = ((0, 0), (1, 1))
    cfg.model.backbone.vit_conv_inplane = 8
    cfg.model.backbone.vit_deform_num_heads = 2
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(seed))
    params, _ = train(cfg, model, params, scaled(150), seed=seed)

    import pathlib

    out = pathlib.Path(out_dir)
    results: dict = {"platform": platform, "vit": {}}
    for name, knobs in _vit_variants():
        cfg_v = _copy.deepcopy(cfg)
        for path, value in knobs.items():
            _set_path(cfg_v, path, value)
        model_v = build_model(cfg_v)
        ap = eval_ap(cfg_v, model_v, params, out, f"vit_{name}")
        results["vit"][name] = round(float(ap), 4)
    return results


def _set_path(cfg, path: str, value):
    node = cfg
    parts = path.split(".")
    for p in parts[:-1]:
        node = getattr(node, p)
    setattr(node, parts[-1], value)


def measure(out_dir: str, steps_scale: float = 1.0, seed: int = 0) -> dict:
    """Train parity-settings staged overfit once; eval every variant.

    Returns {"online": {variant: AP}, "offline": {variant: AP}}.
    """
    import jax
    import jax.numpy as jnp

    from tests.test_overfit_families import eval_ap, tiny_cfg, train
    from train_net_video import build_model, init_params

    platform = jax.devices()[0].platform
    is_tpu = platform == "tpu"

    def scaled(n):
        return max(20, int(n * steps_scale))

    # ---- stage 1: MinVIS segmenter overfit (parity settings: tiny_cfg is
    # fp32 and the training matchers are exact JV already)
    cfg1 = tiny_cfg("minvis")
    model1 = build_model(cfg1)
    params1 = init_params(cfg1, model1, jax.random.key(seed))
    seg_params, _ = train(cfg1, model1, params1, scaled(120), seed=seed)

    # ---- stage 2: online tracker on the frozen segmenter
    cfg2 = tiny_cfg("dvis_online")
    cfg2.model.freeze = ("segmenter",)
    cfg2.model.tracker.matcher_solver = "jv"  # parity training
    model2 = build_model(cfg2)
    params2 = copy.deepcopy(init_params(cfg2, model2, jax.random.key(seed + 1)))
    params2["params"]["segmenter"] = seg_params["params"]
    params2, _ = train(cfg2, model2, params2, scaled(100), seed=seed)

    # ---- stage 3: offline refiner on the frozen online stack
    cfg3 = tiny_cfg("dvis_offline")
    cfg3.model.freeze = ("segmenter", "tracker")
    cfg3.model.tracker.matcher_solver = "jv"
    cfg3.solver.base_lr = 1e-3
    model3 = build_model(cfg3)
    params3 = copy.deepcopy(init_params(cfg3, model3, jax.random.key(seed + 2)))
    # COPY the online stack into stage 3: the train step donates its state
    # buffers, and sharing params2's arrays into the donated tree would
    # delete them before the online-variant evals below
    params3["params"]["online"] = jax.tree.map(jnp.array, params2["params"])
    params3, _ = train(cfg3, model3, params3, scaled(240), seed=seed)

    results: dict = {"platform": platform, "online": {}, "offline": {}}
    import pathlib

    out = pathlib.Path(out_dir)
    for arch, cfg_t, params in (
        ("online", cfg2, params2),
        ("offline", cfg3, params3),
    ):
        for name, knobs in _variants(is_tpu):
            cfg_v = copy.deepcopy(cfg_t)  # parity baseline (fp32, exact, jv)
            for path, value in knobs.items():
                _set_path(cfg_v, path, value)
            model_v = build_model(cfg_v)
            ap = eval_ap(cfg_v, model_v, params, out, f"{arch}_{name}")
            results[arch][name] = round(float(ap), 4)
    return results


def main():
    import argparse
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

    p = argparse.ArgumentParser()
    p.add_argument("--steps-scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    with tempfile.TemporaryDirectory(prefix="dvis_synth_") as tmp:
        from tests.test_data import build_synth_dataset

        build_synth_dataset(tmp)
        res = measure(tmp, steps_scale=args.steps_scale, seed=args.seed)
        res_swin = measure_swin(tmp, steps_scale=args.steps_scale,
                                seed=args.seed)
        res_vit = measure_vit(tmp, steps_scale=args.steps_scale,
                              seed=args.seed)

    print("\n| knob (eval-time) | online AP | offline AP |")
    print("|---|---|---|")
    base_on = res["online"]["parity"]
    base_off = res["offline"]["parity"]
    for name in res["online"]:
        d_on = res["online"][name] - base_on
        d_off = res["offline"][name] - base_off
        print(
            f"| {name} | {res['online'][name]:.3f} ({d_on:+.3f}) "
            f"| {res['offline'][name]:.3f} ({d_off:+.3f}) |"
        )
    print("\n| Swin knob (eval-time) | segmenter AP |")
    print("|---|---|")
    base_swin = res_swin["swin"]["parity"]
    for name, ap in res_swin["swin"].items():
        print(f"| {name} | {ap:.3f} ({ap - base_swin:+.3f}) |")
    print("\n| ViT-Adapter knob (eval-time) | segmenter AP |")
    print("|---|---|")
    base_vit = res_vit["vit"]["parity"]
    for name, ap in res_vit["vit"].items():
        print(f"| {name} | {ap:.3f} ({ap - base_vit:+.3f}) |")
    print()
    res["swin"] = res_swin["swin"]
    res["vit"] = res_vit["vit"]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
