"""Zoo weight-port parity harness.

Given a reference DVIS++ checkpoint (.pth) and one of our configs, this tool:
  1. converts the torch state dict onto our flax param tree
     (:mod:`dvis_plus_tpu.core.zoo_convert`),
  2. reports coverage: reference keys consumed / ignored, our params filled /
     left at init, and any shape mismatches,
  3. optionally runs a short clip through the model and dumps per-stage
     activation statistics for diffing against a reference-side run
     (reference load path: DVIS_Plus/train_net_video.py:303-305,
     demo_video/predictor.py:212-215).

Usage:
  python tools/parity_check.py --config-file configs/dvis/dvis_online_r50_ytvis19.yaml \
      --weights /path/to/zoo.pth [--clip /path/to/frames_dir] [--save-params out.ckpt]

``synthetic_reference_state_dict`` builds a reference-key-space state dict
with random values for a given config — used by the converter tests and for
dry-running this harness without real zoo weights.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_reference_state_dict(cfg) -> Dict[str, np.ndarray]:
    """Reference-named random state dict for ``cfg`` (R50 backbones only).

    Mirrors the key space of reference zoo checkpoints: d2 ResNet (``stem.*``,
    ``res2.0.conv1.norm`` ...), msdeformattn pixel decoder, the DVIS video
    predictor, tracker and refiner."""
    rng = np.random.RandomState(0)
    sd: Dict[str, np.ndarray] = {}

    def t(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    def lin(key, dout, din):
        sd[f"{key}.weight"] = t(dout, din)
        sd[f"{key}.bias"] = t(dout)

    def ln(key, d):
        sd[f"{key}.weight"] = np.ones(d, np.float32) + t(d)
        sd[f"{key}.bias"] = t(d)

    def mha(key, d):
        sd[f"{key}.in_proj_weight"] = t(3 * d, d)
        sd[f"{key}.in_proj_bias"] = t(3 * d)
        lin(f"{key}.out_proj", d, d)

    def mlp(key, dims):
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            lin(f"{key}.layers.{i}", dout, din)

    arch = cfg.model.meta_architecture
    if arch in ("minvis_ov", "dvis_online_ov", "dvis_offline_ov"):
        return _synthetic_ov_state_dict(cfg, sd, t, lin, ln, mha, mlp)

    # --- d2 ResNet-50 ---
    assert cfg.model.backbone.name == "resnet50", "synthetic dict covers R50"

    def bn(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = t(c)
        sd[f"{key}.running_mean"] = t(c)
        sd[f"{key}.running_var"] = np.abs(t(c)) + 1.0

    sd["backbone.stem.conv1.weight"] = t(64, 3, 7, 7)
    bn("backbone.stem.conv1.norm", 64)
    depths = (3, 4, 6, 3)
    cin = 64
    for s, depth in enumerate(depths):
        cb = 64 * (2**s)
        cout = cb * 4
        for b in range(depth):
            pre = f"backbone.res{s + 2}.{b}"
            sd[f"{pre}.conv1.weight"] = t(cb, cin if b == 0 else cout, 1, 1)
            bn(f"{pre}.conv1.norm", cb)
            sd[f"{pre}.conv2.weight"] = t(cb, cb, 3, 3)
            bn(f"{pre}.conv2.norm", cb)
            sd[f"{pre}.conv3.weight"] = t(cout, cb, 1, 1)
            bn(f"{pre}.conv3.norm", cout)
            if b == 0:
                sd[f"{pre}.shortcut.weight"] = t(cout, cin, 1, 1)
                bn(f"{pre}.shortcut.norm", cout)
        cin = cout

    # --- pixel decoder ---
    pd = cfg.model.pixel_decoder
    C = pd.conv_dim
    chans = {"res3": 512, "res4": 1024, "res5": 2048}
    pre = "sem_seg_head.pixel_decoder"
    for i, feat in enumerate(["res5", "res4", "res3"]):
        sd[f"{pre}.input_proj.{i}.0.weight"] = t(C, chans[feat], 1, 1)
        sd[f"{pre}.input_proj.{i}.0.bias"] = t(C)
        ln(f"{pre}.input_proj.{i}.1", C)  # GN weight/bias
    sd[f"{pre}.transformer.level_embed"] = t(3, C)
    for li in range(pd.transformer_enc_layers):
        e = f"{pre}.transformer.encoder.layers.{li}"
        lin(f"{e}.self_attn.value_proj", C, C)
        lin(f"{e}.self_attn.sampling_offsets", pd.transformer_nheads * 3 * pd.num_points * 2, C)
        lin(f"{e}.self_attn.attention_weights", pd.transformer_nheads * 3 * pd.num_points, C)
        lin(f"{e}.self_attn.output_proj", C, C)
        ln(f"{e}.norm1", C)
        lin(f"{e}.linear1", pd.transformer_dim_feedforward, C)
        lin(f"{e}.linear2", C, pd.transformer_dim_feedforward)
        ln(f"{e}.norm2", C)
    sd[f"{pre}.mask_features.weight"] = t(pd.mask_dim, C, 1, 1)
    sd[f"{pre}.mask_features.bias"] = t(pd.mask_dim)
    sd[f"{pre}.adapter_1.weight"] = t(C, 256, 1, 1)
    ln(f"{pre}.adapter_1.norm", C)
    sd[f"{pre}.layer_1.weight"] = t(C, C, 3, 3)
    ln(f"{pre}.layer_1.norm", C)

    # --- predictor ---
    td = cfg.model.transformer_decoder
    D = td.hidden_dim
    K1 = cfg.model.num_classes + 1
    pre = "sem_seg_head.predictor"
    sd[f"{pre}.query_feat.weight"] = t(td.num_queries, D)
    sd[f"{pre}.query_embed.weight"] = t(td.num_queries, D)
    sd[f"{pre}.level_embed.weight"] = t(3, D)
    ln(f"{pre}.decoder_norm", D)
    lin(f"{pre}.class_embed", K1, D)
    mlp(f"{pre}.mask_embed", (D, D, D, td.mask_dim))
    if td.reid_branch:
        mlp(f"{pre}.reid_embed", (D, td.reid_hidden_dim, td.reid_hidden_dim, D))
    for i in range(td.dec_layers):
        mha(f"{pre}.transformer_self_attention_layers.{i}.self_attn", D)
        ln(f"{pre}.transformer_self_attention_layers.{i}.norm", D)
        mha(f"{pre}.transformer_cross_attention_layers.{i}.multihead_attn", D)
        ln(f"{pre}.transformer_cross_attention_layers.{i}.norm", D)
        lin(f"{pre}.transformer_ffn_layers.{i}.linear1", td.dim_feedforward, D)
        lin(f"{pre}.transformer_ffn_layers.{i}.linear2", D, td.dim_feedforward)
        ln(f"{pre}.transformer_ffn_layers.{i}.norm", D)

    arch = cfg.model.meta_architecture
    if arch in ("minvis", "ctvis"):
        return sd

    # --- tracker ---
    tr = cfg.model.tracker
    C2 = D * (2 if td.reid_branch else 1)
    for i in range(tr.num_layers):
        mha(f"tracker.transformer_self_attention_layers.{i}.self_attn", C2)
        ln(f"tracker.transformer_self_attention_layers.{i}.norm", C2)
        mha(f"tracker.transformer_cross_attention_layers.{i}.multihead_attn", C2)
        ln(f"tracker.transformer_cross_attention_layers.{i}.norm", C2)
        lin(f"tracker.transformer_ffn_layers.{i}.linear1", tr.feedforward_dim, C2)
        lin(f"tracker.transformer_ffn_layers.{i}.linear2", C2, tr.feedforward_dim)
        ln(f"tracker.transformer_ffn_layers.{i}.norm", C2)
    mlp("tracker.ref_proj", (C2, C2, C2, C2))
    ln("tracker.decoder_norm", C2)
    lin("tracker.class_embed", K1, 2 * C2)
    mlp("tracker.mask_embed", (C2, C2, C2, D))
    sd["tracker.mask_feature_proj.weight"] = t(D, pd.mask_dim, 1, 1)
    sd["tracker.mask_feature_proj.bias"] = t(D)
    if arch == "dvis_online":
        return sd

    # --- refiner ---
    rf = cfg.model.refiner
    for i in range(rf.num_layers):
        for grp in ("time_self", "obj_self"):
            mha(f"refiner.transformer_{grp}_attention_layers.{i}.self_attn", C2)
            ln(f"refiner.transformer_{grp}_attention_layers.{i}.norm", C2)
        mha(f"refiner.transformer_cross_attention_layers.{i}.multihead_attn", C2)
        ln(f"refiner.transformer_cross_attention_layers.{i}.norm", C2)
        lin(f"refiner.transformer_ffn_layers.{i}.linear1", rf.feedforward_dim, C2)
        lin(f"refiner.transformer_ffn_layers.{i}.linear2", C2, rf.feedforward_dim)
        ln(f"refiner.transformer_ffn_layers.{i}.norm", C2)
        sd[f"refiner.conv_short_aggregate_layers.{i}.0.weight"] = t(C2, C2, 5)
        sd[f"refiner.conv_short_aggregate_layers.{i}.0.bias"] = t(C2)
        sd[f"refiner.conv_short_aggregate_layers.{i}.2.weight"] = t(C2, C2, 3)
        sd[f"refiner.conv_short_aggregate_layers.{i}.2.bias"] = t(C2)
        ln(f"refiner.conv_norms.{i}", C2)
    ln("refiner.decoder_norm", C2)
    lin("refiner.class_embed", K1, C2)
    mlp("refiner.mask_embed", (C2, C2, C2, D))
    lin("refiner.activation_proj", 1, C2)
    return sd


def _synthetic_ov_state_dict(cfg, sd, t, lin, ln, mha, mlp) -> Dict[str, np.ndarray]:
    """OV zoo key space (ov_dvis meta_architecture_ov.py): open_clip ConvNeXt
    backbone (``backbone.clip_model.visual.*``), the OV predictor with the
    FC-CLIP head, ``void_embedding``, and the OV tracker/refiner whose shared
    head modules are re-registered under ``tracker.*`` / ``refiner.*``."""
    bb = cfg.model.backbone
    depths, dims = tuple(bb.clip_depths), tuple(bb.clip_dims)
    emb = cfg.model.ov.clip_embed_dim

    # --- open_clip ConvNeXt trunk (timm naming) ---
    g = "backbone.clip_model.visual.trunk"
    sd[f"{g}.stem.0.weight"] = t(dims[0], 3, 4, 4)
    sd[f"{g}.stem.0.bias"] = t(dims[0])
    ln(f"{g}.stem.1", dims[0])
    for s, depth in enumerate(depths):
        if s > 0:
            ln(f"{g}.stages.{s}.downsample.0", dims[s - 1])
            sd[f"{g}.stages.{s}.downsample.1.weight"] = t(dims[s], dims[s - 1], 2, 2)
            sd[f"{g}.stages.{s}.downsample.1.bias"] = t(dims[s])
        for b in range(depth):
            pre = f"{g}.stages.{s}.blocks.{b}"
            sd[f"{pre}.conv_dw.weight"] = t(dims[s], 1, 7, 7)
            sd[f"{pre}.conv_dw.bias"] = t(dims[s])
            ln(f"{pre}.norm", dims[s])
            lin(f"{pre}.mlp.fc1", 4 * dims[s], dims[s])
            lin(f"{pre}.mlp.fc2", dims[s], 4 * dims[s])
            sd[f"{pre}.gamma"] = t(dims[s])
    # projection head: trunk.head.norm -> visual.head.mlp (clip.py:147-152)
    ln(f"{g}.head.norm", dims[-1])
    lin("backbone.clip_model.visual.head.mlp.fc1", dims[-1], dims[-1])
    lin("backbone.clip_model.visual.head.mlp.fc2", emb, dims[-1])
    sd["backbone.clip_model.logit_scale"] = np.float32(np.log(1 / 0.07))
    sd["void_embedding.weight"] = t(1, emb)

    # --- pixel decoder over the CLIP pyramid ---
    pd = cfg.model.pixel_decoder
    C = pd.conv_dim
    chans = {"res3": dims[1], "res4": dims[2], "res5": dims[3]}
    pre = "sem_seg_head.pixel_decoder"
    for i, feat in enumerate(["res5", "res4", "res3"]):
        sd[f"{pre}.input_proj.{i}.0.weight"] = t(C, chans[feat], 1, 1)
        sd[f"{pre}.input_proj.{i}.0.bias"] = t(C)
        ln(f"{pre}.input_proj.{i}.1", C)
    sd[f"{pre}.transformer.level_embed"] = t(3, C)
    for li in range(pd.transformer_enc_layers):
        e = f"{pre}.transformer.encoder.layers.{li}"
        lin(f"{e}.self_attn.value_proj", C, C)
        lin(f"{e}.self_attn.sampling_offsets", pd.transformer_nheads * 3 * pd.num_points * 2, C)
        lin(f"{e}.self_attn.attention_weights", pd.transformer_nheads * 3 * pd.num_points, C)
        lin(f"{e}.self_attn.output_proj", C, C)
        ln(f"{e}.norm1", C)
        lin(f"{e}.linear1", pd.transformer_dim_feedforward, C)
        lin(f"{e}.linear2", C, pd.transformer_dim_feedforward)
        ln(f"{e}.norm2", C)
    sd[f"{pre}.mask_features.weight"] = t(pd.mask_dim, C, 1, 1)
    sd[f"{pre}.mask_features.bias"] = t(pd.mask_dim)
    sd[f"{pre}.adapter_1.weight"] = t(C, dims[0], 1, 1)
    ln(f"{pre}.adapter_1.norm", C)
    sd[f"{pre}.layer_1.weight"] = t(C, C, 3, 3)
    ln(f"{pre}.layer_1.norm", C)

    # --- OV predictor (FC-CLIP head, decoder_ov.py:179-205) ---
    td = cfg.model.transformer_decoder
    D = td.hidden_dim
    pre = "sem_seg_head.predictor"
    sd[f"{pre}.query_feat.weight"] = t(td.num_queries, D)
    sd[f"{pre}.query_embed.weight"] = t(td.num_queries, D)
    sd[f"{pre}.level_embed.weight"] = t(3, D)
    ln(f"{pre}.decoder_norm", D)
    mlp(f"{pre}.mask_embed", (D, D, D, td.mask_dim))
    if C != D:
        for i in range(3):
            sd[f"{pre}.input_proj.{i}.weight"] = t(D, C, 1, 1)
            sd[f"{pre}.input_proj.{i}.bias"] = t(D)
    for i in range(td.dec_layers):
        mha(f"{pre}.transformer_self_attention_layers.{i}.self_attn", D)
        ln(f"{pre}.transformer_self_attention_layers.{i}.norm", D)
        mha(f"{pre}.transformer_cross_attention_layers.{i}.multihead_attn", D)
        ln(f"{pre}.transformer_cross_attention_layers.{i}.norm", D)
        lin(f"{pre}.transformer_ffn_layers.{i}.linear1", td.dim_feedforward, D)
        lin(f"{pre}.transformer_ffn_layers.{i}.linear2", D, td.dim_feedforward)
        ln(f"{pre}.transformer_ffn_layers.{i}.norm", D)

    def ov_head(scope):
        ln(f"{scope}._mask_pooling_proj.0", D)
        lin(f"{scope}._mask_pooling_proj.1", D, D)
        mlp(f"{scope}.class_embed", (D, D, D, emb))
        sd[f"{scope}.logit_scale"] = np.float32(np.log(1 / 0.07))

    ov_head(pre)
    if cfg.model.meta_architecture == "minvis_ov":
        return sd

    # --- OV tracker (hidden = D, no reid doubling; shared head re-registered) ---
    tr = cfg.model.tracker
    for i in range(tr.num_layers):
        mha(f"tracker.transformer_self_attention_layers.{i}.self_attn", D)
        ln(f"tracker.transformer_self_attention_layers.{i}.norm", D)
        mha(f"tracker.transformer_cross_attention_layers.{i}.multihead_attn", D)
        ln(f"tracker.transformer_cross_attention_layers.{i}.norm", D)
        lin(f"tracker.transformer_ffn_layers.{i}.linear1", tr.feedforward_dim, D)
        lin(f"tracker.transformer_ffn_layers.{i}.linear2", D, tr.feedforward_dim)
        ln(f"tracker.transformer_ffn_layers.{i}.norm", D)
    mlp("tracker.ref_proj", (D, D, D, D))
    lin("tracker.merge", D, 2 * D)
    ln("tracker.decoder_norm", D)
    mlp("tracker.mask_embed", (D, D, D, td.mask_dim))
    ov_head("tracker")
    if cfg.model.meta_architecture == "dvis_online_ov":
        return sd

    # --- OV refiner ---
    rf = cfg.model.refiner
    for i in range(rf.num_layers):
        for grp in ("time_self", "obj_self"):
            mha(f"refiner.transformer_{grp}_attention_layers.{i}.self_attn", D)
            ln(f"refiner.transformer_{grp}_attention_layers.{i}.norm", D)
        mha(f"refiner.transformer_cross_attention_layers.{i}.multihead_attn", D)
        ln(f"refiner.transformer_cross_attention_layers.{i}.norm", D)
        lin(f"refiner.transformer_ffn_layers.{i}.linear1", rf.feedforward_dim, D)
        lin(f"refiner.transformer_ffn_layers.{i}.linear2", D, rf.feedforward_dim)
        ln(f"refiner.transformer_ffn_layers.{i}.norm", D)
        sd[f"refiner.conv_short_aggregate_layers.{i}.0.weight"] = t(D, D, 5)
        sd[f"refiner.conv_short_aggregate_layers.{i}.0.bias"] = t(D)
        sd[f"refiner.conv_short_aggregate_layers.{i}.2.weight"] = t(D, D, 3)
        sd[f"refiner.conv_short_aggregate_layers.{i}.2.bias"] = t(D)
        ln(f"refiner.conv_norms.{i}", D)
    ln("refiner.decoder_norm", D)
    mlp("refiner.mask_embed", (D, D, D, td.mask_dim))
    lin("refiner.activation_proj", 1, D)
    ov_head("refiner")
    return sd


def coverage_report(converted, init_params) -> Dict:
    """Diff the converted tree against a fresh init: filled / missing /
    mismatched leaves."""
    from dvis_plus_tpu.core.checkpoint import _flatten

    conv = _flatten(converted)
    init = _flatten(init_params)
    filled = sorted(k for k in conv if k in init and init[k].shape == np.asarray(conv[k]).shape)
    mismatched = sorted(
        (k, tuple(np.asarray(conv[k]).shape), tuple(init[k].shape))
        for k in conv
        if k in init and init[k].shape != np.asarray(conv[k]).shape
    )
    extra = sorted(k for k in conv if k not in init)
    left_at_init = sorted(k for k in init if k not in conv)
    return {
        "filled": len(filled),
        "total_params": len(init),
        "mismatched": mismatched,
        "extra": extra,
        "left_at_init": left_at_init,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--synthetic", action="store_true",
                    help="use a synthetic reference-keyed state dict")
    ap.add_argument("--stats", action="store_true",
                    help="run a 5-frame random clip and print per-stage stats")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvis_plus_tpu.core.config import load_config
    from dvis_plus_tpu.core.checkpoint import load_torch_state_dict
    from dvis_plus_tpu.core.zoo_convert import convert_reference_checkpoint
    from train_net_video import build_model, init_params

    cfg = load_config(args.config_file, args.opts)
    if args.synthetic:
        sd = synthetic_reference_state_dict(cfg)
    else:
        assert args.weights, "--weights or --synthetic required"
        sd = load_torch_state_dict(args.weights)

    converted = convert_reference_checkpoint(sd, cfg)
    model = build_model(cfg)
    init = init_params(cfg, model, jax.random.key(0))
    rep = coverage_report(converted, init)
    print(json.dumps({
        "filled": rep["filled"],
        "total_params": rep["total_params"],
        "mismatched": rep["mismatched"][:20],
        "extra": rep["extra"][:20],
        "left_at_init": rep["left_at_init"][:40],
    }, indent=2, default=str))

    if args.stats and not rep["mismatched"]:
        T = 5
        div = cfg.model.size_divisibility
        H = ((cfg.input.min_size_test + div - 1) // div) * div
        W = ((cfg.input.max_size_test + div - 1) // div) * div
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.randn(T, H, W, 3).astype(np.float32))
        arch = cfg.model.meta_architecture
        if arch in ("minvis", "ctvis"):
            out = model.apply(converted, imgs)
        else:
            out = model.apply(converted, imgs[None])[1]  # track_out
        stats = {
            k: {"mean": float(np.mean(np.asarray(v, np.float32))),
                "std": float(np.std(np.asarray(v, np.float32)))}
            for k, v in out.items()
            if hasattr(v, "shape")
        }
        print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
