"""torch -> flax zoo weight converters: numerical parity against independent
torch implementations (VERDICT missing #1). The converters are keyed to the
reference's checkpoint naming (D2SwinTransformer swin.py:498-770, zoo .pth
loaded via DetectionCheckpointer, train_net_video.py:303-305)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_swin_converter_matches_hf_swin():
    """Our flax Swin on converted weights == HuggingFace SwinModel forward
    (independent torch implementation of the same architecture)."""
    import torch
    from transformers import SwinConfig, SwinModel

    from dvis_plus_tpu.core.checkpoint import convert_torch_swin
    from dvis_plus_tpu.models.backbones.swin import SwinTransformer

    depths = (1, 1, 2, 1)
    heads = (2, 4, 8, 16)
    cfg = SwinConfig(
        image_size=128, patch_size=4, embed_dim=16, depths=list(depths),
        num_heads=list(heads), window_size=4, use_absolute_embeddings=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = SwinModel(cfg, add_pooling_layer=False).eval()

    # remap HF names -> reference (microsoft) Swin checkpoint names
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ref = {}
    ref["patch_embed.proj.weight"] = sd["embeddings.patch_embeddings.projection.weight"]
    ref["patch_embed.proj.bias"] = sd["embeddings.patch_embeddings.projection.bias"]
    ref["patch_embed.norm.weight"] = sd["embeddings.norm.weight"]
    ref["patch_embed.norm.bias"] = sd["embeddings.norm.bias"]
    for s, d in enumerate(depths):
        for b in range(d):
            h = f"encoder.layers.{s}.blocks.{b}"
            r = f"layers.{s}.blocks.{b}"
            qw = np.concatenate(
                [sd[f"{h}.attention.self.{n}.weight"] for n in ("query", "key", "value")], 0
            )
            qb = np.concatenate(
                [sd[f"{h}.attention.self.{n}.bias"] for n in ("query", "key", "value")], 0
            )
            ref[f"{r}.attn.qkv.weight"] = qw
            ref[f"{r}.attn.qkv.bias"] = qb
            ref[f"{r}.attn.relative_position_bias_table"] = sd[
                f"{h}.attention.self.relative_position_bias_table"
            ]
            ref[f"{r}.attn.proj.weight"] = sd[f"{h}.attention.output.dense.weight"]
            ref[f"{r}.attn.proj.bias"] = sd[f"{h}.attention.output.dense.bias"]
            ref[f"{r}.norm1.weight"] = sd[f"{h}.layernorm_before.weight"]
            ref[f"{r}.norm1.bias"] = sd[f"{h}.layernorm_before.bias"]
            ref[f"{r}.norm2.weight"] = sd[f"{h}.layernorm_after.weight"]
            ref[f"{r}.norm2.bias"] = sd[f"{h}.layernorm_after.bias"]
            ref[f"{r}.mlp.fc1.weight"] = sd[f"{h}.intermediate.dense.weight"]
            ref[f"{r}.mlp.fc1.bias"] = sd[f"{h}.intermediate.dense.bias"]
            ref[f"{r}.mlp.fc2.weight"] = sd[f"{h}.output.dense.weight"]
            ref[f"{r}.mlp.fc2.bias"] = sd[f"{h}.output.dense.bias"]
        if s < len(depths) - 1:
            ref[f"layers.{s}.downsample.reduction.weight"] = sd[
                f"encoder.layers.{s}.downsample.reduction.weight"
            ]
            ref[f"layers.{s}.downsample.norm.weight"] = sd[
                f"encoder.layers.{s}.downsample.norm.weight"
            ]
            ref[f"layers.{s}.downsample.norm.bias"] = sd[
                f"encoder.layers.{s}.downsample.norm.bias"
            ]
    # HF's final layernorm plays the role of the reference's norm3 out-norm
    ref["norm3.weight"] = sd["layernorm.weight"]
    ref["norm3.bias"] = sd["layernorm.bias"]

    params = convert_torch_swin(ref, depths=depths, prefix="")

    model = SwinTransformer(
        embed_dim=16, depths=depths, num_heads=heads, window_size=4,
        out_features=("res5",),
    )
    rng = np.random.RandomState(1)
    img = rng.randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    got = model.apply(params, jnp.asarray(img))["res5"]  # (1, 4, 4, C)
    got = np.asarray(got).reshape(1, -1, got.shape[-1])
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.slow
def test_vit_trunk_conversion_matches_hf_dinov2():
    """Our DinoViT on converted weights == HuggingFace Dinov2Model (the
    reference's frozen ViT trunk, backbones_vitAdapter/backbones.py:36)."""
    import torch
    from transformers import Dinov2Config, Dinov2Model

    from dvis_plus_tpu.core.checkpoint import convert_torch_vit_adapter
    from dvis_plus_tpu.models.backbones.vit_adapter import DinoViT

    dim, depth, heads, ps, grid = 32, 2, 4, 8, 4
    cfg = Dinov2Config(
        hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
        intermediate_size=4 * dim, patch_size=ps, image_size=ps * grid,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layerscale_value=1.0, drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = Dinov2Model(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    ref = {
        "backbone.vit_module.cls_token": sd["embeddings.cls_token"],
        "backbone.vit_module.pos_embed": sd["embeddings.position_embeddings"],
        "backbone.vit_module.patch_embed.proj.weight": sd[
            "embeddings.patch_embeddings.projection.weight"
        ],
        "backbone.vit_module.patch_embed.proj.bias": sd[
            "embeddings.patch_embeddings.projection.bias"
        ],
    }
    for i in range(depth):
        h = f"encoder.layer.{i}"
        r = f"backbone.vit_module.blocks.{i}"
        qw = np.concatenate(
            [sd[f"{h}.attention.attention.{n}.weight"] for n in ("query", "key", "value")], 0
        )
        qb = np.concatenate(
            [sd[f"{h}.attention.attention.{n}.bias"] for n in ("query", "key", "value")], 0
        )
        ref[f"{r}.attn.qkv.weight"] = qw
        ref[f"{r}.attn.qkv.bias"] = qb
        ref[f"{r}.attn.proj.weight"] = sd[f"{h}.attention.output.dense.weight"]
        ref[f"{r}.attn.proj.bias"] = sd[f"{h}.attention.output.dense.bias"]
        ref[f"{r}.norm1.weight"] = sd[f"{h}.norm1.weight"]
        ref[f"{r}.norm1.bias"] = sd[f"{h}.norm1.bias"]
        ref[f"{r}.norm2.weight"] = sd[f"{h}.norm2.weight"]
        ref[f"{r}.norm2.bias"] = sd[f"{h}.norm2.bias"]
        ref[f"{r}.ls1.gamma"] = sd[f"{h}.layer_scale1.lambda1"]
        ref[f"{r}.ls2.gamma"] = sd[f"{h}.layer_scale2.lambda1"]
        ref[f"{r}.mlp.fc1.weight"] = sd[f"{h}.mlp.fc1.weight"]
        ref[f"{r}.mlp.fc1.bias"] = sd[f"{h}.mlp.fc1.bias"]
        ref[f"{r}.mlp.fc2.weight"] = sd[f"{h}.mlp.fc2.weight"]
        ref[f"{r}.mlp.fc2.bias"] = sd[f"{h}.mlp.fc2.bias"]

    # convert only the vit trunk (spm/interaction keys absent -> vit-only test)
    from dvis_plus_tpu.core.checkpoint import (
        _conv, _dense, _ln, _mha_from_torch,
    )

    sd2 = {k[len("backbone.vit_module."):]: v for k, v in ref.items()}
    vit_params = {
        "cls_token": sd2["cls_token"],
        "pos_embed": sd2["pos_embed"],
        "patch_embed": _conv(sd2, "patch_embed.proj"),
    }
    for i in range(depth):
        vit_params[f"block{i}"] = {
            "norm1": _ln(sd2, f"blocks.{i}.norm1"),
            "attn": _mha_from_torch(
                sd2[f"blocks.{i}.attn.qkv.weight"], sd2[f"blocks.{i}.attn.qkv.bias"],
                sd2[f"blocks.{i}.attn.proj.weight"], sd2[f"blocks.{i}.attn.proj.bias"],
                heads,
            ),
            "ls1": {"gamma": sd2[f"blocks.{i}.ls1.gamma"]},
            "norm2": _ln(sd2, f"blocks.{i}.norm2"),
            "mlp_fc1": _dense(sd2, f"blocks.{i}.mlp.fc1"),
            "mlp_fc2": _dense(sd2, f"blocks.{i}.mlp.fc2"),
            "ls2": {"gamma": sd2[f"blocks.{i}.ls2.gamma"]},
        }

    model = DinoViT(embed_dim=dim, depth=depth, num_heads=heads, patch_size=ps,
                    pretrain_grid=grid)
    rng = np.random.RandomState(2)
    img = rng.randn(1, ps * grid, ps * grid, 3).astype(np.float32)

    def fwd(mdl, x):
        tokens, cls, Hp, Wp = mdl.prepare_tokens(x)
        patches, cls_out = mdl.run_blocks(tokens, cls, 0, depth)
        return patches

    got = np.asarray(
        DinoViT(embed_dim=dim, depth=depth, num_heads=heads, patch_size=ps,
                pretrain_grid=grid).apply({"params": vit_params}, jnp.asarray(img), method=fwd)
    )
    with torch.no_grad():
        out = hf(torch.from_numpy(img.transpose(0, 3, 1, 2)), output_hidden_states=True)
        # hidden_states[-1] is the final block output BEFORE HF's extra final
        # layernorm (the reference DinoVisionTransformer trunk has no norm
        # between blocks and the adapter's extractors)
        want = out.hidden_states[-1][:, 1:].numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.slow
def test_vit_adapter_full_converter_structure():
    """The full adapter converter consumes a reference-shaped state dict and
    produces a params tree our ViTAdapter can run (shapes + layout)."""
    from dvis_plus_tpu.core.checkpoint import convert_torch_vit_adapter
    from dvis_plus_tpu.models.backbones.vit_adapter import ViTAdapter

    dim, depth, heads, ps, inplane = 16, 4, 4, 16, 8
    interactions = ((0, 0), (1, 1), (2, 2), (3, 3))
    rng = np.random.RandomState(3)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    grid = 4  # pretrain grid for pos embed
    sd = {
        "backbone.vit_module.cls_token": t(1, 1, dim),
        "backbone.vit_module.pos_embed": t(1, grid * grid + 1, dim),
        "backbone.vit_module.patch_embed.proj.weight": t(dim, 3, ps, ps),
        "backbone.vit_module.patch_embed.proj.bias": t(dim),
        "backbone.level_embed": t(3, dim),
        "backbone.up.weight": t(dim, dim, 2, 2),
        "backbone.up.bias": t(dim),
    }
    # chunked block naming on purpose (dinov2 BlockChunk layout)
    for i in range(depth):
        b = f"backbone.vit_module.blocks.0.{i}"
        sd.update({
            f"{b}.norm1.weight": t(dim), f"{b}.norm1.bias": t(dim),
            f"{b}.attn.qkv.weight": t(3 * dim, dim), f"{b}.attn.qkv.bias": t(3 * dim),
            f"{b}.attn.proj.weight": t(dim, dim), f"{b}.attn.proj.bias": t(dim),
            f"{b}.ls1.gamma": t(dim), f"{b}.ls2.gamma": t(dim),
            f"{b}.norm2.weight": t(dim), f"{b}.norm2.bias": t(dim),
            f"{b}.mlp.fc1.weight": t(4 * dim, dim), f"{b}.mlp.fc1.bias": t(4 * dim),
            f"{b}.mlp.fc2.weight": t(dim, 4 * dim), f"{b}.mlp.fc2.bias": t(dim),
        })
    for n in (1, 2, 3, 4):
        sd.update({
            f"backbone.norm{n}.weight": t(dim), f"backbone.norm{n}.bias": t(dim),
            f"backbone.norm{n}.running_mean": t(dim),
            f"backbone.norm{n}.running_var": np.abs(t(dim)) + 1.0,
        })
    spm_specs = {
        "stem.0": (inplane, 3, 3, 3), "stem.3": (inplane, inplane, 3, 3),
        "stem.6": (inplane, inplane, 3, 3), "conv2.0": (2 * inplane, inplane, 3, 3),
        "conv3.0": (4 * inplane, 2 * inplane, 3, 3), "conv4.0": (4 * inplane, 4 * inplane, 3, 3),
    }
    for k, shape in spm_specs.items():
        sd[f"backbone.spm.{k}.weight"] = t(*shape)
        bnk = k.rsplit(".", 1)[0] + "." + str(int(k.rsplit(".", 1)[1]) + 1)
        c = shape[0]
        sd.update({
            f"backbone.spm.{bnk}.weight": t(c), f"backbone.spm.{bnk}.bias": t(c),
            f"backbone.spm.{bnk}.running_mean": t(c),
            f"backbone.spm.{bnk}.running_var": np.abs(t(c)) + 1.0,
        })
    for fc, cin in (("fc1", inplane), ("fc2", 2 * inplane), ("fc3", 4 * inplane), ("fc4", 4 * inplane)):
        sd[f"backbone.spm.{fc}.weight"] = t(dim, cin, 1, 1)
        sd[f"backbone.spm.{fc}.bias"] = t(dim)

    # reference vitl adapter args: deform_ratio=0.5 value projections
    # (adapter.py:368-380 -> ms_deform_attn.py ratio), ConvFFN on
    vdim = dim // 2
    hidden = int(dim * 0.25)

    def deform(pre, n_levels):
        sd.update({
            f"{pre}.value_proj.weight": t(vdim, dim), f"{pre}.value_proj.bias": t(vdim),
            f"{pre}.sampling_offsets.weight": t(heads * n_levels * 4 * 2, dim),
            f"{pre}.sampling_offsets.bias": t(heads * n_levels * 4 * 2),
            f"{pre}.attention_weights.weight": t(heads * n_levels * 4, dim),
            f"{pre}.attention_weights.bias": t(heads * n_levels * 4),
            f"{pre}.output_proj.weight": t(dim, vdim), f"{pre}.output_proj.bias": t(dim),
        })

    def norms(pre, names):
        for n in names:
            sd[f"{pre}.{n}.weight"] = t(dim)
            sd[f"{pre}.{n}.bias"] = t(dim)

    def cffn(pre):
        sd.update({
            f"{pre}.ffn.fc1.weight": t(hidden, dim), f"{pre}.ffn.fc1.bias": t(hidden),
            f"{pre}.ffn.dwconv.dwconv.weight": t(hidden, 1, 3, 3),
            f"{pre}.ffn.dwconv.dwconv.bias": t(hidden),
            f"{pre}.ffn.fc2.weight": t(dim, hidden), f"{pre}.ffn.fc2.bias": t(dim),
            f"{pre}.ffn_norm.weight": t(dim), f"{pre}.ffn_norm.bias": t(dim),
        })

    # Efficient interaction blocks (extractor only, no injector) matching the
    # shipped configs (adapter.py:245-262 + vitl args: with_cffn=True,
    # deform_ratio=0.5)
    for i in range(4):
        pre = f"backbone.interactions.{i}"
        norms(f"{pre}.extractor", ["query_norm", "feat_norm"])
        deform(f"{pre}.extractor.attn", 1)
        cffn(f"{pre}.extractor")
        if i == 3:  # extra extractors on the last interaction
            for j in range(2):
                e = f"{pre}.extra_extractors.{j}"
                norms(e, ["query_norm", "feat_norm"])
                deform(f"{e}.attn", 1)
                cffn(e)

    converted = convert_torch_vit_adapter(sd, depth=depth, num_heads=heads)

    model = ViTAdapter(
        embed_dim=dim, depth=depth, num_heads=heads, patch_size=ps,
        conv_inplane=inplane, deform_num_heads=heads,
        interaction_indexes=interactions, pretrain_grid=grid,
    )
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    init = model.init(jax.random.key(0), img)
    import chex

    chex.assert_trees_all_equal_shapes(init, converted)
    out = model.apply(converted, img)
    assert out["res2"].shape[1] == 16 and np.all(np.isfinite(np.asarray(out["res5"])))


@pytest.mark.parametrize("arch", ["minvis", "dvis_online", "dvis_offline"])
@pytest.mark.slow
def test_full_model_converter_covers_reference_key_space(arch):
    """convert_reference_checkpoint consumes a reference-keyed state dict and
    fills (almost) every param of our model; the converted tree runs."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from parity_check import coverage_report, synthetic_reference_state_dict

    from dvis_plus_tpu.core.config import Config
    from dvis_plus_tpu.core.zoo_convert import convert_reference_checkpoint
    from train_net_video import build_model, init_params

    cfg = Config()
    cfg.model.meta_architecture = arch
    cfg.model.num_classes = 3
    cfg.model.compute_dtype = "float32"
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.transformer_decoder.num_queries = 8
    cfg.model.transformer_decoder.dec_layers = 2
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.reid_branch = arch != "minvis"
    cfg.model.tracker.num_layers = 1
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.refiner.num_layers = 1
    cfg.model.refiner.feedforward_dim = 64
    cfg.input.sampling_frame_num = 2
    cfg.input.min_size_train = (64,)
    cfg.input.max_size_train = 64
    cfg.model.criterion.max_num_instances = 4

    sd = synthetic_reference_state_dict(cfg)
    converted = convert_reference_checkpoint(sd, cfg)
    model = build_model(cfg)
    init = init_params(cfg, model, jax.random.key(0))
    rep = coverage_report(converted, init)
    assert not rep["mismatched"], rep["mismatched"][:5]
    assert not rep["extra"], rep["extra"][:5]
    # everything except flax-only params (e.g. tracker uses no query_embed
    # params of its own) must be filled
    assert rep["filled"] >= rep["total_params"] - len(rep["left_at_init"])
    assert len(rep["left_at_init"]) <= 2, rep["left_at_init"]

    # converted tree runs end-to-end
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    if arch == "minvis":
        out = model.apply(converted, imgs)
        assert np.all(np.isfinite(np.asarray(out["pred_masks"], np.float32)))
    else:
        outs = model.apply(converted, imgs[None])
        track_out = outs[1]
        assert np.all(np.isfinite(np.asarray(track_out["pred_masks"], np.float32)))
