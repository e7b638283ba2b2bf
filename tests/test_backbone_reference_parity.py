"""Swin + ViT-Adapter activation parity against the reference's OWN modules.

VERDICT r3 missing #1: the top-AP zoo rows ride on these two backbones, and
they were the last numeric surfaces without a reference-as-oracle check. The
reference torch classes load under tools/refshim.py (timm shimmed — only
DropPath/to_2tuple/trunc_normal_ are used):

  Swin         mask2former/modeling/backbone/swin.py:498-770 (the
               D2SwinTransformer wrapper only filters out_features; the
               numerics incl. per-stage out norms live in SwinTransformer)
  ViT-Adapter  backbones_vitAdapter/adapter.py:416-651 (DinoV2ViTAdapter,
               Efficient interaction blocks) + backbones.py:36
               (DinoVisionTransformer trunk; get_models vitl args:
               with_cffn=True, deform_ratio=0.5, init_values=1e-5,
               patch 16, adapter.py:368-380)

Each oracle is randomized in torch, its state dict converted with
core/checkpoint.py converters onto our flax modules, and res2..res5 compared
fp32. Small reference-shaped dims (real structure, real ratios) keep the CPU
cost test-lane friendly; input 96x128 exercises window padding (Swin) and
pos-embed interpolation (ViT).
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow

REL_TOL = 2e-4


def _randomize(module, seed):
    """Random params (0.05 * randn) + randomized BN running stats, shared
    layout with the converter via module.state_dict()."""
    rng = np.random.RandomState(seed)
    sd = module.state_dict()
    for name, p in module.named_parameters():
        sd[name] = torch.from_numpy(
            rng.randn(*p.shape).astype(np.float32) * 0.05
        )
    for name, b in module.named_buffers():
        if name.endswith("running_mean"):
            sd[name] = torch.from_numpy(rng.randn(*b.shape).astype(np.float32) * 0.1)
        elif name.endswith("running_var"):
            sd[name] = torch.from_numpy(
                (np.abs(rng.randn(*b.shape)) * 0.5 + 0.5).astype(np.float32)
            )
    module.load_state_dict(sd)
    module.eval()
    return {f"backbone.{k}": v.numpy() for k, v in module.state_dict().items()}


def _report_close(name, ours, ref, rel_tol=REL_TOL):
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    err = np.max(np.abs(ours - ref))
    rel = err / max(np.max(np.abs(ref)), 1e-6)
    print(f"PARITY {name}: max_abs_err={err:.3e} rel={rel:.3e}")
    assert rel < rel_tol, f"{name}: rel err {rel:.3e} >= {rel_tol}"


def test_swin_reference_parity():
    from refshim import load_swin_oracle

    from dvis_plus_tpu.core.checkpoint import convert_torch_swin
    from dvis_plus_tpu.models.backbones.swin import SwinTransformer

    depths, heads = (2, 2, 2, 2), (2, 4, 8, 16)
    RefSwin = load_swin_oracle()
    ref = RefSwin(
        embed_dim=48, depths=list(depths), num_heads=list(heads),
        window_size=7, drop_path_rate=0.0,
    )
    sd = _randomize(ref, seed=0)
    params = convert_torch_swin(sd, depths=depths)

    ours = SwinTransformer(
        embed_dim=48, depths=depths, num_heads=heads, window_size=7,
        drop_path_rate=0.0,
    )
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 96, 128).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    got = ours.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for k in ("res2", "res3", "res4", "res5"):
        _report_close(
            f"swin.{k}", got[k], np.transpose(ref_out[k].numpy(), (0, 2, 3, 1))
        )


def test_vit_adapter_reference_parity():
    from refshim import load_vit_adapter_oracle

    from dvis_plus_tpu.core.checkpoint import convert_torch_vit_adapter
    from dvis_plus_tpu.models.backbones.vit_adapter import ViTAdapter

    DinoViT, Adapter = load_vit_adapter_oracle()
    dim, depth, n_heads = 64, 4, 4
    vit = DinoViT(
        img_size=64, patch_size=16, embed_dim=dim, depth=depth,
        num_heads=n_heads, init_values=1e-5, block_chunks=0,
    )
    # adapter-L-shaped small config: the real vitl args (adapter.py:368-380)
    # at reduced width/depth — with_cffn, cffn_ratio, deform_ratio, extra
    # extractors all live
    ref = Adapter(
        vit_module=vit, pretrain_size=64, conv_inplane=16, n_points=4,
        deform_num_heads=n_heads, init_values=1e-6,
        interaction_indexes=[[0, 0], [1, 1], [2, 2], [3, 3]],
        with_cffn=True, cffn_ratio=0.25, deform_ratio=0.5,
        add_vit_feature=True, use_extra_extractor=True,
    )
    sd = _randomize(ref, seed=2)
    params = convert_torch_vit_adapter(
        sd, depth=depth, num_heads=n_heads, num_interactions=4
    )

    ours = ViTAdapter(
        embed_dim=dim, depth=depth, num_heads=n_heads, patch_size=16,
        conv_inplane=16, deform_num_heads=n_heads, n_points=4,
        interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)),
        with_cffn=True, cffn_ratio=0.25, deform_ratio=0.5,
        pretrain_grid=4,
    )
    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 96, 128).astype(np.float32)
    with torch.no_grad():
        f1, f2, f3, f4 = ref(torch.from_numpy(x))
    got = ours.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for k, refv in (("res2", f1), ("res3", f2), ("res4", f3), ("res5", f4)):
        _report_close(
            f"vit_adapter.{k}", got[k], np.transpose(refv.numpy(), (0, 2, 3, 1))
        )
