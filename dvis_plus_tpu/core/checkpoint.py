"""Checkpoint IO: orbax save/restore + torch->jax weight conversion.

Replaces detectron2's ``DetectionCheckpointer``
(reference ``train_net_video.py:303-305``: ``resume_or_load`` of ``.pth`` /
``.pkl`` zoo weights, partial loading, stage chaining via ``MODEL.WEIGHTS``):

- :func:`save` / :func:`restore`: orbax StandardCheckpointer over the
  TrainState pytree (params + optimizer + step + class memory);
- :func:`load_weights`: params-only load from a previous stage's checkpoint
  into a possibly larger model (partial, by subtree name) — the reference's
  stage-chaining behavior (CTVIS ckpt -> online model -> offline model);
- :func:`convert_torch_resnet`: maps a torchvision/d2 ResNet state_dict onto
  the flax ResNet for zoo-parity checks (SURVEY §5.4 "torch->jax weight
  converter").
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def load_weights(path: str, params: Dict, subtree: Optional[str] = None,
                 cfg=None) -> Dict:
    """Partial params load: entries present in the checkpoint override the
    template; missing entries keep their (fresh) initialization — matching
    DetectionCheckpointer's non-strict load used for stage chaining.

    Reference zoo checkpoints (``.pth``/``.pt``/``.pkl``/``.npz``) are
    converted on the fly via ``zoo_convert.convert_reference_checkpoint``
    when ``cfg`` is given (the reference's ``MODEL.WEIGHTS`` accepts zoo
    ``.pth`` directly; so does ours)."""
    if os.path.splitext(path)[1] in (".pth", ".pt", ".pkl", ".npz"):
        if cfg is None:
            raise ValueError(
                f"{path}: torch zoo checkpoints need cfg for arch-routed "
                "conversion (pass cfg to load_weights)"
            )
        from dvis_plus_tpu.core.zoo_convert import convert_reference_checkpoint

        loaded = convert_reference_checkpoint(load_torch_state_dict(path), cfg)
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        loaded = ckptr.restore(os.path.abspath(path))
    if subtree:
        for k in subtree.split("/"):
            loaded = loaded[k]

    if (
        isinstance(loaded, dict)
        and "params" in loaded
        and ("opt_state" in loaded or "step" in loaded)
    ):
        # a full TrainState checkpoint (what the CLI training loop saves):
        # stage chaining points cfg.weights at the previous stage's
        # checkpoint dir (reference MODEL.WEIGHTS semantics), so strip the
        # optimizer/step wrapper and merge its model params
        loaded = loaded["params"]

    flat_params = _flatten(params)
    flat_loaded = _flatten(loaded)
    merged = dict(flat_params)
    n_hit = 0
    for k, v in flat_loaded.items():
        if k in merged and merged[k].shape == v.shape:
            merged[k] = v
            n_hit += 1
    logger = logging.getLogger(__name__)
    if n_hit == 0:
        logger.warning(
            "load_weights(%s): NO parameter overlapped the model (checkpoint "
            "leaves: %d, model leaves: %d) — the model keeps its fresh init",
            path, len(flat_loaded), len(flat_params),
        )
    else:
        logger.info(
            "load_weights(%s): loaded %d/%d model leaves (%d checkpoint leaves)",
            path, n_hit, len(flat_params), len(flat_loaded),
        )
    return _unflatten(merged)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat: Dict[str, Any]):
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root


# ---------------------------------------------------------------------------
# torch -> flax converters (host-side, for zoo parity)
# ---------------------------------------------------------------------------


def convert_torch_resnet(state_dict: Dict[str, "np.ndarray"], depths=(3, 4, 6, 3)) -> Dict:
    """torchvision-style ResNet state_dict -> flax ResNet params.

    Accepts numpy-valued dicts (call ``.numpy()`` on torch tensors first).
    Conv weights OIHW -> HWIO; BN (weight, bias, running_mean, running_var) ->
    FrozenBN (scale, bias, mean, var).
    """

    def conv(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    params["stem_conv1"] = {"kernel": conv(state_dict["conv1.weight"])}
    params["stem_norm1"] = {
        "scale": state_dict["bn1.weight"],
        "bias": state_dict["bn1.bias"],
        "mean": state_dict["bn1.running_mean"],
        "var": state_dict["bn1.running_var"],
    }
    for s, depth in enumerate(depths):
        for b in range(depth):
            pt = f"layer{s + 1}.{b}"
            fx = f"res{s + 2}_block{b}"
            blk: Dict[str, Any] = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = {"kernel": conv(state_dict[f"{pt}.conv{i}.weight"])}
                blk[f"norm{i}"] = {
                    "scale": state_dict[f"{pt}.bn{i}.weight"],
                    "bias": state_dict[f"{pt}.bn{i}.bias"],
                    "mean": state_dict[f"{pt}.bn{i}.running_mean"],
                    "var": state_dict[f"{pt}.bn{i}.running_var"],
                }
            if f"{pt}.downsample.0.weight" in state_dict:
                blk["shortcut"] = {"kernel": conv(state_dict[f"{pt}.downsample.0.weight"])}
                blk["shortcut_norm"] = {
                    "scale": state_dict[f"{pt}.downsample.1.weight"],
                    "bias": state_dict[f"{pt}.downsample.1.bias"],
                    "mean": state_dict[f"{pt}.downsample.1.running_mean"],
                    "var": state_dict[f"{pt}.downsample.1.running_var"],
                }
            params[fx] = blk
    return {"params": params}


def load_torch_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    """Load a torch ``.pth``/``.pt``/``.pkl`` (or ``.npz``) checkpoint into a
    flat numpy-valued state dict (the reference loads zoo ``.pth`` via
    DetectionCheckpointer, train_net_video.py:303-305). Unwraps common
    containers ({'model': ...}, {'state_dict': ...}, {'module': ...})."""
    if path.endswith(".npz"):
        data = np.load(path)
        return {k: data[k] for k in data.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy() if v.dtype.is_floating_point else v.numpy()
        else:
            out[k] = np.asarray(v)
    return out


def convert_torch_swin(
    state_dict: Dict[str, "np.ndarray"],
    depths=(2, 2, 6, 2),
    prefix: str = "backbone.",
) -> Dict:
    """Reference Swin state_dict -> flax SwinTransformer params.

    Key layout follows the reference's D2SwinTransformer checkpoints
    (``DVIS_Plus/mask2former/modeling/backbone/swin.py:498-770``; zoo .pth
    keys ``backbone.patch_embed.proj``, ``backbone.layers.N.blocks.M.attn.qkv``
    etc., per-stage output norms ``backbone.norm{0..3}``)."""

    def g(k):
        return np.asarray(state_dict[prefix + k])

    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(g("patch_embed.proj.weight"), (2, 3, 1, 0)),
            "bias": g("patch_embed.proj.bias"),
        },
        "patch_norm": {
            "scale": g("patch_embed.norm.weight"),
            "bias": g("patch_embed.norm.bias"),
        },
    }
    for s, depth in enumerate(depths):
        for b in range(depth):
            pre = f"layers.{s}.blocks.{b}"
            p[f"stage{s}_block{b}"] = {
                "norm1": {"scale": g(f"{pre}.norm1.weight"), "bias": g(f"{pre}.norm1.bias")},
                "attn": {
                    "qkv": {
                        "kernel": g(f"{pre}.attn.qkv.weight").T,
                        "bias": g(f"{pre}.attn.qkv.bias"),
                    },
                    "relative_position_bias_table": g(
                        f"{pre}.attn.relative_position_bias_table"
                    ),
                    "proj": {
                        "kernel": g(f"{pre}.attn.proj.weight").T,
                        "bias": g(f"{pre}.attn.proj.bias"),
                    },
                },
                "norm2": {"scale": g(f"{pre}.norm2.weight"), "bias": g(f"{pre}.norm2.bias")},
                "mlp_fc1": {
                    "kernel": g(f"{pre}.mlp.fc1.weight").T,
                    "bias": g(f"{pre}.mlp.fc1.bias"),
                },
                "mlp_fc2": {
                    "kernel": g(f"{pre}.mlp.fc2.weight").T,
                    "bias": g(f"{pre}.mlp.fc2.bias"),
                },
            }
        if s < len(depths) - 1:
            p[f"downsample{s}"] = {
                "norm": {
                    "scale": g(f"layers.{s}.downsample.norm.weight"),
                    "bias": g(f"layers.{s}.downsample.norm.bias"),
                },
                "reduction": {"kernel": g(f"layers.{s}.downsample.reduction.weight").T},
            }
        if prefix + f"norm{s}.weight" in state_dict:
            p[f"out_norm{s}"] = {
                "scale": g(f"norm{s}.weight"),
                "bias": g(f"norm{s}.bias"),
            }
    return {"params": p}


def _mha_from_torch(qkv_w, qkv_b, proj_w, proj_b, heads: int) -> Dict:
    """torch fused-qkv attention weights -> our MultiHeadAttention params."""
    width = qkv_w.shape[1]
    dh = width // heads
    qw, kw, vw = np.split(np.asarray(qkv_w), 3, axis=0)
    qb, kb, vb = np.split(np.asarray(qkv_b), 3, axis=0)
    return {
        "q_proj": {"kernel": qw.T.reshape(width, heads, dh), "bias": qb.reshape(heads, dh)},
        "k_proj": {"kernel": kw.T.reshape(width, heads, dh), "bias": kb.reshape(heads, dh)},
        "v_proj": {"kernel": vw.T.reshape(width, heads, dh), "bias": vb.reshape(heads, dh)},
        "out_proj": {
            "kernel": np.asarray(proj_w).T.reshape(heads, dh, width),
            "bias": np.asarray(proj_b),
        },
    }


def _ln(state_dict, key) -> Dict:
    return {"scale": np.asarray(state_dict[key + ".weight"]),
            "bias": np.asarray(state_dict[key + ".bias"])}


def _bn(state_dict, key) -> Dict:
    return {
        "scale": np.asarray(state_dict[key + ".weight"]),
        "bias": np.asarray(state_dict[key + ".bias"]),
        "mean": np.asarray(state_dict[key + ".running_mean"]),
        "var": np.asarray(state_dict[key + ".running_var"]),
    }


def _dense(state_dict, key) -> Dict:
    out = {"kernel": np.asarray(state_dict[key + ".weight"]).T}
    if key + ".bias" in state_dict:
        out["bias"] = np.asarray(state_dict[key + ".bias"])
    return out


def _conv(state_dict, key) -> Dict:
    w = np.asarray(state_dict[key + ".weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if key + ".bias" in state_dict:
        out["bias"] = np.asarray(state_dict[key + ".bias"])
    return out


def _dwconv(state_dict, key) -> Dict:
    # torch depthwise (C, 1, kh, kw) -> flax grouped-conv HWIO (kh, kw, 1, C)
    w = np.asarray(state_dict[key + ".weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if key + ".bias" in state_dict:
        out["bias"] = np.asarray(state_dict[key + ".bias"])
    return out


def convert_torch_vit_adapter(
    state_dict: Dict[str, "np.ndarray"],
    depth: int = 24,
    num_heads: int = 16,
    num_interactions: int = 4,
    prefix: str = "backbone.",
) -> Dict:
    """Reference ViT-Adapter (DINOv2) state_dict -> flax ViTAdapter params.

    Key layout: ``backbone.vit_module.*`` (DinoVisionTransformer,
    backbones_vitAdapter/backbones.py:36; chunked ``blocks.C.N`` keys are
    normalized to flat ``blocks.N``), ``backbone.spm.*`` / ``interactions.*``
    / ``up`` / ``norm1..4`` / ``level_embed`` (adapter.py:416-470).

    Note: the reference's ConvFFN shares ONE depthwise conv across the three
    pyramid levels (adapter.py:83-99); ours mirrors that with a single
    ``dwconv`` applied per level grid."""
    sd = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        # normalize chunked vit blocks: vit_module.blocks.C.N. -> vit_module.blocks.N.
        if k.startswith("vit_module.blocks."):
            parts = k.split(".")
            if parts[3].isdigit() and parts[2].isdigit():
                k = ".".join(parts[:2] + parts[3:])
        sd[k] = np.asarray(v)

    p: Dict[str, Any] = {}

    # --- ViT trunk ---
    vit: Dict[str, Any] = {
        "cls_token": sd["vit_module.cls_token"],
        "pos_embed": sd["vit_module.pos_embed"],
        "patch_embed": _conv(sd, "vit_module.patch_embed.proj"),
    }
    for i in range(depth):
        b = f"vit_module.blocks.{i}"
        vit[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": _mha_from_torch(
                sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"],
                sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"], num_heads,
            ),
            "ls1": {"gamma": sd[f"{b}.ls1.gamma"]},
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp_fc1": _dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}.mlp.fc2"),
            "ls2": {"gamma": sd[f"{b}.ls2.gamma"]},
        }
    p["vit"] = vit

    # --- Spatial prior module ---
    p["spm"] = {
        "stem1_conv": _conv(sd, "spm.stem.0"),
        "stem1_bn": _bn(sd, "spm.stem.1"),
        "stem2_conv": _conv(sd, "spm.stem.3"),
        "stem2_bn": _bn(sd, "spm.stem.4"),
        "stem3_conv": _conv(sd, "spm.stem.6"),
        "stem3_bn": _bn(sd, "spm.stem.7"),
        "conv2_conv": _conv(sd, "spm.conv2.0"),
        "conv2_bn": _bn(sd, "spm.conv2.1"),
        "conv3_conv": _conv(sd, "spm.conv3.0"),
        "conv3_bn": _bn(sd, "spm.conv3.1"),
        "conv4_conv": _conv(sd, "spm.conv4.0"),
        "conv4_bn": _bn(sd, "spm.conv4.1"),
        "fc1": _conv(sd, "spm.fc1"),
        "fc2": _conv(sd, "spm.fc2"),
        "fc3": _conv(sd, "spm.fc3"),
        "fc4": _conv(sd, "spm.fc4"),
    }

    def deform_attn(pre):
        return {
            "value_proj": _dense(sd, f"{pre}.value_proj"),
            "sampling_offsets": _dense(sd, f"{pre}.sampling_offsets"),
            "attention_weights": _dense(sd, f"{pre}.attention_weights"),
            "output_proj": _dense(sd, f"{pre}.output_proj"),
        }

    def extractor(pre):
        out = {
            "query_norm": _ln(sd, f"{pre}.query_norm"),
            "feat_norm": _ln(sd, f"{pre}.feat_norm"),
            "attn": deform_attn(f"{pre}.attn"),
        }
        if f"{pre}.ffn.fc1.weight" in sd:
            out["ffn_norm"] = _ln(sd, f"{pre}.ffn_norm")
            out["ffn"] = {
                "fc1": _dense(sd, f"{pre}.ffn.fc1"),
                "fc2": _dense(sd, f"{pre}.ffn.fc2"),
                "dwconv": _dwconv(sd, f"{pre}.ffn.dwconv.dwconv"),
            }
        return out

    extra_j = 0
    for i in range(num_interactions):
        pre = f"interactions.{i}"
        # the shipped configs use InteractionBlockWithCls_Efficient
        # (adapter.py:245-262) which has NO injector; keys present only for
        # the plain InteractionBlockWithCls variant
        if f"{pre}.injector.gamma" in sd:
            p[f"injector_{i}"] = {
                "query_norm": _ln(sd, f"{pre}.injector.query_norm"),
                "feat_norm": _ln(sd, f"{pre}.injector.feat_norm"),
                "attn": deform_attn(f"{pre}.injector.attn"),
                "gamma": sd[f"{pre}.injector.gamma"],
            }
        p[f"extractor_{i}"] = extractor(f"{pre}.extractor")
        j = 0
        while f"{pre}.extra_extractors.{j}.query_norm.weight" in sd:
            p[f"extra_extractor_{extra_j}"] = extractor(f"{pre}.extra_extractors.{j}")
            j += 1
            extra_j += 1

    # --- heads ---
    # torch ConvTranspose2d stores (C_in, C_out, kH, kW) and places the tap
    # (kh, kw) of input pixel (i, j) at output (s*i+kh, s*j+kw); flax's
    # ConvTranspose (lax.conv_transpose, transpose_kernel=False) places the
    # spatially MIRRORED tap there, so the kernel must be flipped on kH/kW.
    up_w = sd["up.weight"][:, :, ::-1, ::-1]
    p["up"] = {"kernel": np.transpose(up_w, (2, 3, 0, 1)), "bias": sd["up.bias"]}
    for n in (1, 2, 3, 4):
        p[f"norm{n}"] = _bn(sd, f"norm{n}")
    p["level_embed"] = sd["level_embed"]
    return {"params": p}
