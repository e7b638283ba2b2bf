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


def load_weights(path: str, params: Dict, subtree: Optional[str] = None) -> Dict:
    """Partial params load: entries present in the checkpoint override the
    template; missing entries keep their (fresh) initialization — matching
    DetectionCheckpointer's non-strict load used for stage chaining."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    loaded = ckptr.restore(os.path.abspath(path))
    if subtree:
        for k in subtree.split("/"):
            loaded = loaded[k]

    flat_params = _flatten(params)
    flat_loaded = _flatten(loaded)
    merged = dict(flat_params)
    for k, v in flat_loaded.items():
        if k in merged and merged[k].shape == v.shape:
            merged[k] = v
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
