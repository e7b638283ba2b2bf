"""detectron2 / fvcore shims so the ACTUAL reference torch modules run as
numeric oracles on the installed CPU torch.

The reference modules (DVIS_Plus/dvis_Plus/{tracker,refiner}.py,
mask2former/modeling/pixel_decoder/msdeformattn.py,
mask2former_video/.../video_mask2former_transformer_decoder.py, ...) are
nearly pure torch; their only external deps are trivial detectron2/fvcore
utilities and the MSDeformAttn CUDA extension (which falls back to
``ms_deform_attn_core_pytorch`` on CPU, ops/functions/ms_deform_attn_func.py:52-72).
This module:

  1. installs minimal faithful shims for those deps in ``sys.modules``;
  2. loads reference leaf modules WITHOUT executing the heavy package
     ``__init__.py`` chains (hollow-package imports), so no detectron2 data/
     config machinery is needed.

Used by tests/test_reference_parity.py to assert end-to-end activation
parity of the converted model against the reference implementation itself.

NOTE: reads only from /root/reference (read-only mount); nothing here is
shipped in the framework package.
"""
from __future__ import annotations

import dataclasses
import functools
import importlib
import importlib.util
import os
import sys
import types
from typing import Callable, Dict, Optional, Union

REF_ROOT = os.environ.get("DVIS_REFERENCE_ROOT", "/root/reference")


def _mk_module(name: str, path: Optional[str] = None) -> types.ModuleType:
    mod = types.ModuleType(name)
    if path is not None:
        mod.__path__ = [path]  # mark as package for submodule imports
    sys.modules[name] = mod
    return mod


def install_shims() -> None:
    """Register detectron2 / fvcore / MSDA shims in sys.modules (idempotent)."""
    if "detectron2" in sys.modules and getattr(
        sys.modules["detectron2"], "__dvis_tpu_shim__", False
    ):
        return

    import torch
    import torch.nn.functional as F

    # --- MultiScaleDeformableAttention: empty stub. The reference wraps the
    # MSDA.* calls in try/except and falls back to the pure-torch
    # ms_deform_attn_core_pytorch on failure (ms_deform_attn.py:117-121), so
    # an attribute-less module is exactly the "CPU build" behavior.
    if "MultiScaleDeformableAttention" not in sys.modules:
        _mk_module("MultiScaleDeformableAttention")

    # --- detectron2 ------------------------------------------------------
    d2 = _mk_module("detectron2")
    d2.__dvis_tpu_shim__ = True

    # detectron2.config.configurable: with explicit kwargs (our only use) the
    # real decorator is a pass-through to the wrapped __init__.
    d2_config = _mk_module("detectron2.config")

    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            @functools.wraps(init_func)
            def wrapped(self, *args, **kwargs):
                return init_func(self, *args, **kwargs)

            wrapped.from_config = None
            return wrapped

        def wrapper(fn):
            return fn

        return wrapper

    d2_config.configurable = configurable

    # detectron2.layers: Conv2d (+norm/activation), ShapeSpec, get_norm
    d2_layers = _mk_module("detectron2.layers")

    class Conv2d(torch.nn.Conv2d):
        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    @dataclasses.dataclass
    class ShapeSpec:
        channels: Optional[int] = None
        height: Optional[int] = None
        width: Optional[int] = None
        stride: Optional[int] = None

    def get_norm(norm: Union[str, Callable, None], out_channels: int):
        if norm is None or norm == "":
            return None
        if isinstance(norm, str):
            return {
                "BN": lambda c: torch.nn.BatchNorm2d(c),
                "SyncBN": lambda c: torch.nn.BatchNorm2d(c),
                "GN": lambda c: torch.nn.GroupNorm(32, c),
                "LN": lambda c: torch.nn.GroupNorm(1, c),
            }[norm](out_channels)
        return norm(out_channels)

    d2_layers.Conv2d = Conv2d
    d2_layers.ShapeSpec = ShapeSpec
    d2_layers.get_norm = get_norm

    # detectron2.utils.registry.Registry
    d2_utils = _mk_module("detectron2.utils")
    d2_registry = _mk_module("detectron2.utils.registry")

    class Registry:
        def __init__(self, name):
            self._name = name
            self._obj_map: Dict[str, object] = {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._obj_map[cls.__name__] = cls
                    return cls

                return deco
            self._obj_map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._obj_map[name]

    d2_registry.Registry = Registry
    d2_utils.registry = d2_registry

    # detectron2.modeling registries used at class-decoration time
    d2_modeling = _mk_module("detectron2.modeling")
    d2_modeling.SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
    d2_modeling.META_ARCH_REGISTRY = Registry("META_ARCH")
    d2_modeling.BACKBONE_REGISTRY = Registry("BACKBONE")

    d2.config = d2_config
    d2.layers = d2_layers
    d2.utils = d2_utils
    d2.modeling = d2_modeling

    # --- fvcore.nn.weight_init (c2_* fills, detectron2-faithful) ---------
    fvcore = _mk_module("fvcore")
    fvcore_nn = _mk_module("fvcore.nn")
    weight_init = _mk_module("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        torch.nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            torch.nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        torch.nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            torch.nn.init.constant_(module.bias, 0)

    weight_init.c2_xavier_fill = c2_xavier_fill
    weight_init.c2_msra_fill = c2_msra_fill
    fvcore_nn.weight_init = weight_init
    fvcore.nn = fvcore_nn

    # --- detectron2.utils.comm (criterion imports get_world_size) --------
    d2_comm = _mk_module("detectron2.utils.comm")
    d2_comm.get_world_size = lambda: 1
    d2_comm.is_main_process = lambda: True
    d2_utils.comm = d2_comm

    # --- detectron2.projects.point_rend.point_features -------------------
    # Faithful re-implementations of the two functions the video criterion /
    # matcher use (detectron2/projects/point_rend/point_features.py):
    # point_sample = grid_sample on [0,1]^2 coords (align_corners=False), and
    # importance sampling via torch.rand — so a test can drive torch.rand /
    # jax.random.uniform from one shared stream for exact parity.
    d2_projects = _mk_module("detectron2.projects")
    d2_point_rend = _mk_module("detectron2.projects.point_rend")
    d2_point_features = _mk_module("detectron2.projects.point_rend.point_features")

    def point_sample(input, point_coords, **kwargs):
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = F.grid_sample(input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    def get_uncertain_point_coords_with_randomness(
        coarse_logits, uncertainty_func, num_points, oversample_ratio,
        importance_sample_ratio,
    ):
        assert oversample_ratio >= 1
        assert 0 <= importance_sample_ratio <= 1
        num_boxes = coarse_logits.shape[0]
        num_sampled = int(num_points * oversample_ratio)
        point_coords = torch.rand(num_boxes, num_sampled, 2, device=coarse_logits.device)
        point_logits = point_sample(coarse_logits, point_coords, align_corners=False)
        point_uncertainties = uncertainty_func(point_logits)
        num_uncertain_points = int(importance_sample_ratio * num_points)
        num_random_points = num_points - num_uncertain_points
        idx = torch.topk(point_uncertainties[:, 0, :], k=num_uncertain_points, dim=1)[1]
        shift = num_sampled * torch.arange(num_boxes, dtype=torch.long, device=coarse_logits.device)
        idx += shift[:, None]
        point_coords = point_coords.view(-1, 2)[idx.view(-1), :].view(
            num_boxes, num_uncertain_points, 2
        )
        if num_random_points > 0:
            point_coords = torch.cat(
                [
                    point_coords,
                    torch.rand(num_boxes, num_random_points, 2, device=coarse_logits.device),
                ],
                dim=1,
            )
        return point_coords

    d2_point_features.point_sample = point_sample
    d2_point_features.get_uncertain_point_coords_with_randomness = (
        get_uncertain_point_coords_with_randomness
    )
    d2_point_rend.point_features = d2_point_features
    d2_projects.point_rend = d2_point_rend
    d2.projects = d2_projects

    # --- mask2former.utils.misc (imports torchvision; shim the one helper
    # the criterion uses) --------------------------------------------------
    _ensure_pkg("mask2former", os.path.join(REF_ROOT, "DVIS_Plus", "mask2former"))
    _ensure_pkg("mask2former.utils", os.path.join(REF_ROOT, "DVIS_Plus", "mask2former", "utils"))
    m2f_misc = _mk_module("mask2former.utils.misc")
    m2f_misc.is_dist_avail_and_initialized = lambda: False
    sys.modules["mask2former.utils"].misc = m2f_misc

    # --- extras so dvis_Plus.meta_architecture imports as an oracle ------
    # (only its pure-torch inference post-processing methods are exercised;
    # model construction helpers raise if touched)
    d2_data = _mk_module("detectron2.data")

    class _MetadataCatalog:
        _store: Dict[str, object] = {}

        @classmethod
        def get(cls, name):
            return cls._store.setdefault(name, types.SimpleNamespace())

    d2_data.MetadataCatalog = _MetadataCatalog
    d2.data = d2_data

    def _unavailable(*args, **kwargs):
        raise NotImplementedError("model construction is not shimmed")

    d2_modeling.build_backbone = _unavailable
    d2_modeling.build_sem_seg_head = _unavailable
    d2_backbone = _mk_module("detectron2.modeling.backbone")
    d2_backbone.Backbone = torch.nn.Module
    d2_modeling.backbone = d2_backbone
    # swin.py / adapter.py import these from detectron2.modeling directly
    d2_modeling.Backbone = torch.nn.Module
    d2_modeling.ShapeSpec = ShapeSpec

    d2_structures = _mk_module("detectron2.structures")
    for _n in ("Boxes", "ImageList", "Instances", "BitMasks"):
        setattr(d2_structures, _n, type(_n, (), {}))
    d2.structures = d2_structures


def install_timm_shim() -> None:
    """``timm.models.layers`` stand-ins — timm isn't installed; the reference
    ``swin.py`` / ``adapter.py`` only use these three symbols (DropPath,
    to_2tuple, trunc_normal_), all with standard definitions."""
    if "timm" in sys.modules and getattr(
        sys.modules["timm"], "__dvis_tpu_shim__", False
    ):
        return
    import collections.abc

    import torch

    timm = _mk_module("timm")
    timm.__dvis_tpu_shim__ = True
    timm_models = _mk_module("timm.models")
    timm_layers = _mk_module("timm.models.layers")

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    class DropPath(torch.nn.Module):
        """Per-sample stochastic depth (identity in eval mode — the parity
        oracles run eval-only, so only the identity path is exercised)."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x.div(keep) * mask

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models


def _ensure_pkg(fullname: str, path: str) -> None:
    """Register ``fullname`` as a hollow package rooted at ``path`` without
    executing its __init__.py (the reference package inits pull in the full
    detectron2 data/config surface we don't want)."""
    if fullname not in sys.modules:
        _mk_module(fullname, path)


def load_ref_module(repo: str, modname: str) -> types.ModuleType:
    """Import reference module ``modname`` (e.g. 'dvis_Plus.tracker') from
    reference repo ``repo`` (e.g. 'DVIS_Plus'), executing only the leaf
    module files — every ancestor package is registered hollow."""
    install_shims()
    root = os.path.join(REF_ROOT, repo)
    parts = modname.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        _ensure_pkg(pkg, os.path.join(root, *parts[:i]))
    if modname in sys.modules:
        return sys.modules[modname]
    return importlib.import_module(modname)


def load_dvis_plus_oracles():
    """Import the DVIS++ reference modules needed for activation parity and
    return them as a dict. Wires cross-package attribute imports by hand
    (the hollow packages skip the real __init__.py re-exports)."""
    install_shims()
    repo = "DVIS_Plus"

    # bottom-up: ops/functions first (ms_deform_attn.py does
    # `from ..functions import MSDeformAttnFunction`)
    func_mod = load_ref_module(
        repo, "mask2former.modeling.pixel_decoder.ops.functions.ms_deform_attn_func"
    )
    funcs_pkg = sys.modules["mask2former.modeling.pixel_decoder.ops.functions"]
    funcs_pkg.MSDeformAttnFunction = func_mod.MSDeformAttnFunction
    funcs_pkg.ms_deform_attn_func = func_mod

    msda_mod = load_ref_module(
        repo, "mask2former.modeling.pixel_decoder.ops.modules.ms_deform_attn"
    )
    mods_pkg = sys.modules["mask2former.modeling.pixel_decoder.ops.modules"]
    mods_pkg.MSDeformAttn = msda_mod.MSDeformAttn

    pix_mod = load_ref_module(repo, "mask2former.modeling.pixel_decoder.msdeformattn")
    vid_dec_mod = load_ref_module(
        repo,
        "mask2former_video.modeling.transformer_decoder.video_mask2former_transformer_decoder",
    )
    dvis_dec_mod = load_ref_module(repo, "dvis_Plus.video_mask2former_transformer_decoder")
    tracker_mod = load_ref_module(repo, "dvis_Plus.tracker")
    refiner_mod = load_ref_module(repo, "dvis_Plus.refiner")

    return {
        "ms_deform_attn_core_pytorch": func_mod.ms_deform_attn_core_pytorch,
        "MSDeformAttn": msda_mod.MSDeformAttn,
        "MSDeformAttnPixelDecoder": pix_mod.MSDeformAttnPixelDecoder,
        "VideoMultiScaleMaskedTransformerDecoder": (
            vid_dec_mod.VideoMultiScaleMaskedTransformerDecoder
        ),
        "VideoMultiScaleMaskedTransformerDecoder_dvisPlus": (
            dvis_dec_mod.VideoMultiScaleMaskedTransformerDecoder_dvisPlus
        ),
        "VideoMultiScaleMaskedTransformerDecoder_minvis": (
            dvis_dec_mod.VideoMultiScaleMaskedTransformerDecoder_minvis
        ),
        "ReferringTracker_noiser": tracker_mod.ReferringTracker_noiser,
        "TemporalRefiner": refiner_mod.TemporalRefiner,
        "ShapeSpec": sys.modules["detectron2.layers"].ShapeSpec,
    }


def load_swin_oracle():
    """Reference Swin backbone (mask2former/modeling/backbone/swin.py:498-770)
    as a torch oracle. Returns the plain ``SwinTransformer`` class — the
    ``D2SwinTransformer`` wrapper only reads cfg and filters out_features; the
    numeric content (incl. the per-stage ``norm{i}`` output norms) is all in
    ``SwinTransformer.forward``."""
    install_shims()
    install_timm_shim()
    mod = load_ref_module("DVIS_Plus", "mask2former.modeling.backbone.swin")
    return mod.SwinTransformer


def load_vit_adapter_oracle():
    """Reference DinoV2 ViT-Adapter (backbones_vitAdapter/adapter.py:416-651 +
    backbones.py DinoVisionTransformer) as torch oracles. The adapter's
    MSDeformAttn falls back to the pure-torch core on CPU
    (ops/functions/ms_deform_attn_func.py:52-72). Returns
    (DinoVisionTransformer, DinoV2ViTAdapter)."""
    install_shims()
    install_timm_shim()
    repo = "DVIS_Plus"

    # deformable-attn deps first (adapter.py imports MSDeformAttn)
    func_mod = load_ref_module(
        repo, "mask2former.modeling.pixel_decoder.ops.functions.ms_deform_attn_func"
    )
    funcs_pkg = sys.modules["mask2former.modeling.pixel_decoder.ops.functions"]
    funcs_pkg.MSDeformAttnFunction = func_mod.MSDeformAttnFunction
    funcs_pkg.ms_deform_attn_func = func_mod
    msda_mod = load_ref_module(
        repo, "mask2former.modeling.pixel_decoder.ops.modules.ms_deform_attn"
    )
    mods_pkg = sys.modules["mask2former.modeling.pixel_decoder.ops.modules"]
    mods_pkg.MSDeformAttn = msda_mod.MSDeformAttn

    # dinov2 layers: hand-wire the hollow `layers` package with the names
    # backbones.py re-imports (its real __init__ also pulls dino_head, which
    # we don't need)
    lp = "mask2former.modeling.backbones_vitAdapter.layers"
    wires = {}
    for leaf, names in (
        ("mlp", ("Mlp",)),
        ("patch_embed", ("PatchEmbed",)),
        ("swiglu_ffn", ("SwiGLUFFN", "SwiGLUFFNFused")),
        ("attention", ("MemEffAttention",)),
        ("block", ("NestedTensorBlock",)),
    ):
        m = load_ref_module(repo, f"{lp}.{leaf}")
        for n in names:
            wires[n] = getattr(m, n)
    layers_pkg = sys.modules[lp]
    for n, v in wires.items():
        setattr(layers_pkg, n, v)

    bk_mod = load_ref_module(repo, "mask2former.modeling.backbones_vitAdapter.backbones")
    sys.modules["mask2former.modeling.backbones_vitAdapter"].backbones = bk_mod
    adapter_mod = load_ref_module(repo, "mask2former.modeling.backbones_vitAdapter.adapter")
    return bk_mod.DinoVisionTransformer, adapter_mod.DinoV2ViTAdapter


def patch_cuda_to_cpu() -> None:
    """Redirect ``.to("cuda")`` / ``.to("cuda")``-style device moves to CPU.

    The reference DAQ cutter hard-codes ``.to("cuda")`` in its inference
    bookkeeping (track_module.py:710, :755, readout's empty tensors) — on the
    installed CPU torch these would raise. torch.Tensor is a Python class, so
    the method override is plain attribute assignment (idempotent)."""
    import torch

    if getattr(torch.Tensor.to, "__dvis_tpu_cuda_patch__", False):
        return
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        args = tuple(
            "cpu" if (isinstance(a, str) and a.startswith("cuda")) else a
            for a in args
        )
        dev = kwargs.get("device")
        if isinstance(dev, str) and dev.startswith("cuda"):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    to.__dvis_tpu_cuda_patch__ = True
    torch.Tensor.to = to


def load_daq_oracles():
    """Import the DVIS-DAQ reference modules (slot attention + the
    VideoInstanceCutter track module) as numeric oracles.

    The DAQ repo re-vendors the shared DVIS_Plus trees byte-identically
    (modulo whitespace), so the cutter's cross-package imports
    (``mask2former_video...video_mask2former_transformer_decoder``,
    ``dvis_Plus.tracker``) resolve against the DVIS_Plus-repo modules loaded
    by :func:`load_dvis_plus_oracles`."""
    install_shims()
    patch_cuda_to_cpu()
    load_dvis_plus_oracles()  # provides the shared layer classes

    repo = "DVIS_DAQ"
    slot_mod = load_ref_module(repo, "dvis_daq.slot_attention")
    daq_pkg = sys.modules["dvis_daq"]
    daq_pkg.slot_attention = slot_mod
    track_mod = load_ref_module(repo, "dvis_daq.track_module")

    return {
        "SlotAttention": slot_mod.SlotAttention,
        "SlotCrossAttentionLayer": slot_mod.SlotCrossAttentionLayer,
        "VideoInstanceCutter": track_mod.VideoInstanceCutter,
        "VideoInstanceSequence": track_mod.VideoInstanceSequence,
    }


def load_criterion_oracles():
    """Import the reference training criterion + matchers as numeric oracles
    (mask2former_video/modeling/{criterion,matcher}.py — VideoSetCriterion,
    VideoHungarianMatcher, VideoHungarianMatcher_Consistent). Pure torch plus
    the point_rend / comm / misc shims installed above."""
    install_shims()
    patch_cuda_to_cpu()
    repo = "DVIS_Plus"
    matcher_mod = load_ref_module(repo, "mask2former_video.modeling.matcher")
    vid_pkg = sys.modules["mask2former_video.modeling"]
    vid_pkg.matcher = matcher_mod
    crit_mod = load_ref_module(repo, "mask2former_video.modeling.criterion")
    return {
        "VideoSetCriterion": crit_mod.VideoSetCriterion,
        "VideoHungarianMatcher": matcher_mod.VideoHungarianMatcher,
        "VideoHungarianMatcher_Consistent": matcher_mod.VideoHungarianMatcher_Consistent,
    }


def load_meta_architecture_oracle():
    """Import ``dvis_Plus.meta_architecture`` so its pure-torch inference
    post-processing (inference_video_vps / inference_video_vss / MinVIS
    post-processing) can run as numeric oracles. Model-construction helpers
    are stubbed and raise if touched."""
    load_dvis_plus_oracles()  # shims + hollow packages + tracker/refiner
    repo = "DVIS_Plus"
    matcher_mod = load_ref_module(repo, "mask2former_video.modeling.matcher")
    vid_pkg = sys.modules["mask2former_video.modeling"]
    vid_pkg.matcher = matcher_mod
    vid_pkg.VideoHungarianMatcher = matcher_mod.VideoHungarianMatcher
    vid_pkg.VideoHungarianMatcher_Consistent = matcher_mod.VideoHungarianMatcher_Consistent
    crit_mod = load_ref_module(repo, "mask2former_video.modeling.criterion")
    vid_pkg.criterion = crit_mod
    vid_pkg.VideoSetCriterion = crit_mod.VideoSetCriterion
    mem_mod = load_ref_module(repo, "mask2former_video.utils.memory")
    sys.modules["mask2former_video.utils"].memory = mem_mod
    load_ref_module(repo, "dvis_Plus.utils")
    return load_ref_module(repo, "dvis_Plus.meta_architecture")


def patch_cuda_factories() -> None:
    """Redirect ``device='cuda'`` in torch factory calls to CPU.

    The reference ``TrainTracklet.__init__`` allocates
    ``torch.zeros((256,), device='cuda')`` unconditionally (ctvis.py:461) —
    on the installed CPU torch that raises before any numerics run."""
    import torch

    for name in ("zeros", "ones", "empty", "full", "arange", "tensor"):
        fn = getattr(torch, name)
        if getattr(fn, "__dvis_tpu_cuda_patch__", False):
            continue

        def make(fn):
            def wrapped(*args, **kwargs):
                dev = kwargs.get("device")
                if isinstance(dev, str) and dev.startswith("cuda"):
                    kwargs["device"] = "cpu"
                return fn(*args, **kwargs)

            wrapped.__dvis_tpu_cuda_patch__ = True
            return wrapped

        setattr(torch, name, make(fn))


def load_cl_oracles():
    """Import the reference contrastive/ReID training-loss surfaces as
    numeric oracles (VERDICT r3 missing #2):

    - ``get_cl_loss_ref`` + ``loss_reid`` (the online tracker's ReID CL,
      dvis_Plus/meta_architecture.py:981-1064 + utils.py:51-94)
    - ``get_cl_loss_with_memory`` + ``Outputs_Memory_PerClasses`` (the
      offline refiner's class-memory CL, meta_architecture.py:1502-1579 +
      utils.py:4-49)
    - ``CTCLPlugin`` / ``TrainTracklet`` / ``SimpleTrainMemory`` (the CTVIS
      segmenter-finetuning CL, ctvis.py:451-799)
    - ``Noiser`` (training-time noise modes, noiser.py:6-77)

    All pure torch/numpy/scipy; randomness is pinned by the caller."""
    meta_mod = load_meta_architecture_oracle()
    patch_cuda_factories()
    repo = "DVIS_Plus"
    # ctvis.py additionally imports the IMAGE matcher
    img_matcher_mod = load_ref_module(repo, "mask2former.modeling.matcher")
    sys.modules["mask2former.modeling"].matcher = img_matcher_mod
    utils_mod = sys.modules["dvis_Plus.utils"]
    noiser_mod = load_ref_module(repo, "dvis_Plus.noiser")
    ctvis_mod = load_ref_module(repo, "dvis_Plus.ctvis")
    return {
        "meta_architecture": meta_mod,
        "loss_reid": utils_mod.loss_reid,
        "Outputs_Memory_PerClasses": utils_mod.Outputs_Memory_PerClasses,
        "Noiser": noiser_mod.Noiser,
        "noiser_module": noiser_mod,
        "ctvis_module": ctvis_mod,
        "CTCLPlugin": ctvis_mod.CTCLPlugin,
        "TrainTracklet": ctvis_mod.TrainTracklet,
        "SimpleTrainMemory": ctvis_mod.SimpleTrainMemory,
    }


def load_ov_oracles():
    """Import the OV-DVIS++ reference modules (the OV transformer decoder and
    the OV tracker/refiner, DVIS_Plus/ov_dvis/{video_mask2former_transformer_
    decoder_ov,video_dvis_modules_ov}.py) as numeric oracles. They are pure
    torch + einops; the CLIP backbone (open_clip) is NOT needed — the heads
    take precomputed text classifiers."""
    install_shims()
    patch_cuda_to_cpu()
    load_dvis_plus_oracles()  # shared layer classes + dvis_Plus.{tracker,noiser}

    repo = "DVIS_Plus"
    # registry host for the OV decoder's @register decorator (absolute import
    # in the leaf; load bottom-up so the hollow transformer_decoder package
    # never executes its real __init__)
    pe_mod = load_ref_module(
        repo, "mask2former.modeling.transformer_decoder.position_encoding"
    )
    td_pkg = sys.modules["mask2former.modeling.transformer_decoder"]
    td_pkg.position_encoding = pe_mod
    mtd_mod = load_ref_module(
        repo, "mask2former.modeling.transformer_decoder.maskformer_transformer_decoder"
    )
    td_pkg.maskformer_transformer_decoder = mtd_mod

    dec_mod = load_ref_module(repo, "ov_dvis.video_mask2former_transformer_decoder_ov")
    ov_pkg = sys.modules["ov_dvis"]
    ov_pkg.video_mask2former_transformer_decoder_ov = dec_mod
    mod_mod = load_ref_module(repo, "ov_dvis.video_dvis_modules_ov")

    return {
        "MaskPooling": dec_mod.MaskPooling,
        "VideoMultiScaleMaskedTransformerDecoder_dvis_OV": (
            dec_mod.VideoMultiScaleMaskedTransformerDecoder_dvis_OV
        ),
        "VideoMultiScaleMaskedTransformerDecoder_minvis_OV": (
            dec_mod.VideoMultiScaleMaskedTransformerDecoder_minvis_OV
        ),
        "get_classification_logits": mod_mod.get_classification_logits,
        "ReferringTracker_noiser_OV": mod_mod.ReferringTracker_noiser_OV,
        "TemporalRefiner_OV": mod_mod.TemporalRefiner_OV,
    }


def load_daq_criterion_oracles():
    """Import the reference DAQ training criterion + matchers
    (DVIS_DAQ/dvis_daq/{criterion,matcher}.py — DAQCriterion, FrameMatcher,
    NewInsHungarianMatcher) as numeric oracles. Pure torch + scipy plus the
    point_rend / comm / misc shims installed above."""
    install_shims()
    patch_cuda_to_cpu()
    repo = "DVIS_DAQ"
    matcher_mod = load_ref_module(repo, "dvis_daq.matcher")
    daq_pkg = sys.modules["dvis_daq"]
    daq_pkg.matcher = matcher_mod
    crit_mod = load_ref_module(repo, "dvis_daq.criterion")
    return {
        "DAQCriterion": crit_mod.DAQCriterion,
        "FrameMatcher": matcher_mod.FrameMatcher,
        "NewInsHungarianMatcher": matcher_mod.NewInsHungarianMatcher,
    }


def load_ytvos_eval_oracle():
    """Import the reference YTVIS scoring stack (dvis_Plus/data_video/
    datasets/ytvis_api/{ytvos,ytvoseval}.py — the vendored youtubevos cocoapi)
    as an AP oracle, with ``pycocotools.mask`` backed by OUR native RLE codec
    (utils/rle.py, itself oracle-tested vs numpy). Any AP disagreement then
    isolates to the scoring logic, not the codec."""
    if "pycocotools" not in sys.modules or not getattr(
        sys.modules["pycocotools"], "__dvis_tpu_shim__", False
    ):
        import numpy as np

        from dvis_plus_tpu.utils import rle as _rle

        pc = _mk_module("pycocotools")
        pc.__dvis_tpu_shim__ = True
        mask_mod = _mk_module("pycocotools.mask")

        def _norm(r):
            # our codec takes str/bytes LEB128 counts; json rows carry str
            c = r["counts"]
            return {"size": list(r["size"]),
                    "counts": c if isinstance(c, (str, bytes)) else c}

        mask_mod.area = lambda r: _rle.area(_norm(r))
        mask_mod.decode = lambda r: _rle.decode(_norm(r))
        mask_mod.merge = lambda rs, intersect=False: _rle.merge(
            [_norm(r) for r in rs], bool(intersect)
        )
        mask_mod.frPyObjects = _rle.frPyObjects
        mask_mod.iou = lambda d, g, crowd: _rle.iou(
            [_norm(r) for r in d], [_norm(r) for r in g], list(crowd)
        )

        def _to_bbox(r):
            m = _rle.decode(_norm(r))
            ys, xs = np.nonzero(m)
            if xs.size == 0:
                return np.zeros(4, np.float64)
            x0, y0 = xs.min(), ys.min()
            return np.asarray(
                [x0, y0, xs.max() - x0 + 1, ys.max() - y0 + 1], np.float64
            )

        mask_mod.toBbox = _to_bbox
        pc.mask = mask_mod
        sys.modules["pycocotools.mask"] = mask_mod

    import numpy as _np

    if not hasattr(_np, "float"):  # the vendored cocoapi uses the removed alias
        _np.float = float

    repo = "DVIS_Plus"
    base = "dvis_Plus.data_video.datasets.ytvis_api"
    ytvos_mod = load_ref_module(repo, f"{base}.ytvos")
    sys.modules[base].ytvos = ytvos_mod
    ytvoseval_mod = load_ref_module(repo, f"{base}.ytvoseval")
    return {"YTVOS": ytvos_mod.YTVOS, "YTVOSeval": ytvoseval_mod.YTVOSeval}


def build_torch_d2_resnet50():
    """Torch oracle replicating detectron2's caffe-style ResNet-50 backbone
    (stride-in-1x1 bottlenecks, BN frozen via .eval(), 7x7 stem + maxpool)
    with d2 state-dict naming (stem.conv1.norm.*, res{2-5}.{i}.conv{1-3}.*,
    shortcut.*) so reference-keyed checkpoints load with strict=True.

    Used only as a parity oracle for convert_d2_resnet — the reference
    backbone itself lives in the (uninstalled) detectron2 package."""
    install_shims()
    import torch
    from torch import nn
    import torch.nn.functional as F

    Conv2d = sys.modules["detectron2.layers"].Conv2d

    class Bottleneck(nn.Module):
        def __init__(self, cin, cb, cout, stride):
            super().__init__()
            self.conv1 = Conv2d(cin, cb, 1, stride=stride, bias=False,
                                norm=nn.BatchNorm2d(cb))
            self.conv2 = Conv2d(cb, cb, 3, stride=1, padding=1, bias=False,
                                norm=nn.BatchNorm2d(cb))
            self.conv3 = Conv2d(cb, cout, 1, bias=False, norm=nn.BatchNorm2d(cout))
            if stride != 1 or cin != cout:
                self.shortcut = Conv2d(cin, cout, 1, stride=stride, bias=False,
                                       norm=nn.BatchNorm2d(cout))
            else:
                self.shortcut = None

        def forward(self, x):
            sc = self.shortcut(x) if self.shortcut is not None else x
            y = F.relu(self.conv1(x))
            y = F.relu(self.conv2(y))
            y = self.conv3(y)
            return F.relu(y + sc)

    class Stem(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = Conv2d(3, 64, 7, stride=2, padding=3, bias=False,
                                norm=nn.BatchNorm2d(64))

        def forward(self, x):
            x = F.relu(self.conv1(x))
            return F.max_pool2d(x, kernel_size=3, stride=2, padding=1)

    class R50(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = Stem()
            depths = (3, 4, 6, 3)
            cin = 64
            for s, depth in enumerate(depths):
                cb = 64 * (2 ** s)
                cout = cb * 4
                blocks = []
                for b in range(depth):
                    stride = 2 if (b == 0 and s > 0) else 1
                    blocks.append(Bottleneck(cin if b == 0 else cout, cb, cout, stride))
                setattr(self, f"res{s + 2}", nn.Sequential(*blocks))
                cin = cout

        def forward(self, x):
            x = self.stem(x)
            outs = {}
            for s in range(4):
                x = getattr(self, f"res{s + 2}")(x)
                outs[f"res{s + 2}"] = x
            return outs

    return R50()
