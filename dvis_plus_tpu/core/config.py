"""Config system: nested dataclasses + YAML ``_BASE_`` inheritance + CLI overrides.

Replaces the reference's yacs ``CfgNode`` stack (detectron2 ``get_cfg`` plus the
additive ``add_maskformer2_config`` / ``add_dvis_config`` / ``add_ov_dvis_config`` /
``add_daq_config`` functions — see reference ``DVIS_Plus/dvis_Plus/config.py``,
``DVIS_DAQ/dvis_daq/config.py``) with plain typed dataclasses.

YAML files may contain a ``_BASE_`` key naming a parent YAML (path relative to the
child file); parents chain arbitrarily deep, children override leaves — the same
contract the reference's 194 config YAMLs rely on
(e.g. ``configs/dvis_Plus/ovis/DVIS_Plus_Offline_R50.yaml`` chains
Offline -> Online -> MinVIS -> Base).

CLI overrides are dot-paths: ``model.num_queries=200 solver.base_lr=1e-4``.
"""
from __future__ import annotations

import copy
import dataclasses
import os
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple

import yaml

# ---------------------------------------------------------------------------
# Leaf config groups
# ---------------------------------------------------------------------------


@dataclass
class BackboneConfig:
    """Frame-level feature extractor. Reference registry: BACKBONE_REGISTRY
    (resnet / D2SwinTransformer / D2VitAdapterDinoV2 / CLIP)."""

    name: str = "resnet50"  # resnet50 | swin_{t,s,b,l} | vit_adapter_dinov2 | clip_convnext_l
    # Swin (reference DVIS_Plus/mask2former/config.py MODEL.SWIN.*)
    swin_embed_dim: int = 96
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    swin_num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    swin_window_size: int = 7
    swin_mlp_ratio: float = 4.0
    swin_drop_path_rate: float = 0.3
    swin_patch_size: int = 4
    swin_pretrain_img_size: int = 224
    swin_ape: bool = False
    swin_qkv_bias: bool = True
    swin_fast_softmax: bool = False  # serving-only bf16 attention scores
    # (explicit opt-in; training keeps the fp32-softmax island policy)
    swin_fused_attn: bool = False  # serving-only fused Pallas window
    # attention (ops/swin_window_attn.py; fp32 softmax in VMEM, no VJP)
    # ViT-Adapter (MODEL.VIT_ADAPTER.*)
    vit_embed_dim: int = 1024
    vit_depth: int = 24
    vit_num_heads: int = 16
    vit_patch_size: int = 14
    vit_interaction_indexes: Tuple[Tuple[int, int], ...] = ((0, 5), (6, 11), (12, 17), (18, 23))
    vit_conv_inplane: int = 64
    vit_deform_num_heads: int = 16
    vit_n_points: int = 4
    # reference vitl/vitb adapter args (adapter.py:368-405): ConvFFN enabled,
    # deformable value projections at half width — zoo ViT-L checkpoints
    # carry these params, so the defaults must match to load them
    vit_with_cffn: bool = True
    vit_deform_ratio: float = 0.5
    vit_frozen: bool = True
    vit_flash_attention: bool = False  # serving-only blockwise trunk attention
    vit_extractor_coarse: bool = False  # serving-only coarse stride-8 extractor
    # queries (2x2-pooled + bilinear residual upsample; ~57% fewer deformable
    # gather rows — AP impact measured by tools/serving_deviation_ap.py)
    # (ops/flash_attn.py; parity runs keep the dense fp32-softmax island)
    # CLIP (MODEL.FC_CLIP.*)
    clip_model_name: str = "convnext_large_d_320"
    clip_embed_dim: int = 768
    clip_depths: Tuple[int, ...] = (3, 3, 27, 3)  # ConvNeXt-L trunk depths
    # (for clip_model_type='resnet' these are the ModifiedResNet stage
    # depths, RN50 = (3, 4, 6, 3))
    clip_dims: Tuple[int, ...] = (192, 384, 768, 1536)
    # CLIP visual trunk family (reference extract_features dispatch,
    # ov_dvis/backbones/clip.py:107-117): convnext | resnet
    clip_model_type: str = "convnext"
    clip_resnet_width: int = 64  # RN50 stem width (res5 = width * 32)
    clip_attnpool_spacial: int = 7  # attnpool grid = input_resolution // 32
    freeze: bool = False  # freeze the whole backbone (OV / stage-2+ training)
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")


@dataclass
class PixelDecoderConfig:
    """MSDeformAttn pixel decoder (reference msdeformattn.py:164)."""

    name: str = "msdeform"  # msdeform | fpn
    conv_dim: int = 256
    mask_dim: int = 256
    norm: str = "GN"
    transformer_dropout: float = 0.0
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024
    transformer_enc_layers: int = 6
    transformer_in_features: Tuple[str, ...] = ("res3", "res4", "res5")
    common_stride: int = 4
    num_points: int = 4
    # deformable-attention value dtype: fp32 matches the reference's fp32
    # island; bfloat16 halves gather bytes for ~20% faster encoder layers
    msdeform_value_dtype: str = "float32"
    island_dtype: str = "float32"  # encoder Dense/LN compute dtype; bfloat16
    # = serving fast path (reference island is fp32, autocast disabled)
    # exact (XLA flat gather) | pallas_local (in-kernel-DMA local-window
    # kernel, offsets clamped to +-8 px). Measured v5e, stride-8 level pair:
    # pallas 28.8 ms (bf16 MXU) / 46.4 ms (fp32-exact) vs exact-op fp32
    # 57.7 ms. E2E R50 online 720p: pallas 6.0 fps vs exact+bf16-values
    # 8.3 fps (per-layer fp32 corner-table builds still dominate) — the
    # exact path stays the serving default
    msdeform_impl: str = "exact"


@dataclass
class TransformerDecoderConfig:
    """Masked-attention transformer decoder
    (reference video_mask2former_transformer_decoder.py)."""

    name: str = "dvis_plus"  # base | minvis | dvis | dvis_plus | dvis_ov | minvis_ov
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # 9 decoder layers (10 - 1 in reference counting)
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    reid_branch: bool = False  # dvis_plus adds a ReID MLP head (config.py:REID_BRANCH)
    reid_hidden_dim: int = 512
    num_frames: int = 1


@dataclass
class TrackerConfig:
    """ReferringTracker_noiser (reference dvis_Plus/tracker.py:94)."""

    num_layers: int = 6
    hidden_dim: int = 256
    feedforward_dim: int = 2048
    num_heads: int = 8
    noise_mode: str = "hard"  # none | hard (weighted-average shuffle 'wa' in reference noiser.py)
    noise_ratio: float = 0.5
    mask_dim: int = 256
    matcher_solver: str = "auction"  # frame-alignment LAP: auction | jv (exact,
    # reference scipy semantics — use for parity runs)


@dataclass
class RefinerConfig:
    """TemporalRefiner (reference dvis_Plus/refiner.py:6)."""

    num_layers: int = 6
    hidden_dim: int = 256
    feedforward_dim: int = 2048
    num_heads: int = 8
    mask_dim: int = 256
    window_size: int = 5  # windowed mask prediction chunk (refiner.py:169)


@dataclass
class DAQConfig:
    """DVIS-DAQ video head (reference DVIS_DAQ/dvis_daq/config.py:6-28)."""

    num_new_ins: int = 10
    num_slots: int = 5
    offline_topk_num: int = 20
    mask_nms_thr: float = 0.6
    match_score_thr: float = 0.3
    inference_select_thr: float = 0.1  # INFERENCE_SELECT_THRESHOLD
    aux_inference_select_thr: float = 0.01  # AUX_INFERENCE_SELECT_THRESHOLD
    training_select_thr: float = 0.1  # TRAINING_SELECT_THRESHOLD
    keep_threshold: float = 0.01  # DIS_FG_THRESHOLD (slot-branch survival gate)
    noise_frame_num: int = 1  # drop sequences shorter than this (NOISE_FRAME_NUM)
    kick_out_frame_num: int = 8  # track_module.py:116
    ovis_infer: bool = False  # OVIS_INFER slot-gated survival
    max_num_instances: int = 50  # static capacity of the track-query slot table
    using_frame_num: Tuple[int, ...] = ()  # progressive frame curriculum (INPUT.USING_FRAME_NUM)
    steps: Tuple[int, ...] = ()  # curriculum step boundaries (INPUT.STEPS)
    increasing_step: Tuple[int, ...] = (8000,)  # stage 2 -> 3 switch iteration


@dataclass
class OVConfig:
    """Open-vocabulary head (reference ov_dvis/config.py:11-22)."""

    enabled: bool = False
    geometric_ensemble_alpha: float = 0.4
    geometric_ensemble_beta: float = 0.8
    ensemble_on_valid_mask: bool = False
    clip_embed_dim: int = 768
    test2train: str = ""
    # learned void rows appended to every text classifier — the reference
    # allocates one per training dataset (meta_architecture_ov.py:152-157);
    # multi-dataset supervised recipes set this to len(datasets.train)
    num_void_embeddings: int = 1
    # how to merge the void rows for datasets with no private row (eval on
    # unseen vocabularies; reference void_embedding_merge_mode :181, default
    # 'coco' = row 0): 'coco' | 'mean' | 'max' ('max' keeps all rows as one
    # max-ensembled template group)
    void_merge_mode: str = "coco"


@dataclass
class CriterionConfig:
    """Set criterion + matcher (reference criterion.py / matcher.py)."""

    deep_supervision: bool = True
    no_object_weight: float = 0.1
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    reid_weight: float = 2.0
    aux_reid_weight: float = 3.0
    train_num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    max_num_instances: int = 50  # padded GT capacity per clip
    # jv = exact in-graph JV solver (reference scipy semantics, the default);
    # auction = vectorized auction — measured v5e: far faster at high GT
    # capacity (N=100/Q=200: 0.5 vs 14 ms/solve) but round count blows up on
    # near-uniform costs (e.g. random init), so whole-step impact is
    # workload-dependent. Exact on non-degenerate costs (tested).
    matcher_solver: str = "jv"


@dataclass
class ModelConfig:
    meta_architecture: str = "minvis"  # minvis | ctvis | dvis_online | dvis_offline | *_ov | daq_online | daq_offline
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    sem_seg_head: str = "mask_former"  # mask_former | fcclip
    pixel_decoder: PixelDecoderConfig = field(default_factory=PixelDecoderConfig)
    transformer_decoder: TransformerDecoderConfig = field(default_factory=TransformerDecoderConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    refiner: RefinerConfig = field(default_factory=RefinerConfig)
    daq: DAQConfig = field(default_factory=DAQConfig)
    ov: OVConfig = field(default_factory=OVConfig)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    num_classes: int = 40  # YTVIS-19 default
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    size_divisibility: int = 32
    # dtype policy: bf16 compute with fp32 islands (pixel decoder, matcher, softmax)
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # stage freezing (reference: segmenter frozen for tracker training, etc.)
    freeze: Tuple[str, ...] = ()  # e.g. ("segmenter",) or ("segmenter", "tracker")
    max_iter_fraction_matcher_guided: float = 0.5  # segmenter-guided matching for first half


@dataclass
class SolverConfig:
    ims_per_batch: int = 8  # global #clips
    base_lr: float = 1e-4
    max_iter: int = 40000
    warmup_iters: int = 10
    warmup_factor: float = 1.0
    steps: Tuple[int, ...] = (26000,)
    gamma: float = 0.1
    weight_decay: float = 0.05
    backbone_multiplier: float = 0.1
    clip_gradients_value: float = 0.01  # full-model clip (train_net_video.py:138-216)
    amp: bool = True
    checkpoint_period: int = 5000


@dataclass
class InputConfig:
    sampling_frame_num: int = 5
    sampling_frame_range: int = 2
    sampling_frame_shuffle: bool = False
    sampling_interval: int = 1
    min_size_train: Tuple[int, ...] = (360, 480)
    max_size_train: int = 768
    min_size_test: int = 480
    max_size_test: int = 768
    crop_enabled: bool = False
    random_flip: str = "flip_by_clip"
    augmentations: Tuple[str, ...] = ()
    image_format: str = "RGB"
    pseudo: bool = False  # COCO pseudo-video
    lsj_aug: bool = False


@dataclass
class DatasetsConfig:
    train: Tuple[str, ...] = ("ytvis_2019_train",)
    test: Tuple[str, ...] = ("ytvis_2019_val",)
    dataset_ratio: Tuple[float, ...] = (1.0,)
    dataset_need_map: Tuple[bool, ...] = (False,)
    dataset_type: Tuple[str, ...] = ("video_instance",)
    dataset_type_test: Tuple[str, ...] = ("video_instance",)


@dataclass
class TestConfig:
    task: str = "vis"  # vis | vps | vss | vos | mots
    window_inference: bool = True
    window_size: int = 5
    max_num: int = 20  # top-K instances kept at inference
    object_mask_threshold: float = 0.0
    overlap_threshold: float = 0.8
    # >1 = run the offline refiner's video-level embed pass object-sharded
    # over that many devices (sequence parallel, parallel/sp.py): T^2
    # attention FLOPs and O(T*Q*C) activations divide across the mesh
    refiner_shard_devices: int = 0
    # >1 = video-parallel eval over that many local devices (0 = all):
    # one worker thread per chip, records strided across workers
    # (engine/parallel_eval.py — the single-process analog of the
    # reference's one-DDP-rank-per-GPU inference). Mutually exclusive
    # with refiner_shard_devices.
    eval_devices: int = 1
    # HBM budget (GB) for whole-video eval tensors (offline mask features,
    # online/minvis stride-4 mask accumulation): videos whose tensors exceed
    # it page window-by-window through host fp16 — the TPU-native form of
    # the reference's retry_if_cuda_oom -> CPU fp32 escape hatch
    # (mask2former_video/utils/memory.py:27-80). Env override:
    # DVIS_OFFLINE_MF_BUDGET_GB.
    offline_mf_budget_gb: float = 4.0
    # Overlap each video's host post-processing (top-K upsample download +
    # RLE + evaluator row building) with the NEXT video's device windows via
    # a single worker thread. Results are identical (one video in flight,
    # FIFO); costs up to one extra video of eval tensors in HBM.
    eval_pipeline: bool = True
    # Device->host representation of the top-K eval masks
    # (engine/inference.py::paged_inference_video): "runs" extracts the RLE
    # run boundaries ON DEVICE and downloads only change positions
    # (~2*rle_col_k+2 bytes/column; columns with more transitions fall back
    # to packed, byte-identical either way); "packed" downloads bit-packed
    # pixels (8/byte). The reference downloads full fp16/bool tensors
    # (meta_architecture.py:704).
    mask_download: str = "runs"
    # Per-column transition capacity of the "runs" download.
    rle_col_k: int = 8


@dataclass
class ParallelConfig:
    """Device-mesh layout. The reference is pure DP over NCCL (SURVEY §2.5);
    here DP rides a jax Mesh axis, with an optional model axis for big backbones."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    input: InputConfig = field(default_factory=InputConfig)
    datasets: DatasetsConfig = field(default_factory=DatasetsConfig)
    test: TestConfig = field(default_factory=TestConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    output_dir: str = "./output"
    seed: int = 42
    weights: str = ""  # checkpoint to load (stage chaining)
    # On-TPU tracing window (SURVEY §5.1 trace hooks): non-empty = write an
    # xplane trace for train steps [profile_steps) into this dir, viewable
    # with XProf / tools/profiling/parse_xplane.py. Env override:
    # DVIS_PROFILE_DIR / DVIS_PROFILE_STEPS.
    profile_dir: str = ""
    profile_steps: str = "5-8"
    # Non-empty = persist XLA executables on disk keyed by HLO fingerprint
    # (utils/jax_cache.py), so reruns of the same config skip compilation —
    # the TPU-idiomatic replacement for the reference's "no compile step"
    # torch UX. Env override: DVIS_COMPILE_CACHE_DIR.
    compile_cache_dir: str = ""


# ---------------------------------------------------------------------------
# YAML loading with _BASE_ inheritance + dot-path overrides
# ---------------------------------------------------------------------------


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_chain(path: str) -> Dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base_rel = data.pop("_BASE_", None)
    if base_rel is not None:
        base_path = os.path.join(os.path.dirname(path), base_rel)
        base = _load_yaml_chain(base_path)
        data = _deep_merge(base, data)
    return data


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce YAML/CLI values into the dataclass field's declared type."""
    import typing

    origin = typing.get_origin(typ)
    if origin in (tuple, Tuple):
        args = typing.get_args(typ)
        elem = args[0] if args else Any
        if isinstance(value, str):
            value = [v for v in value.strip("()[]").split(",") if v != ""]
        if elem is Any or elem is Ellipsis:
            return tuple(value)
        return tuple(_coerce(v, elem) for v in value)
    if typ is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if typ is str:
        return str(value)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0])
    return value


def _apply_dict(cfg: Any, data: Dict[str, Any], path: str = "") -> None:
    field_map = {f.name: f for f in fields(cfg)}
    for key, value in data.items():
        key_l = key.lower()
        if key_l not in field_map:
            raise KeyError(f"Unknown config key: {path}{key}")
        f = field_map[key_l]
        cur = getattr(cfg, key_l)
        if is_dataclass(cur) and isinstance(value, dict):
            _apply_dict(cur, value, path=f"{path}{key}.")
        else:
            setattr(cfg, key_l, _coerce(value, f.type_resolved if hasattr(f, "type_resolved") else _resolve_type(cfg, f)))
            # re-set with proper coercion
            setattr(cfg, key_l, _coerce(value, _resolve_type(cfg, f)))


def _resolve_type(cfg: Any, f: dataclasses.Field) -> Any:
    import typing

    hints = typing.get_type_hints(type(cfg))
    return hints.get(f.name, f.type)


def load_config(path: Optional[str] = None, overrides: Optional[List[str]] = None) -> Config:
    """Build a Config from an optional YAML (with _BASE_ chaining) plus
    ``key.path=value`` CLI overrides."""
    cfg = Config()
    if path:
        data = _load_yaml_chain(path)
        _apply_dict(cfg, data)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override must be key.path=value, got: {ov}")
        key, _, value = ov.partition("=")
        node = cfg
        parts = key.strip().lower().split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        f = {f.name: f for f in fields(node)}[parts[-1]]
        try:
            parsed = yaml.safe_load(value)
        except yaml.YAMLError:
            parsed = value
        setattr(node, parts[-1], _coerce(parsed, _resolve_type(node, f)))
    return cfg


def config_to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)


def clone(cfg: Config) -> Config:
    return copy.deepcopy(cfg)
