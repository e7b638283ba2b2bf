"""Full-model reference checkpoint -> flax params conversion.

Maps the reference zoo ``.pth`` key space (loaded non-strict by
``DetectionCheckpointer.resume_or_load``, DVIS_Plus/train_net_video.py:303-305;
strict in the demo, demo_video/predictor.py:212-215) onto our model trees:

  backbone.*                    -> segmenter/backbone      (d2 ResNet | Swin | ViT-Adapter)
  sem_seg_head.pixel_decoder.*  -> segmenter/pixel_decoder (msdeformattn.py naming)
  sem_seg_head.predictor.*      -> segmenter/transformer_decoder
                                   (video_mask2former_transformer_decoder.py)
  tracker.*                     -> tracker                 (dvis_Plus/tracker.py)
  refiner.*                     -> refiner                 (dvis_Plus/refiner.py)

Use :func:`convert_reference_checkpoint` for a whole model (online/offline),
or the per-component functions for partial ports. All outputs are
numpy-valued flax param subtrees matching our module names.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from dvis_plus_tpu.core.checkpoint import (
    _bn,
    _conv,
    _dense,
    _ln,
    _mha_from_torch,
    convert_torch_swin,
    convert_torch_vit_adapter,
)


def _sub(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _gn(sd, key) -> Dict:
    return {"scale": np.asarray(sd[key + ".weight"]), "bias": np.asarray(sd[key + ".bias"])}


def _mlp(sd, key, n=3) -> Dict:
    """torch MLP(...).layers.{i} -> our MLP layer_{i}."""
    return {f"layer_{i}": _dense(sd, f"{key}.layers.{i}") for i in range(n)}


def _self_attn_layer(sd, pre, heads) -> Dict:
    return {
        "attn": _mha_from_torch(
            sd[f"{pre}.self_attn.in_proj_weight"], sd[f"{pre}.self_attn.in_proj_bias"],
            sd[f"{pre}.self_attn.out_proj.weight"], sd[f"{pre}.self_attn.out_proj.bias"],
            heads,
        ),
        "norm": _ln(sd, f"{pre}.norm"),
    }


def _cross_attn_layer(sd, pre, heads) -> Dict:
    return {
        "attn": _mha_from_torch(
            sd[f"{pre}.multihead_attn.in_proj_weight"], sd[f"{pre}.multihead_attn.in_proj_bias"],
            sd[f"{pre}.multihead_attn.out_proj.weight"], sd[f"{pre}.multihead_attn.out_proj.bias"],
            heads,
        ),
        "norm": _ln(sd, f"{pre}.norm"),
    }


def _ffn_layer(sd, pre) -> Dict:
    return {
        "linear1": _dense(sd, f"{pre}.linear1"),
        "linear2": _dense(sd, f"{pre}.linear2"),
        "norm": _ln(sd, f"{pre}.norm"),
    }


def convert_d2_resnet(sd: Dict[str, np.ndarray], depths=(3, 4, 6, 3)) -> Dict:
    """detectron2-style ResNet keys (``stem.conv1``, ``res2.0.conv1`` with
    attached ``.norm``) -> flax ResNet params (zoo checkpoints use this
    naming, unlike torchvision's ``layer1.0``)."""
    p: Dict[str, Any] = {
        "stem_conv1": {"kernel": np.transpose(np.asarray(sd["stem.conv1.weight"]), (2, 3, 1, 0))},
        "stem_norm1": _bn(sd, "stem.conv1.norm"),
    }
    for s, depth in enumerate(depths):
        for b in range(depth):
            pre = f"res{s + 2}.{b}"
            blk: Dict[str, Any] = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = {
                    "kernel": np.transpose(np.asarray(sd[f"{pre}.conv{i}.weight"]), (2, 3, 1, 0))
                }
                blk[f"norm{i}"] = _bn(sd, f"{pre}.conv{i}.norm")
            if f"{pre}.shortcut.weight" in sd:
                blk["shortcut"] = {
                    "kernel": np.transpose(np.asarray(sd[f"{pre}.shortcut.weight"]), (2, 3, 1, 0))
                }
                blk["shortcut_norm"] = _bn(sd, f"{pre}.shortcut.norm")
            p[f"res{s + 2}_block{b}"] = blk
    return p


def convert_pixel_decoder(sd: Dict[str, np.ndarray], num_enc_layers: int = 6,
                          num_levels: int = 3) -> Dict:
    """``sem_seg_head.pixel_decoder.*`` (msdeformattn.py:164-358) -> our
    MSDeformAttnPixelDecoder params."""
    p: Dict[str, Any] = {}
    for i in range(num_levels):
        p[f"input_proj_{i}_conv"] = _conv(sd, f"input_proj.{i}.0")
        p[f"input_proj_{i}_norm"] = _gn(sd, f"input_proj.{i}.1")
    p["level_embed"] = np.asarray(sd["transformer.level_embed"])
    for li in range(num_enc_layers):
        pre = f"transformer.encoder.layers.{li}"
        p[f"encoder_layer_{li}"] = {
            "value_proj": _dense(sd, f"{pre}.self_attn.value_proj"),
            "sampling_offsets": _dense(sd, f"{pre}.self_attn.sampling_offsets"),
            "attention_weights": _dense(sd, f"{pre}.self_attn.attention_weights"),
            "output_proj": _dense(sd, f"{pre}.self_attn.output_proj"),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "linear1": _dense(sd, f"{pre}.linear1"),
            "linear2": _dense(sd, f"{pre}.linear2"),
            "norm2": _ln(sd, f"{pre}.norm2"),
        }
    p["mask_features"] = _conv(sd, "mask_features")
    # FPN lateral/output for res2 (adapter_1 / layer_1, d2 Conv2d w/ GN)
    p["adapter_1"] = {"conv": _conv(sd, "adapter_1"), "norm": _gn(sd, "adapter_1.norm")}
    p["layer_1"] = {"conv": _conv(sd, "layer_1"), "norm": _gn(sd, "layer_1.norm")}
    return p


def convert_predictor(sd: Dict[str, np.ndarray], num_layers: int = 9,
                      heads: int = 8, num_levels: int = 3,
                      reid: bool = False) -> Dict:
    """``sem_seg_head.predictor.*`` (the DVIS video decoder variants,
    dvis_Plus/video_mask2former_transformer_decoder.py) -> our
    MaskedTransformerDecoder params."""
    p: Dict[str, Any] = {
        "query_feat": np.asarray(sd["query_feat.weight"]),
        "query_embed": np.asarray(sd["query_embed.weight"]),
        "level_embed": np.asarray(sd["level_embed.weight"]),
        "decoder_norm": _ln(sd, "decoder_norm"),
        "class_embed": _dense(sd, "class_embed"),
        "mask_embed": _mlp(sd, "mask_embed"),
    }
    for i in range(num_levels):
        if f"input_proj.{i}.weight" in sd:
            p[f"input_proj_{i}"] = _conv(sd, f"input_proj.{i}")
    for i in range(num_layers):
        p[f"self_{i}"] = _self_attn_layer(sd, f"transformer_self_attention_layers.{i}", heads)
        p[f"cross_{i}"] = _cross_attn_layer(sd, f"transformer_cross_attention_layers.{i}", heads)
        p[f"ffn_{i}"] = _ffn_layer(sd, f"transformer_ffn_layers.{i}")
    if reid and "reid_embed.layers.0.weight" in sd:
        p["reid_embed"] = _mlp(sd, "reid_embed")
    return p


def convert_tracker(sd: Dict[str, np.ndarray], num_layers: int = 6,
                    heads: int = 8) -> Dict:
    """``tracker.*`` (dvis_Plus/tracker.py:94-379) -> our ReferringTracker.

    The tracker runs under an ``nn.scan`` over frames (module name
    ``frame_step``) with broadcast params — the per-layer weights live under
    ``frame_step/``."""
    step: Dict[str, Any] = {}
    for i in range(num_layers):
        step[f"self_{i}"] = _self_attn_layer(sd, f"transformer_self_attention_layers.{i}", heads)
        step[f"cross_{i}"] = _cross_attn_layer(sd, f"transformer_cross_attention_layers.{i}", heads)
        step[f"ffn_{i}"] = _ffn_layer(sd, f"transformer_ffn_layers.{i}")
    step["ref_proj"] = _mlp(sd, "ref_proj")
    p: Dict[str, Any] = {"frame_step": step}
    p["decoder_norm"] = _ln(sd, "decoder_norm")
    p["class_embed"] = _dense(sd, "class_embed")
    p["mask_embed"] = _mlp(sd, "mask_embed")
    # reference mask_feature_proj is a 1x1 Conv2d; ours a Dense
    w = np.asarray(sd["mask_feature_proj.weight"])  # (C_out, C_in, 1, 1)
    p["mask_feature_proj"] = {
        "kernel": w[:, :, 0, 0].T,
        "bias": np.asarray(sd["mask_feature_proj.bias"]),
    }
    return p


def _refiner_body(sd: Dict[str, np.ndarray], num_layers: int,
                  heads: int) -> Dict:
    """The refiner transformer body + shared heads (everything except the
    class head, which differs between close-vocab and OV variants)."""

    def conv1d(key):
        w = np.asarray(sd[key + ".weight"])  # (C_out, C_in, k)
        return {"kernel": np.transpose(w, (2, 1, 0)), "bias": np.asarray(sd[key + ".bias"])}

    p: Dict[str, Any] = {}
    for i in range(num_layers):
        p[f"time_self_{i}"] = _self_attn_layer(
            sd, f"transformer_time_self_attention_layers.{i}", heads
        )
        p[f"obj_self_{i}"] = _self_attn_layer(
            sd, f"transformer_obj_self_attention_layers.{i}", heads
        )
        p[f"cross_{i}"] = _cross_attn_layer(
            sd, f"transformer_cross_attention_layers.{i}", heads
        )
        p[f"ffn_{i}"] = _ffn_layer(sd, f"transformer_ffn_layers.{i}")
        p[f"conv_{i}"] = {
            "conv1": conv1d(f"conv_short_aggregate_layers.{i}.0"),
            "conv2": conv1d(f"conv_short_aggregate_layers.{i}.2"),
            "norm": _ln(sd, f"conv_norms.{i}"),
        }
    p["decoder_norm"] = _ln(sd, "decoder_norm")
    p["mask_embed"] = _mlp(sd, "mask_embed")
    p["activation_proj"] = _dense(sd, "activation_proj")
    return p


def convert_refiner(sd: Dict[str, np.ndarray], num_layers: int = 6,
                    heads: int = 8) -> Dict:
    """``refiner.*`` (dvis_Plus/refiner.py:6-227) -> our TemporalRefiner."""
    p = _refiner_body(sd, num_layers, heads)
    p["class_embed"] = _dense(sd, "class_embed")
    return p


def _ov_head(sd: Dict[str, np.ndarray]) -> Dict:
    """The FC-CLIP class head key group (ov_dvis/video_mask2former_
    transformer_decoder_ov.py:199-205: ``_mask_pooling_proj`` = LayerNorm +
    Linear, ``class_embed`` = 3-layer MLP into CLIP space, ``logit_scale``).
    The reference attaches ONE instance to the segmenter predictor and shares
    the module objects with tracker/refiner (meta_architecture_ov.py:
    1110-1122, 1906-1933) — torch re-registers shared modules under each
    parent, so every subtree carries identical copies of these keys."""
    return {
        "maskpool_norm": _ln(sd, "_mask_pooling_proj.0"),
        "maskpool_proj": _dense(sd, "_mask_pooling_proj.1"),
        "class_embed": _mlp(sd, "class_embed"),
        "logit_scale": np.asarray(sd["logit_scale"]),
    }


def convert_ov_decoder(sd: Dict[str, np.ndarray], num_layers: int = 9,
                       heads: int = 8, num_levels: int = 3) -> Dict:
    """``sem_seg_head.predictor.*`` of an OV checkpoint
    (``VideoMultiScaleMaskedTransformerDecoder_dvis_OV``/``_minvis_OV``,
    ov_dvis/video_mask2former_transformer_decoder_ov.py:70-377) -> our
    OVMaskedTransformerDecoder params."""
    p: Dict[str, Any] = {
        "query_feat": np.asarray(sd["query_feat.weight"]),
        "query_embed": np.asarray(sd["query_embed.weight"]),
        "level_embed": np.asarray(sd["level_embed.weight"]),
        "decoder_norm": _ln(sd, "decoder_norm"),
        "mask_embed": _mlp(sd, "mask_embed"),
        "ov_head": _ov_head(sd),
    }
    for i in range(num_levels):
        if f"input_proj.{i}.weight" in sd:
            p[f"input_proj_{i}"] = _conv(sd, f"input_proj.{i}")
    for i in range(num_layers):
        p[f"self_{i}"] = _self_attn_layer(sd, f"transformer_self_attention_layers.{i}", heads)
        p[f"cross_{i}"] = _cross_attn_layer(sd, f"transformer_cross_attention_layers.{i}", heads)
        p[f"ffn_{i}"] = _ffn_layer(sd, f"transformer_ffn_layers.{i}")
    return p


def convert_ov_tracker(sd: Dict[str, np.ndarray], num_layers: int = 6,
                       heads: int = 8) -> Dict:
    """``tracker.*`` of an OV checkpoint (``ReferringTracker_noiser_OV``,
    ov_dvis/video_dvis_modules_ov.py:28-313) -> our ReferringTracker(ov=True).
    No ``mask_feature_proj`` (OV pools raw mask features) and no (K+1) class
    head; instead ``merge`` + the shared FC-CLIP head re-registered under
    ``tracker.*``."""
    step: Dict[str, Any] = {}
    for i in range(num_layers):
        step[f"self_{i}"] = _self_attn_layer(sd, f"transformer_self_attention_layers.{i}", heads)
        step[f"cross_{i}"] = _cross_attn_layer(sd, f"transformer_cross_attention_layers.{i}", heads)
        step[f"ffn_{i}"] = _ffn_layer(sd, f"transformer_ffn_layers.{i}")
    step["ref_proj"] = _mlp(sd, "ref_proj")
    head = _ov_head(sd)
    return {
        "frame_step": step,
        "decoder_norm": _ln(sd, "decoder_norm"),
        "mask_embed": _mlp(sd, "mask_embed"),
        "merge": _dense(sd, "merge"),
        "maskpool_norm": head["maskpool_norm"],
        "maskpool_proj": head["maskpool_proj"],
        "class_embed_ov": head["class_embed"],
        "logit_scale": head["logit_scale"],
    }


def convert_ov_refiner(sd: Dict[str, np.ndarray], num_layers: int = 6,
                       heads: int = 8) -> Dict:
    """``refiner.*`` of an OV checkpoint (``TemporalRefiner_OV``,
    ov_dvis/video_dvis_modules_ov.py:315-599) -> our TemporalRefiner(ov=True).
    Same transformer body as the close-vocab refiner; the class head is the
    shared FC-CLIP group re-registered under ``refiner.*``."""
    p = _refiner_body(sd, num_layers, heads)
    head = _ov_head(sd)
    p["maskpool_norm"] = head["maskpool_norm"]
    p["maskpool_proj"] = head["maskpool_proj"]
    p["class_embed_ov"] = head["class_embed"]
    p["logit_scale"] = head["logit_scale"]
    return p


def convert_daq_cutter(sd: Dict[str, np.ndarray], num_layers: int = 6,
                       heads: int = 8) -> Dict:
    """``tracker.*`` of a DVIS-DAQ checkpoint (the ``VideoInstanceCutter``,
    DVIS_DAQ/dvis_daq/track_module.py:102-231) -> our slot-table cutter
    params (models/daq/cutter.py). The slot branch's ``SlotCrossAttentionLayer``
    (dvis_daq/slot_attention.py:89-170) carries an inner single-iteration
    ``SlotAttention`` with a LayerNorm+Linear q projection (``project_q.0/1``)
    and a bias-free k projection."""
    p: Dict[str, Any] = {}
    for i in range(num_layers):
        p[f"self_{i}"] = _self_attn_layer(
            sd, f"transformer_self_attention_layers.{i}", heads
        )
        p[f"cross_{i}"] = _cross_attn_layer(
            sd, f"transformer_cross_attention_layers.{i}", heads
        )
        p[f"ffn_{i}"] = _ffn_layer(sd, f"transformer_ffn_layers.{i}")
        pre = f"slot_cross_attention_layers.{i}"
        p[f"slot_cross_{i}"] = {
            "attn": _mha_from_torch(
                sd[f"{pre}.multihead_attn.in_proj_weight"],
                sd[f"{pre}.multihead_attn.in_proj_bias"],
                sd[f"{pre}.multihead_attn.out_proj.weight"],
                sd[f"{pre}.multihead_attn.out_proj.bias"],
                heads,
            ),
            "norm": _ln(sd, f"{pre}.norm"),
            "slot_attn": {
                "norm_inputs": _ln(sd, f"{pre}.slot_attn.norm_inputs"),
                "project_q_norm": _ln(sd, f"{pre}.slot_attn.project_q.0"),
                "project_q_dense": {
                    "kernel": np.asarray(sd[f"{pre}.slot_attn.project_q.1.weight"]).T
                },
                "project_k": {
                    "kernel": np.asarray(sd[f"{pre}.slot_attn.project_k.weight"]).T
                },
            },
        }
        p[f"slot_ffn_{i}"] = _ffn_layer(sd, f"slot_ffn_layers.{i}")
    p["decoder_norm"] = _ln(sd, "decoder_norm")
    p["class_embed"] = _dense(sd, "class_embed")
    p["mask_embed"] = _mlp(sd, "mask_embed")
    p["pos_embed"] = _mlp(sd, "pos_embed")
    # reference mask_feature_proj is a 1x1 Conv2d; ours a Dense
    w = np.asarray(sd["mask_feature_proj.weight"])  # (C_out, C_in, 1, 1)
    p["mask_feature_proj"] = {
        "kernel": w[:, :, 0, 0].T,
        "bias": np.asarray(sd["mask_feature_proj.bias"]),
    }
    p["new_ins_embeds"] = np.asarray(sd["new_ins_embeds.weight"])  # (1, C)
    p["bg_slots"] = np.asarray(sd["bg_slots.weight"])  # (num_slots, C)
    return p


def convert_clip_visual_head(clip_sd: Dict[str, np.ndarray]) -> Dict:
    """open_clip ConvNeXt-d projection head (``visual.trunk.head.norm`` +
    ``visual.head.mlp.fc1/fc2``, applied in that order by the reference's
    ``visual_prediction_forward_convnext``, ov_dvis/backbones/clip.py:147-152)
    -> our CLIPVisualHead params."""
    return {
        "head_norm": _ln(clip_sd, "visual.trunk.head.norm"),
        "proj_fc1": _dense(clip_sd, "visual.head.mlp.fc1"),
        "proj_fc2": _dense(clip_sd, "visual.head.mlp.fc2"),
    }


def convert_ov_segmenter(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Whole-OV-segmenter (``MinVIS_OV`` key space, meta_architecture_ov.py):
    frozen CLIP ConvNeXt backbone + pixel decoder + OV predictor + the learned
    void embedding rows (``void_embedding`` + ``additional_void_embedding``,
    :152-157) -> our OVSegmenter params."""
    from dvis_plus_tpu.models.ov.clip_backbone import (
        convert_clip_attnpool,
        convert_open_clip_convnext,
        convert_open_clip_resnet,
    )

    td = cfg.model.transformer_decoder
    clip_sd = _sub(sd, "backbone.clip_model.")
    if cfg.model.backbone.clip_model_type == "resnet":
        backbone = {
            "trunk": convert_open_clip_resnet(
                clip_sd, layers=tuple(cfg.model.backbone.clip_depths)
            ),
            "attnpool": convert_clip_attnpool(clip_sd),
            "logit_scale": np.asarray(clip_sd["logit_scale"]),
        }
    else:
        backbone = {
            "trunk": convert_open_clip_convnext(
                clip_sd, depths=tuple(cfg.model.backbone.clip_depths)
            ),
            "visual_head": convert_clip_visual_head(clip_sd),
            "logit_scale": np.asarray(clip_sd["logit_scale"]),
        }
    void = [np.asarray(sd["void_embedding.weight"])]
    if "additional_void_embedding.weight" in sd:
        void.append(np.asarray(sd["additional_void_embedding.weight"]))
    return {
        "backbone": backbone,
        "pixel_decoder": convert_pixel_decoder(
            _sub(sd, "sem_seg_head.pixel_decoder."),
            num_enc_layers=cfg.model.pixel_decoder.transformer_enc_layers,
        ),
        "transformer_decoder": convert_ov_decoder(
            _sub(sd, "sem_seg_head.predictor."),
            num_layers=td.dec_layers,
            heads=td.nheads,
        ),
        "void_embedding": np.concatenate(void, axis=0),
    }


def convert_reference_checkpoint(state_dict: Dict[str, np.ndarray], cfg) -> Dict:
    """Whole-model conversion routed by the config's architecture. Returns a
    ``{"params": ...}`` tree shaped for our meta-architectures (Segmenter /
    DVISOnline / DVISOffline and the OV variants)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    td = cfg.model.transformer_decoder

    arch = cfg.model.meta_architecture
    if arch in ("minvis_ov", "dvis_online_ov", "dvis_offline_ov"):
        seg = convert_ov_segmenter(sd, cfg)
        if arch == "minvis_ov":
            return {"params": seg}
        tracker = convert_ov_tracker(
            _sub(sd, "tracker."), num_layers=cfg.model.tracker.num_layers,
            heads=cfg.model.tracker.num_heads,
        )
        if arch == "dvis_online_ov":
            return {"params": {"segmenter": seg, "tracker": tracker}}
        refiner = convert_ov_refiner(
            _sub(sd, "refiner."), num_layers=cfg.model.refiner.num_layers,
            heads=cfg.model.refiner.num_heads,
        )
        return {
            "params": {
                "online": {"segmenter": seg, "tracker": tracker},
                "refiner": refiner,
            }
        }

    name = cfg.model.backbone.name
    if name.startswith("resnet"):
        depths = (3, 4, 6, 3) if name == "resnet50" else (3, 4, 23, 3)
        backbone = convert_d2_resnet(_sub(sd, "backbone."), depths)
    elif name.startswith("swin"):
        depth_map = {
            "swin_t": (2, 2, 6, 2), "swin_s": (2, 2, 18, 2),
            "swin_b": (2, 2, 18, 2), "swin_l": (2, 2, 18, 2),
        }
        backbone = convert_torch_swin(sd, depth_map[name])["params"]
    elif name == "vit_adapter_dinov2":
        backbone = convert_torch_vit_adapter(
            sd, depth=cfg.model.backbone.vit_depth,
            num_heads=cfg.model.backbone.vit_deform_num_heads,
            num_interactions=len(cfg.model.backbone.vit_interaction_indexes),
        )["params"]
    else:
        raise ValueError(f"no zoo converter for backbone {name}")

    seg = {
        "backbone": backbone,
        "pixel_decoder": convert_pixel_decoder(
            _sub(sd, "sem_seg_head.pixel_decoder."),
            num_enc_layers=cfg.model.pixel_decoder.transformer_enc_layers,
        ),
        "transformer_decoder": convert_predictor(
            _sub(sd, "sem_seg_head.predictor."),
            num_layers=td.dec_layers,
            heads=td.nheads,
            reid=td.reid_branch,
        ),
    }

    arch = cfg.model.meta_architecture
    if arch in ("minvis", "ctvis"):
        return {"params": seg}
    if arch in ("daq_online", "daq_offline"):
        # DAQ checkpoints name the cutter ``tracker`` (DVIS_DAQ
        # meta_architecture.py:95); offline adds ``refiner.*`` (:953) whose
        # key space matches the DVIS++ refiner (dvis_daq/refiner.py is the
        # dvis_Plus refiner with padding_embed = nn.Identity, no params)
        cutter = convert_daq_cutter(
            _sub(sd, "tracker."), num_layers=cfg.model.tracker.num_layers,
            heads=cfg.model.tracker.num_heads,
        )
        online = {"segmenter": seg, "cutter": cutter}
        if arch == "daq_online":
            return {"params": online}
        refiner = convert_refiner(
            _sub(sd, "refiner."), num_layers=cfg.model.refiner.num_layers,
            heads=cfg.model.refiner.num_heads,
        )
        return {"params": {"online": online, "refiner": refiner}}
    tracker = convert_tracker(
        _sub(sd, "tracker."), num_layers=cfg.model.tracker.num_layers,
        heads=cfg.model.tracker.num_heads,
    )
    if arch == "dvis_online":
        return {"params": {"segmenter": seg, "tracker": tracker}}
    if arch == "dvis_offline":
        refiner = convert_refiner(
            _sub(sd, "refiner."), num_layers=cfg.model.refiner.num_layers,
            heads=cfg.model.refiner.num_heads,
        )
        return {
            "params": {
                "online": {"segmenter": seg, "tracker": tracker},
                "refiner": refiner,
            }
        }
    raise ValueError(f"no zoo converter for arch {arch}")
