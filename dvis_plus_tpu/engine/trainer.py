"""Training engine: jitted train step over a device mesh.

Replaces detectron2's ``DefaultTrainer`` loop (reference
``DVIS_Plus/train_net_video.py:218-273`` + d2 internals) with an explicit
functional step:

- one ``train_step(state, batch, rng)`` compiled once; batch arrays are
  sharded over the mesh's data axis, params replicated — XLA inserts the
  gradient all-reduce (the reference's DDP/NCCL role, SURVEY §2.5);
- loss normalizers (num_masks) are global sums over the sharded batch,
  matching the reference's ``all_reduce(num_masks)``
  (mask2former_video/modeling/criterion.py:232-234);
- stage scheduling (matcher guidance until max_iter/2,
  meta_architecture.py:666-673) keys off ``state.step`` inside the graph;
- AMP equivalent: modules compute in bf16 with fp32 islands; params/optimizer
  fp32 throughout (no loss scaling needed on TPU bf16).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.losses.criterion import CriterionConfig
from dvis_plus_tpu.losses.reid import ClassMemory
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.engine.optimizer import (
    make_frozen_predicate,
    make_optimizer,
    warmup_multistep_schedule,
)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    memory: Optional[ClassMemory] = None  # offline CL class memory


class Batch(NamedTuple):
    images: jnp.ndarray  # (B, T, H, W, 3) normalized
    targets: VideoTargets


def criterion_config(cfg: Config) -> CriterionConfig:
    c = cfg.model.criterion
    return CriterionConfig(
        num_classes=cfg.model.num_classes,
        eos_coef=c.no_object_weight,
        class_weight=c.class_weight,
        mask_weight=c.mask_weight,
        dice_weight=c.dice_weight,
        num_points=c.train_num_points,
        oversample_ratio=c.oversample_ratio,
        importance_sample_ratio=c.importance_sample_ratio,
        matcher_solver=c.matcher_solver,
    )


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = warmup_multistep_schedule(
        cfg.solver.base_lr,
        cfg.solver.steps,
        cfg.solver.gamma,
        cfg.solver.warmup_iters,
        cfg.solver.warmup_factor,
    )
    return make_optimizer(
        sched,
        weight_decay=cfg.solver.weight_decay,
        backbone_multiplier=cfg.solver.backbone_multiplier,
        clip_value=cfg.solver.clip_gradients_value,
        frozen_predicate=make_frozen_predicate(cfg.model.freeze),
    )


def build_loss_fn(cfg: Config, model, text_classifier=None, num_templates=None,
                  void_index=None) -> Callable:
    """Returns loss_fn(params, batch, rng, step, memory) ->
    (total, (losses, new_memory)). OV archs close over the per-dataset
    ``text_classifier`` / ``num_templates`` (static arrays built host-side)
    and the dataset's private ``void_index`` (reference
    get_text_classifier_with_void trains row i for dataset i)."""
    arch = cfg.model.meta_architecture
    ccfg = criterion_config(cfg)
    half_iter = cfg.solver.max_iter // 2

    if arch.endswith("_ov"):
        assert text_classifier is not None and num_templates is not None
        # OV criterion: class count follows the dataset's classifier
        # (reference VideoSetCriterion_ov, criterion.py:272-322)
        ccfg = ccfg._replace(num_classes=len(num_templates) - 1)
        tc = jnp.asarray(text_classifier)
        nt = tuple(num_templates)

        if arch == "dvis_online_ov":
            from dvis_plus_tpu.models.meta.dvis_online import dvis_online_train_loss

            def loss_fn(params, batch: Batch, rng, step, memory):
                r1, r2 = jax.random.split(rng)
                seg_out, track_out, _ = model.apply(
                    params, batch.images, tc, nt, rng=r1, training=True,
                    void_index=void_index,
                )
                losses = dvis_online_train_loss(
                    r2, seg_out, track_out, batch.targets, ccfg,
                    use_matcher_guidance=step < half_iter,
                )
                return sum(jax.tree.leaves(losses)), (losses, memory)

            return loss_fn

        if arch == "minvis_ov":
            from dvis_plus_tpu.models.meta.minvis import minvis_train_loss

            def loss_fn(params, batch: Batch, rng, step, memory):
                B, T = batch.images.shape[:2]
                out = model.apply(
                    params,
                    batch.images.reshape((B * T,) + batch.images.shape[2:]),
                    tc,
                    nt,
                    void_index,
                )
                losses = minvis_train_loss(rng, out, batch.targets, ccfg)
                return sum(jax.tree.leaves(losses)), (losses, memory)

            return loss_fn

        if arch == "dvis_offline_ov":
            from dvis_plus_tpu.models.meta.dvis_offline import dvis_offline_train_loss

            def loss_fn(params, batch: Batch, rng, step, memory):
                r1, r2 = jax.random.split(rng)
                _, track_out, refine_out, _ = model.apply(
                    params, batch.images, tc, nt, rng=r1, training=True,
                    void_index=void_index,
                )
                losses, _ = dvis_offline_train_loss(
                    r2, track_out, refine_out, batch.targets, ccfg,
                    use_matcher_guidance=step < half_iter,
                    memory=None, use_cl=False,
                )
                return sum(jax.tree.leaves(losses)), (losses, memory)

            return loss_fn
        raise ValueError(f"OV training for {arch} not wired yet")

    if arch in ("minvis", "ctvis"):
        from dvis_plus_tpu.models.meta.minvis import frame_fold_targets, minvis_train_loss

        use_ctvis = arch == "ctvis"

        def loss_fn(params, batch: Batch, rng, step, memory):
            B, T = batch.images.shape[:2]
            r1, r2, r3 = jax.random.split(rng, 3)
            out = model.apply(
                params, batch.images.reshape((B * T,) + batch.images.shape[2:])
            )
            losses = minvis_train_loss(r1, out, batch.targets, ccfg)
            if use_ctvis:
                # per-frame matching feeds the contrastive tracking plugin
                # (reference CTMinVIS, dvis_Plus/ctvis.py:30)
                from dvis_plus_tpu.losses.ctvis import ctvis_reid_loss
                from dvis_plus_tpu.losses.matcher import MatchCosts, video_hungarian_match

                ft = frame_fold_targets(batch.targets)
                q4g = video_hungarian_match(
                    r2,
                    out["pred_logits"],
                    out["pred_masks"][:, :, None],
                    ft,
                    MatchCosts(
                        class_weight=ccfg.class_weight,
                        mask_weight=ccfg.mask_weight,
                        dice_weight=ccfg.dice_weight,
                        num_points=ccfg.num_points,
                        solver=ccfg.matcher_solver,
                    ),
                )  # (B*T, N)
                N = q4g.shape[1]
                reid = out.get("pred_reid_embed", out["pred_embds"])
                Cr = reid.shape[-1]
                cl = ctvis_reid_loss(
                    r3,
                    reid.reshape(B, T, -1, Cr),
                    q4g.reshape(B, T, N),
                    batch.targets.frame_valid,
                )
                c = cfg.model.criterion
                losses["loss_reid"] = c.reid_weight * cl["loss_reid"]
                losses["loss_aux_reid"] = c.aux_reid_weight * cl["loss_aux_reid"]
            return sum(jax.tree.leaves(losses)), (losses, memory)

        return loss_fn

    if arch in ("maskformer", "video_maskformer"):
        # image (T=1) / clip-joint Mask2Former pretraining (reference
        # maskformer_model.py:20-21, video_maskformer_model.py:24-25)
        from dvis_plus_tpu.models.meta.video_maskformer import (
            video_maskformer_train_loss,
        )

        def loss_fn(params, batch: Batch, rng, step, memory):
            out = model.apply(params, batch.images)
            losses = video_maskformer_train_loss(rng, out, batch.targets, ccfg)
            return sum(jax.tree.leaves(losses)), (losses, memory)

        return loss_fn

    if arch == "dvis_online":
        from dvis_plus_tpu.models.meta.dvis_online import dvis_online_train_loss

        def loss_fn(params, batch: Batch, rng, step, memory):
            r1, r2 = jax.random.split(rng)
            seg_out, track_out, _ = model.apply(
                params, batch.images, rng=r1, training=True
            )
            losses = dvis_online_train_loss(
                r2,
                seg_out,
                track_out,
                batch.targets,
                ccfg,
                use_matcher_guidance=step < half_iter,
            )
            return sum(jax.tree.leaves(losses)), (losses, memory)

        return loss_fn

    if arch == "dvis_offline":
        from dvis_plus_tpu.models.meta.dvis_offline import dvis_offline_train_loss

        def loss_fn(params, batch: Batch, rng, step, memory):
            r1, r2 = jax.random.split(rng)
            _, track_out, refine_out, _ = model.apply(
                params, batch.images, rng=r1, training=True
            )
            losses, new_memory = dvis_offline_train_loss(
                r2,
                track_out,
                refine_out,
                batch.targets,
                ccfg,
                use_matcher_guidance=step < half_iter,
                memory=memory,
            )
            return sum(jax.tree.leaves(losses)), (losses, new_memory)

        return loss_fn

    if arch == "daq_online":
        from dvis_plus_tpu.models.meta.daq import daq_train_loss

        def loss_fn(params, batch: Batch, rng, step, memory, stage: int = 2):
            # reference: B == 1 clip per device (track_module.py:311); squeeze
            images = batch.images[0]
            targets = jax.tree.map(lambda x: x[0], batch.targets)
            r1, r2 = jax.random.split(rng)
            outputs, slot_outputs, _ = model.apply(
                params, images, targets, r1, stage=stage
            )
            losses = daq_train_loss(r2, outputs, slot_outputs, targets, cfg)
            return sum(jax.tree.leaves(losses)), (losses, memory)

        return loss_fn

    if arch == "daq_offline":
        from dvis_plus_tpu.models.meta.dvis_offline import dvis_offline_train_loss

        def loss_fn(params, batch: Batch, rng, step, memory):
            # B == 1 clip per device; in-graph streaming cutter (frozen) +
            # trainable refiner over top-K sequences (reference
            # DVIS_DAQ_offline.forward :1085-1137)
            images = batch.images[0]
            r1, r2 = jax.random.split(rng)
            online_out, refine_out = model.apply(params, images, rng=r1)
            losses, _ = dvis_offline_train_loss(
                r2,
                online_out,
                refine_out,
                batch.targets,
                ccfg,
                use_matcher_guidance=step < half_iter,
                memory=None,
                use_cl=False,
            )
            return sum(jax.tree.leaves(losses)), (losses, memory)

        return loss_fn

    raise ValueError(f"Unknown meta architecture: {arch}")


def daq_curriculum_slice(cfg: Config, step: int, raw: Dict, rng) -> Dict:
    """Progressive frame-count curriculum (reference INPUT.USING_FRAME_NUM +
    INPUT.STEPS, meta_architecture.py:241-279): before ``steps[0]`` train on
    ``using_frame_num[0]`` contiguous frames, after on ``using_frame_num[1]``;
    host-side slicing so each length is its own compiled executable."""
    ufn = cfg.model.daq.using_frame_num
    if not ufn:
        return raw
    boundary = (cfg.model.daq.steps or (cfg.solver.max_iter,))[0]
    n = ufn[0] if step < boundary else ufn[-1]
    T = raw["images"].shape[1]
    if n <= 0 or n >= T:
        return raw
    start = rng.randint(0, T - n)
    out = dict(raw)
    out["images"] = raw["images"][:, start : start + n]
    out["masks"] = raw["masks"][:, :, start : start + n]
    out["frame_valid"] = raw["frame_valid"][:, :, start : start + n]
    return out


def build_train_step(cfg: Config, model, optimizer=None, text_classifier=None,
                     num_templates=None, void_index=None):
    """Returns (train_step, init_state_fn). ``train_step`` is jit-compiled;
    donate the state for in-place HBM updates."""
    optimizer = optimizer or build_optimizer(cfg)
    loss_fn = build_loss_fn(cfg, model, text_classifier, num_templates, void_index)
    is_daq = cfg.model.meta_architecture == "daq_online"
    daq_stage_switch = (
        (cfg.model.daq.steps or (cfg.solver.max_iter,))[0] if is_daq else None
    )

    def _train_step(state: TrainState, batch: Batch, rng: jax.Array, **loss_kw):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (losses, new_memory)), grads = grad_fn(
            state.params, batch, rng, state.step, state.memory, **loss_kw
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            memory=new_memory,
        )
        return new_state, metrics

    def init_state(params) -> TrainState:
        memory = None
        if cfg.model.meta_architecture == "dvis_offline":
            td = cfg.model.transformer_decoder
            dim = td.hidden_dim * (2 if td.reid_branch else 1)
            memory = ClassMemory.create(cfg.model.num_classes, 20, dim)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            memory=memory,
        )

    if is_daq:
        # stage 2 -> 3 flips ONCE at increasing_step[0]
        # (reference meta_architecture.py:316-319); each stage is its own
        # compiled executable, picked by a host-side step counter
        jitted = {
            s: jax.jit(lambda st, b, r, _s=s: _train_step(st, b, r, stage=_s))
            for s in (2, 3)
        }
        # host-side mirror of state.step so a resumed run restarts in the
        # right stage (initialized lazily from the restored state; advancing
        # host-side avoids a device sync per step)
        counter = {"n": None}

        def train_step(state, batch, rng):
            if counter["n"] is None:
                counter["n"] = int(state.step)
            stage = 2 if counter["n"] < daq_stage_switch else 3
            counter["n"] += 1
            return jitted[stage](state, batch, rng)

        return train_step, init_state

    return jax.jit(_train_step, donate_argnums=(0,)), init_state
