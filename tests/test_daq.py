"""DVIS-DAQ: cutter training forward, slot losses, streaming inference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.losses.targets import VideoTargets
from dvis_plus_tpu.models.daq.cutter import init_cutter_state
from dvis_plus_tpu.models.meta.daq import DAQOnline, daq_train_loss, mask_nms_keep

T, H, W, K, fQ, N = 3, 64, 64, 5, 8, 4
Qc, NQ, NS = 6, 8, 2  # track slots, new-ins (== fQ), bg slots


@pytest.fixture(scope="module")
def daq_model():
    cfg = Config()
    cfg.model.num_classes = K
    cfg.model.compute_dtype = "float32"
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = fQ
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 2
    cfg.model.transformer_decoder.mask_dim = 32
    cfg.model.tracker.num_layers = 2
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.tracker.num_heads = 4
    cfg.model.daq.num_new_ins = NQ
    cfg.model.daq.num_slots = NS
    cfg.model.daq.max_num_instances = Qc
    cfg.model.criterion.train_num_points = 64
    model = DAQOnline(cfg.model)
    targets = make_targets()
    images = jnp.zeros((T, H, W, 3), jnp.float32)
    params = model.init(jax.random.key(0), images, targets, jax.random.key(1))
    return cfg, model, params


def make_targets():
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, K, (N,)).astype(np.int32))
    masks = np.zeros((N, T, H // 4, W // 4), bool)
    fv = np.zeros((N, T), bool)
    for n in range(N - 1):
        for t in range(T):
            if n == 1 and t == T - 1:
                continue  # instance 1 disappears in last frame
            masks[n, t, 2 + 3 * n : 6 + 3 * n, 2 + t : 10 + t] = True
            fv[n, t] = True
    return VideoTargets(
        labels=labels,
        masks=jnp.asarray(masks),
        valid=jnp.asarray(fv.any(-1)),
        frame_valid=jnp.asarray(fv),
    )


@pytest.mark.parametrize("stage", [2, 3])
@pytest.mark.slow
def test_daq_train_loss_grads(daq_model, stage):
    cfg, model, params = daq_model
    targets = make_targets()
    images = jax.random.normal(jax.random.key(2), (T, H, W, 3))

    @jax.jit
    def loss_fn(p):
        outputs, slot_outputs, _ = model.apply(
            p, images, targets, jax.random.key(3), stage=stage
        )
        losses = daq_train_loss(jax.random.key(4), outputs, slot_outputs, targets, cfg)
        return sum(jax.tree.leaves(losses)), losses

    (val, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(val)), losses
    assert any(k.startswith("slot_") for k in losses)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # cutter got gradient signal; segmenter is stop-gradiented
    cutter_g = jax.tree.leaves(grads["params"]["cutter"])
    assert sum(float(jnp.sum(jnp.abs(g))) for g in cutter_g) > 0
    seg_g = jax.tree.leaves(grads["params"]["segmenter"])
    assert sum(float(jnp.sum(jnp.abs(g))) for g in seg_g) == 0


def test_daq_streaming_inference(daq_model):
    cfg, model, params = daq_model
    images = jax.random.normal(jax.random.key(5), (T, H, W, 3))
    seg_out = model.apply(params, images, method=DAQOnline.segment_only)
    C = seg_out["pred_embds_without_norm"].shape[-1]
    state = init_cutter_state(Qc, C)

    prob = jax.nn.softmax(seg_out["pred_logits"], axis=-1)
    seg_scores = prob[..., :-1].max(axis=-1)

    for i in range(T):
        out, state = model.apply(
            params,
            state,
            seg_out["pred_embds_without_norm"][i],
            seg_out["mask_features"][i],
            seg_out["query_feat"],
            seg_out["pred_masks"][i],
            seg_scores[i] > 0.0,  # untrained: accept all as "valid" frame 0
            first=(i == 0),
            method=DAQOnline.cutter_step,
        )
        assert out["slot_logits"].shape == (Qc, K + 1)
        assert out["slot_masks"].shape[0] == Qc
        assert state.alive.shape == (Qc,)
        # slot-aligned outputs: embeds row == the new state's track query
        np.testing.assert_allclose(
            np.asarray(out["slot_embeds"]), np.asarray(state.track_query), atol=1e-6
        )
    # after 3 frames some slots should be alive (validity was permissive)
    assert int(state.alive.sum()) > 0
    # seq ids of alive slots are unique
    ids = np.asarray(state.seq_id)[np.asarray(state.alive)]
    assert len(set(ids.tolist())) == len(ids)


def test_daq_cutter_window_scan_matches_per_frame(daq_model):
    """The in-graph lax.scan window executable (cutter_window, one host pull
    per window) reproduces the sequential per-frame cutter_step stream
    exactly — outputs AND final carry."""
    cfg, model, params = daq_model
    images = jax.random.normal(jax.random.key(7), (T, H, W, 3))
    seg_out = model.apply(params, images, method=DAQOnline.segment_only)
    C = seg_out["pred_embds_without_norm"].shape[-1]
    fe = seg_out["pred_embds_without_norm"]
    mf = seg_out["mask_features"]
    qf = seg_out["query_feat"]
    pm = seg_out["pred_masks"]
    valid0 = jnp.ones((fe.shape[1],), bool)

    # per-frame stream: first frame + T-1 steady steps
    state_seq = init_cutter_state(Qc, C)
    out0, state_seq = model.apply(
        params, state_seq, fe[0], mf[0], qf, pm[0], valid0, True,
        method=DAQOnline.cutter_step,
    )
    per_frame = []
    dummy = jnp.zeros((fe.shape[1],), bool)
    for i in range(1, T):
        out, state_seq = model.apply(
            params, state_seq, fe[i], mf[i], qf, pm[i], dummy, False,
            method=DAQOnline.cutter_step,
        )
        per_frame.append(out)

    # scanned window over the same steady-state frames
    state_scan = init_cutter_state(Qc, C)
    _, state_scan = model.apply(
        params, state_scan, fe[0], mf[0], qf, pm[0], valid0, True,
        method=DAQOnline.cutter_step,
    )
    outs, state_scan = model.apply(
        params, state_scan, fe[1:], mf[1:], qf, pm[1:],
        method=DAQOnline.cutter_window,
    )

    for j, ref in enumerate(per_frame):
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(outs[k][j]), np.asarray(ref[k]), atol=1e-5,
                err_msg=f"frame {j + 1} key {k}",
            )
    for a, b in zip(jax.tree.leaves(state_scan), jax.tree.leaves(state_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_daq_stream_video_bf16_carry():
    """The serving config (bfloat16 compute) streams through stream_video's
    scanned window path: the CutterState carry must be dtype-stable across
    scan iterations (lax.scan rejects a carry whose dtype changes)."""
    from dvis_plus_tpu.engine.daq_inference import stream_video

    cfg = Config()
    cfg.model.num_classes = K
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = fQ
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 2
    cfg.model.transformer_decoder.mask_dim = 32
    cfg.model.tracker.num_layers = 2
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.tracker.num_heads = 4
    cfg.model.daq.num_new_ins = NQ
    cfg.model.daq.num_slots = NS
    cfg.model.daq.max_num_instances = Qc
    cfg.model.criterion.train_num_points = 64
    cfg.test.window_size = 2
    model = DAQOnline(cfg.model)
    targets = make_targets()
    images0 = jnp.zeros((T, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), images0, targets, jax.random.key(1)
    )
    video = np.random.RandomState(3).rand(5, H, W, 3).astype(np.float32)
    records, T_out, shape4 = stream_video(cfg, model, params, video, {})
    assert T_out == 5
    for rec in records.values():
        assert all(np.isfinite(l).all() for l in rec.logits)


def test_mask_nms():
    S, Hm, Wm = 3, 8, 8
    masks = np.full((S, Hm, Wm), -5.0, np.float32)
    masks[0, :4, :4] = 5.0
    masks[1, :4, :4] = 5.0  # duplicate of 0
    masks[2, 4:, 4:] = 5.0  # disjoint
    keep = mask_nms_keep(
        jnp.asarray(masks), jnp.asarray([0.9, 0.5, 0.8]), jnp.ones((S,), bool), 0.6
    )
    assert bool(keep[0]) and not bool(keep[1]) and bool(keep[2])


def test_daq_offline_refine(daq_model):
    from dvis_plus_tpu.models.meta.daq import DAQOffline

    cfg, _, _ = daq_model
    cfg2 = cfg
    model = DAQOffline(cfg2.model)
    import jax as _jax
    Tn, C = 3, 32
    inst = jnp.asarray(np.random.RandomState(0).randn(1, Tn, Qc, C).astype(np.float32))
    frame = jnp.zeros((1, Tn, fQ, C))
    mf = jnp.zeros((1, Tn, H // 4, W // 4, C))
    topk = jnp.asarray([[True, True, False, False, True, False]])
    # init only the refiner path via the refine method
    params = model.init(_jax.random.key(0), inst, frame, mf, topk, method=DAQOffline.refine)
    out = model.apply(params, inst, frame, mf, topk, method=DAQOffline.refine)
    assert out["pred_logits"].shape[-1] == K + 1
    assert out["pred_masks"].shape[1] == Qc


@pytest.mark.slow
def test_daq_build_train_step(daq_model):
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step

    cfg, model, params = daq_model
    cfg.model.meta_architecture = "daq_online"
    cfg.model.freeze = ("segmenter",)
    cfg.model.daq.steps = (1,)  # stage 3 from step 1
    cfg.solver.max_iter = 4
    targets = make_targets()
    batch = Batch(
        images=jax.random.normal(jax.random.key(0), (1, T, H, W, 3)),
        targets=jax.tree.map(lambda x: x[None], targets),
    )
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    state, m1 = train_step(state, batch, jax.random.key(1))   # stage 2
    state, m2 = train_step(state, batch, jax.random.key(1))   # stage 3
    assert np.isfinite(float(m1["total_loss"]))
    assert np.isfinite(float(m2["total_loss"]))


@pytest.mark.slow
def test_daq_offline_train_step(daq_model):
    """daq_offline training: in-graph streaming cutter (frozen) + refiner on
    top-K sequences (reference DVIS_DAQ_offline.forward :1085-1137); refiner
    gets gradients, cutter + segmenter do not."""
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.models.meta.daq import DAQOffline

    cfg, _, _ = daq_model
    import copy

    cfg = copy.deepcopy(cfg)
    cfg.model.meta_architecture = "daq_offline"
    cfg.model.freeze = ("segmenter", "cutter")
    cfg.model.refiner.num_layers = 1
    cfg.model.refiner.feedforward_dim = 64
    cfg.model.refiner.num_heads = 4
    cfg.model.daq.offline_topk_num = 3
    cfg.model.daq.aux_inference_select_thr = 0.0
    cfg.solver.max_iter = 4
    model = DAQOffline(cfg.model)
    targets = make_targets()
    images = jnp.zeros((T, H, W, 3), jnp.float32)
    params = model.init(jax.random.key(0), images, targets, jax.random.key(1))

    # snapshot before training: the default train step donates the state
    p0_cutter = [np.asarray(x) for x in jax.tree.leaves(params["params"]["online"]["cutter"])]
    p0_refiner = [np.asarray(x) for x in jax.tree.leaves(params["params"]["refiner"])]
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    batch = Batch(
        images=jnp.asarray(np.random.RandomState(2).randn(1, T, H, W, 3), jnp.float32),
        targets=jax.tree.map(lambda x: x[None], targets),
    )
    losses = []
    for _ in range(2):
        state, metrics = train_step(state, batch, jax.random.key(5))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    # frozen predicate masked the cutter/segmenter updates
    p1 = jax.tree.leaves(state.params["params"]["online"]["cutter"])
    assert all(np.allclose(a, np.asarray(b)) for a, b in zip(p0_cutter, p1))
    r1 = jax.tree.leaves(state.params["params"]["refiner"])
    assert any(not np.allclose(a, np.asarray(b)) for a, b in zip(p0_refiner, r1))


def test_daq_curriculum_slice():
    from dvis_plus_tpu.engine.trainer import daq_curriculum_slice
    import random

    cfg = Config()
    cfg.model.daq.using_frame_num = (2, 4)
    cfg.model.daq.steps = (10,)
    raw = {
        "images": np.zeros((1, 5, 8, 8, 3)),
        "masks": np.zeros((1, 3, 5, 2, 2)),
        "frame_valid": np.zeros((1, 3, 5), bool),
        "labels": np.zeros((1, 3), np.int32),
        "valid": np.zeros((1, 3), bool),
    }
    rng = random.Random(0)
    early = daq_curriculum_slice(cfg, 0, raw, rng)
    assert early["images"].shape[1] == 2 and early["masks"].shape[2] == 2
    late = daq_curriculum_slice(cfg, 10, raw, rng)
    assert late["images"].shape[1] == 4 and late["frame_valid"].shape[2] == 4
    # no curriculum configured -> untouched
    cfg.model.daq.using_frame_num = ()
    assert daq_curriculum_slice(cfg, 0, raw, rng) is raw


@pytest.mark.slow
def test_daq_stage_resumes_from_state_step(daq_model):
    """Stage 2->3 switch keys off the restored state's step (VERDICT weak #5:
    a resumed stage-3 run must not restart in stage 2)."""
    from dvis_plus_tpu.engine.trainer import TrainState, build_train_step
    import copy

    cfg, model, params = daq_model
    cfg = copy.deepcopy(cfg)
    cfg.model.meta_architecture = "daq_online"
    cfg.model.daq.steps = (2,)
    cfg.solver.max_iter = 10

    seen = []
    import dvis_plus_tpu.engine.trainer as trainer_mod

    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    # simulate a resume at step 5 (past the switch)
    state = state._replace(step=jnp.asarray(5, jnp.int32))

    # peek at the counter through the closure: after one call the host mirror
    # must be 6 (resumed at 5), i.e. stage 3 was chosen, not stage 2
    batch_targets = jax.tree.map(lambda x: x[None], make_targets())
    from dvis_plus_tpu.engine.trainer import Batch

    batch = Batch(
        images=jnp.zeros((1, T, H, W, 3), jnp.float32), targets=batch_targets
    )
    cell = train_step.__closure__
    state2, _ = train_step(state, batch, jax.random.key(0))
    counters = [c.cell_contents for c in cell if isinstance(c.cell_contents, dict)]
    counter = [c for c in counters if "n" in c][0]
    assert counter["n"] == 6
