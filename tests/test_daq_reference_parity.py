"""DAQ cutter activation parity against the ACTUAL reference implementation.

The reference ``VideoInstanceCutter`` (DVIS_DAQ/dvis_daq/track_module.py:102)
runs on CPU torch via tools/refshim.py (detectron2/fvcore shims + the
``.to("cuda")`` -> cpu patch its inference bookkeeping needs). Its state dict
is converted with ``core/zoo_convert.convert_daq_cutter`` onto our static
slot-table cutter (models/daq/cutter.py), and the full streaming inference
path is compared frame by frame over a synthetic video:

- survival decisions (which sequences are alive each frame) must MATCH
  exactly — thresholding, ovis slot-branch gating, kick-out counting;
- per-sequence pred_logits / pred_masks must match to fp32 noise;
- sequence identity must be stable (our seq ids map 1:1 onto the
  reference's ``video_ins_hub`` entries across frames).

The reference's per-frame track-query list order is reconstructed from the
hub (cur_seq_ids keeps ascending query order: surviving tracks first in
their previous order, then new detections in insertion order,
track_module.py:705-755); our stable-argsort slot compaction produces the
same order, so rows compare positionally.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow

C = 32  # hidden dim
HEADS = 4
L = 2  # decoder layers
FQ = 8  # segmenter queries (== num_new_ins in the reference configs)
NQ = 8
K = 5  # classes
NSLOTS = 3  # bg slots
QC = 48  # our track-slot capacity (>= max possible live sequences here)
T = 6
HM = WM = 16
THR = 0.33  # near the median random-weight score: tracks flip valid/invalid
KEEP = 0.2  # high enough for the ovis slot-branch gate to kill some tracks
KICK = 2


@pytest.fixture(scope="module")
def bundle():
    import random

    from refshim import load_daq_oracles

    from dvis_plus_tpu.core.zoo_convert import convert_daq_cutter

    random.seed(0)
    torch.manual_seed(0)
    o = load_daq_oracles()
    ref = o["VideoInstanceCutter"](
        hidden_dim=C,
        feedforward_dim=64,
        num_head=HEADS,
        decoder_layer_num=L,
        mask_dim=C,
        num_classes=K,
        num_new_ins=NQ,
        inference_select_threshold=THR,
        kick_out_frame_num=KICK,
        keep_threshold=KEEP,
        num_slots=NSLOTS,
        task="vis",
        ovis_infer=True,
    )
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(1)
    fe = rng.randn(T, FQ, C).astype(np.float32)
    mf = rng.randn(T, HM, WM, C).astype(np.float32)
    seg_qf = rng.randn(FQ, C).astype(np.float32)
    seg_masks = (rng.randn(T, FQ, HM, WM) * 2.0).astype(np.float32)
    seg_valid0 = rng.rand(FQ) > 0.3

    class _Emb:
        pass

    qf_emb = _Emb()
    qf_emb.weight = torch.from_numpy(seg_qf)
    frames_info = {
        "seg_query_feat": qf_emb,
        "valid": [torch.from_numpy(seg_valid0[None]) for _ in range(T)],
        "pred_masks": [torch.from_numpy(seg_masks[i][None]) for i in range(T)],
    }
    fe_t = torch.from_numpy(np.transpose(fe, (2, 0, 1))[None])  # (1, C, T, fQ)
    mf_t = torch.from_numpy(np.transpose(mf, (0, 3, 1, 2))[None])  # (1,T,C,H,W)

    with torch.no_grad():
        ref.inference(fe_t, mf_t, frames_info, 0, resume=False, to_store="cpu")

    hub = []
    for seq_id, seq in ref.video_ins_hub.items():  # dict keeps insert order
        hub.append(
            dict(
                ref_id=seq_id,
                sT=seq.sT,
                logits=[t.numpy() for t in seq.pred_logits],
                masks=[t.numpy() for t in seq.pred_masks],
                appearance=list(seq.appearance),
            )
        )

    # reconstruct the reference's per-frame cur_seq_ids order
    orders = []
    prev = []
    for f in range(T):
        cur = [s for s in prev if s["sT"] <= f < s["sT"] + len(s["logits"])]
        cur += [s for s in hub if s["sT"] == f]
        orders.append(cur)
        prev = cur

    return dict(sd=sd, fe=fe, mf=mf, seg_qf=seg_qf, seg_masks=seg_masks,
                seg_valid0=seg_valid0, hub=hub, orders=orders)


def _our_cutter():
    from dvis_plus_tpu.models.daq.cutter import VideoInstanceCutter

    return VideoInstanceCutter(
        num_classes=K,
        hidden_dim=C,
        feedforward_dim=64,
        num_heads=HEADS,
        num_layers=L,
        mask_dim=C,
        num_new_ins=NQ,
        num_slots=NSLOTS,
        num_track_slots=QC,
        inference_select_thr=THR,
        kick_out_frame_num=KICK,
        keep_threshold=KEEP,
        ovis_infer=True,
    )


def test_converter_covers_cutter_key_space(bundle):
    """convert_daq_cutter consumes the reference key space and produces a
    tree with exactly our cutter's init structure (paths + shapes)."""
    from dvis_plus_tpu.core.zoo_convert import convert_daq_cutter
    from dvis_plus_tpu.models.daq.cutter import (
        VideoInstanceCutter,
        init_cutter_state,
    )

    model = _our_cutter()
    conv = {"params": convert_daq_cutter(bundle["sd"], num_layers=L, heads=HEADS)}
    state = init_cutter_state(QC, C)
    init = model.init(
        jax.random.key(0),
        state,
        jnp.asarray(bundle["fe"][0]),
        jnp.asarray(bundle["mf"][0]),
        jnp.asarray(bundle["seg_qf"]),
        jnp.asarray(bundle["seg_masks"][0]),
        jnp.asarray(bundle["seg_valid0"]),
        False,
        method=VideoInstanceCutter.inference_step,
    )
    want = jax.tree_util.tree_map(lambda x: x.shape, init)
    got = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, conv)
    assert want == got


def test_cutter_streaming_inference_parity(bundle):
    """Frame-by-frame streaming parity: survival decisions exact, values to
    fp32 noise, sequence identity stable."""
    from dvis_plus_tpu.core.zoo_convert import convert_daq_cutter
    from dvis_plus_tpu.models.daq.cutter import (
        VideoInstanceCutter,
        init_cutter_state,
    )

    model = _our_cutter()
    params = {"params": convert_daq_cutter(bundle["sd"], num_layers=L, heads=HEADS)}
    state = init_cutter_state(QC, C)
    step = jax.jit(
        lambda s, fe, mf, seg_m, first: model.apply(
            params, s, fe, mf,
            jnp.asarray(bundle["seg_qf"]),
            seg_m,
            jnp.asarray(bundle["seg_valid0"]),
            first,
            method=VideoInstanceCutter.inference_step,
        ),
        static_argnames="first",
    )

    seq_map = {}  # ref hub id -> our seq id
    worst = 0.0
    any_missed = False
    for i in range(T):
        out, state = step(
            state, jnp.asarray(bundle["fe"][i]), jnp.asarray(bundle["mf"][i]),
            jnp.asarray(bundle["seg_masks"][i]), i == 0,
        )
        out = jax.tree_util.tree_map(np.asarray, out)
        order = bundle["orders"][i]

        n_alive = int(out["alive"].sum())
        assert n_alive == len(order), (
            f"frame {i}: ours {n_alive} alive vs reference {len(order)}"
        )
        for j, s in enumerate(order):
            idx = i - s["sT"]
            if not s["appearance"][idx]:
                any_missed = True
            ours_l = out["slot_logits"][j]
            ours_m = out["slot_masks"][j]
            ref_l = s["logits"][idx]
            ref_m = s["masks"][idx]
            rel_l = np.max(np.abs(ours_l - ref_l)) / max(np.max(np.abs(ref_l)), 1e-6)
            rel_m = np.max(np.abs(ours_m - ref_m)) / max(np.max(np.abs(ref_m)), 1e-6)
            worst = max(worst, rel_l, rel_m)
            assert rel_l < 1e-3 and rel_m < 1e-3, (
                f"frame {i} seq {j}: rel logits {rel_l:.2e} masks {rel_m:.2e}"
            )
            our_id = int(out["seq_id"][j])
            if s["ref_id"] in seq_map:
                assert seq_map[s["ref_id"]] == our_id, (
                    f"frame {i}: sequence identity diverged"
                )
            else:
                assert our_id not in seq_map.values()
                seq_map[s["ref_id"]] = our_id
    n_dead = sum(
        1 for s in bundle["hub"] if s["sT"] + len(s["logits"]) < T
    )
    print(f"PARITY daq_cutter streaming: worst rel err {worst:.3e} over "
          f"{T} frames / {len(seq_map)} sequences "
          f"(missed-kept seen: {any_missed}, dropped sequences: {n_dead})")
    # the synthetic video must actually exercise the kept-missed path (SGFF
    # carry without pos update) and sequence drop-out
    assert any_missed
    assert n_dead > 0
