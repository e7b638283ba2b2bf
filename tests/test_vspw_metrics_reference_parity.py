"""VSPW/VIPSeg scorer parity: our mIoU / VC / STQ
(evaluation/video_metrics.py) vs the ACTUAL reference scorers run as oracles
on randomized synthetic videos:

- mIoU:  DVIS_Plus/utils/eval_miou_vspw.py::Evaluator
- VC:    DVIS_Plus/utils/eval_vc_vspw.py::get_common
- STQ:   DVIS_Plus/utils/segmentation_and_tracking_quality.py::STQuality
         (driven the way eval_stq_vspw.py drives it: ignore=255, shift=16,
          things_list from the categories json, crowd = instance id 0)
"""
import os
import sys
import types

import numpy as np
import pytest

# fast enough for the default CI lane (pure-numpy oracles, ~seconds)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dvis_plus_tpu.evaluation.video_metrics import miou_eval, stq_eval, vc_eval

REF_UTILS = os.path.join(
    os.environ.get("DVIS_REFERENCE_ROOT", "/root/reference"), "DVIS_Plus", "utils"
)

N_CLASSES = 6
THINGS = (1, 4)  # scattered thing ids, like VIPSeg's categories json


def _exec_prefix(path, stop_marker):
    """Execute a reference scorer file up to its argv-driven script tail and
    return the resulting namespace (the class/function definitions)."""
    if "tqdm" not in sys.modules:
        try:
            import tqdm  # noqa: F401
        except ImportError:
            stub = types.ModuleType("tqdm")
            stub.tqdm = lambda x, *a, **k: x
            sys.modules["tqdm"] = stub
    with open(path) as f:
        src = f.read()
    ns = {"__name__": "__ref_prefix__"}
    exec(compile(src[: src.index(stop_marker)], path, "exec"), ns)
    return ns


def _synth_semantic(rng, T, H=20, W=28):
    """GT semantic map with void (255) + a degraded fully-covered pred."""
    gt = np.full((T, H, W), 255, np.int64)
    for s in range(rng.randint(3, 6)):
        c = rng.randint(0, N_CLASSES)
        h, w = rng.randint(4, H // 2), rng.randint(4, W // 2)
        y, x = rng.randint(0, H - h), rng.randint(0, W - w)
        for t in range(T):
            yy = np.clip(y + rng.randint(-1, 2), 0, H - h)
            xx = np.clip(x + rng.randint(-1, 2), 0, W - w)
            gt[t, yy : yy + h, xx : xx + w] = c
    base = rng.randint(0, N_CLASSES, (T, H, W))
    keep = rng.rand(T, H, W) < 0.8
    pred = np.where((gt != 255) & keep, gt, base)
    return pred, gt


def _synth_panoptic(rng, T, H=20, W=28):
    """GT (cls, id) maps with void + crowd (instance id 0 on a thing class)
    and a degraded prediction with id switches / class confusion / pred void."""
    gt_cls = np.full((T, H, W), 255, np.int64)
    gt_id = np.full((T, H, W), 255, np.int64)
    pr_cls = np.full((T, H, W), 255, np.int64)
    pr_id = np.full((T, H, W), 255, np.int64)
    for s in range(rng.randint(3, 7)):
        c = rng.randint(0, N_CLASSES)
        # instance id 0 on a thing class = crowd in the reference
        inst = 0 if (c in THINGS and rng.rand() < 0.25) else s + 1
        h, w = rng.randint(4, H // 2), rng.randint(4, W // 2)
        y, x = rng.randint(0, H - h), rng.randint(0, W - w)
        for t in range(T):
            yy = np.clip(y + rng.randint(-1, 2), 0, H - h)
            xx = np.clip(x + rng.randint(-1, 2), 0, W - w)
            gt_cls[t, yy : yy + h, xx : xx + w] = c
            gt_id[t, yy : yy + h, xx : xx + w] = inst
            if rng.rand() < 0.1:
                continue  # pred misses the segment: pred-void stays
            pc = c if rng.rand() < 0.8 else rng.randint(0, N_CLASSES)
            ps = (s + 1) if rng.rand() < 0.85 else s + 40
            py = np.clip(yy + rng.randint(-1, 2), 0, H - h)
            px = np.clip(xx + rng.randint(-1, 2), 0, W - w)
            pr_cls[t, py : py + h, px : px + w] = pc
            pr_id[t, py : py + h, px : px + w] = ps
    return (pr_cls, pr_id), (gt_cls, gt_id)


@pytest.mark.parametrize("seed", [0, 5])
def test_miou_matches_reference(seed):
    rng = np.random.RandomState(seed)
    videos = [_synth_semantic(rng, T) for T in (3, 5, 4)]

    ns = _exec_prefix(
        os.path.join(REF_UTILS, "eval_miou_vspw.py"), "eval_ = Evaluator("
    )
    ref = ns["Evaluator"](N_CLASSES)
    for pred, gt in videos:
        # the script feeds raw VSPW masks where label 0 is void and classes
        # are 1-based; _generate_matrix does gt[gt==0]=255; gt-=1
        raw_gt = np.where(gt == 255, 0, gt + 1)
        ref.add_batch(raw_gt.copy(), pred.copy())
    ref_miou = float(ref.Mean_Intersection_over_Union()) * 100

    ours = miou_eval([p for p, _ in videos], [g for _, g in videos], N_CLASSES)
    assert ours == pytest.approx(ref_miou, abs=1e-8)


@pytest.mark.parametrize("seed", [1, 6])
def test_vc_matches_reference(seed):
    rng = np.random.RandomState(seed)
    # include a video shorter than the largest clip to exercise the skip
    videos = [_synth_semantic(rng, T) for T in (8, 3, 6)]
    preds = [p for p, _ in videos]
    gts = [g for _, g in videos]

    ns = _exec_prefix(os.path.join(REF_UTILS, "eval_vc_vspw.py"), "DIR = sys.argv")
    get_common = ns["get_common"]

    for clip_num in (2, 4):
        accs = []
        for p, g in zip(preds, gts):
            if p.shape[0] <= clip_num:
                continue
            accs.extend(
                get_common(list(g), list(p), clip_num, g.shape[1], g.shape[2])
            )
        ref_vc = float(np.nanmean(np.array(accs))) * 100
        assert vc_eval(preds, gts, n=clip_num) == pytest.approx(ref_vc, abs=1e-8)


@pytest.mark.parametrize("seed", [2, 7])
def test_stq_matches_reference(seed):
    from refshim import load_ref_module

    rng = np.random.RandomState(seed)
    videos = [_synth_panoptic(rng, T) for T in (4, 6, 3)]
    preds = [v[0] for v in videos]
    gts = [v[1] for v in videos]

    mod = load_ref_module("DVIS_Plus", "utils.segmentation_and_tracking_quality")
    if not hasattr(np, "bool"):  # STQuality uses the removed np.bool alias
        np.bool = bool
    bit_shift = 16
    ref = mod.STQuality(N_CLASSES, list(THINGS), 255, bit_shift, 2**24)
    for seq_id, ((pc, pi), (gc, gi)) in enumerate(zip(preds, gts)):
        for t in range(pc.shape[0]):
            # the driver encodes uncovered pixels as sem=255, inst=255
            # (eval_stq_vspw.py:134-152)
            y_true = (gc[t] << bit_shift) + np.where(gc[t] == 255, 255, gi[t])
            y_pred = (pc[t] << bit_shift) + np.where(pc[t] == 255, 255, pi[t])
            ref.update_state(y_true, y_pred, seq_id)
    res = ref.result()

    ours = stq_eval(preds, gts, N_CLASSES, num_things=0, things=THINGS)
    assert ours["SQ"] == pytest.approx(float(res["IoU"]) * 100, abs=1e-8)
    assert ours["AQ"] == pytest.approx(float(res["AQ"]) * 100, abs=1e-8)
    assert ours["STQ"] == pytest.approx(float(res["STQ"]) * 100, abs=1e-8)
    assert 0.0 < ours["STQ"] < 100.0
