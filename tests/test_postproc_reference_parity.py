"""Inference post-processing parity vs the ACTUAL reference methods
(dvis_Plus/meta_architecture.py run as oracles via tools/refshim.py):

- VIS top-K extraction + two-stage mask upsampling (inference_video :362-401)
- VPS panoptic argmax / stuff merge / overlap filter (inference_video_vps
  :869-952)
- VSS semantic argmax (inference_video_vss :954-979)

Inputs are saturated box masks (levels far from the 0 / 0.5 decision
boundaries) so interpolation fp noise cannot flip pixels, and random class
logits; outputs must match EXACTLY (ids, segments, label maps)."""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

Q, K, T = 12, 5, 3
H4, W4 = 16, 24
PADDED = (64, 96)
IMG = (60, 90)
OUT = (70, 100)
N_THINGS = 3  # contiguous classes [0, 3) are things


@pytest.fixture(scope="module")
def oracle():
    from refshim import load_meta_architecture_oracle

    return load_meta_architecture_oracle()


def _inputs(seed):
    rng = np.random.RandomState(seed)
    logits = rng.randn(Q, K + 1).astype(np.float32) * 2.0
    masks = np.full((Q, T, H4, W4), -7.3, np.float32)
    for q in range(Q):
        h, w = rng.randint(4, H4 // 2), rng.randint(4, W4 // 2)
        y, x = rng.randint(0, H4 - h), rng.randint(0, W4 - w)
        for t in range(T):
            dy, dx = rng.randint(-1, 2), rng.randint(-1, 2)
            yy, xx = np.clip(y + dy, 0, H4 - h), np.clip(x + dx, 0, W4 - w)
            masks[q, t, yy : yy + h, xx : xx + w] = 9.1
    return logits, masks


@pytest.mark.parametrize("seed", [0, 4])
def test_vis_topk_matches_reference(oracle, seed):
    import torch

    from dvis_plus_tpu.models.meta.minvis import inference_video

    logits, masks = _inputs(seed)
    self_ns = types.SimpleNamespace(
        sem_seg_head=types.SimpleNamespace(num_classes=K),
        device=torch.device("cpu"),
        num_queries=Q,
    )
    ref = oracle.MinVIS.inference_video(
        self_ns, torch.from_numpy(logits), torch.from_numpy(masks),
        IMG, OUT[0], OUT[1], PADDED,
    )
    ours = inference_video(logits, masks, IMG, OUT, PADDED, topk=10)

    # reference topk is unsorted; align both by (score, label)
    ref_rows = sorted(
        zip(ref["pred_scores"], ref["pred_labels"],
            [m.numpy() for m in ref["pred_masks"]]),
        key=lambda r: (-r[0], r[1]),
    )
    our_rows = sorted(
        zip(np.asarray(ours.scores).tolist(), np.asarray(ours.labels).tolist(),
            np.asarray(ours.masks)),
        key=lambda r: (-r[0], r[1]),
    )
    assert len(ref_rows) == len(our_rows) == 10
    for (rs, rl, rm), (os_, ol, om) in zip(ref_rows, our_rows):
        assert os_ == pytest.approx(rs, abs=1e-6)
        assert ol == rl
        assert (om == rm).all()


@pytest.mark.parametrize("seed", [1, 5])
def test_vps_matches_reference(oracle, seed):
    import torch

    from dvis_plus_tpu.models.meta.dvis_online import (
        panoptic_probs,
        panoptic_segments_host,
    )

    logits, masks = _inputs(seed)
    obj_thr, ovl_thr = 0.3, 0.6
    self_ns = types.SimpleNamespace(
        sem_seg_head=types.SimpleNamespace(num_classes=K),
        object_mask_threshold=obj_thr,
        overlap_threshold=ovl_thr,
        metadata=types.SimpleNamespace(
            thing_dataset_id_to_contiguous_id={i: i for i in range(N_THINGS)}
        ),
    )
    ref = oracle.DVIS_Plus_online.inference_video_vps(
        self_ns, torch.from_numpy(logits), torch.from_numpy(masks),
        IMG, OUT[0], OUT[1], PADDED, torch.arange(Q),
    )

    scores, labels, keep, up_masks, mask_ids = panoptic_probs(
        logits, masks, img_size=IMG, output_size=OUT, padded_size=PADDED,
        object_mask_threshold=obj_thr,
    )
    pan_seg, seg_infos, out_ids = panoptic_segments_host(
        np.asarray(scores), np.asarray(labels), np.asarray(keep),
        np.asarray(up_masks), np.asarray(mask_ids),
        num_thing_classes=N_THINGS, overlap_threshold=ovl_thr,
    )

    assert (pan_seg == ref["pred_masks"].numpy()).all()
    ref_infos = ref["segments_infos"]
    assert len(seg_infos) == len(ref_infos) and len(seg_infos) > 0
    for ours_i, ref_i in zip(seg_infos, ref_infos):
        assert ours_i["id"] == ref_i["id"]
        assert ours_i["isthing"] == ref_i["isthing"]
        assert ours_i["category_id"] == ref_i["category_id"]
    assert [int(i) for i in out_ids] == [int(i) for i in ref["pred_ids"]]


@pytest.mark.parametrize("seed", [2, 6])
def test_vss_matches_reference(oracle, seed):
    import torch

    from dvis_plus_tpu.models.meta.dvis_online import semantic_inference

    logits, masks = _inputs(seed)
    ref = oracle.DVIS_Plus_online.inference_video_vss(
        types.SimpleNamespace(), torch.from_numpy(logits), torch.from_numpy(masks),
        IMG, OUT[0], OUT[1], PADDED, torch.arange(Q),
    )
    ours = semantic_inference(logits, masks, img_size=IMG, output_size=OUT,
                              padded_size=PADDED)
    assert (np.asarray(ours) == ref["pred_masks"].numpy()).all()


@pytest.mark.parametrize("seed", [3, 7])
def test_vis_aux_fusion_matches_reference(oracle, seed):
    """The offline arch's aux fusion: max of the two softmaxes WITHOUT
    renormalization, applied inside the task post-processing (reference
    inference_video_vis :818-852 with aux_pred_cls)."""
    import torch

    from dvis_plus_tpu.models.meta.minvis import inference_video

    logits, masks = _inputs(seed)
    aux = np.random.RandomState(seed + 100).randn(Q, K + 1).astype(np.float32) * 2.0
    self_ns = types.SimpleNamespace(
        sem_seg_head=types.SimpleNamespace(num_classes=K),
        device=torch.device("cpu"),
        num_queries=Q,
        max_num=10,
    )
    ref = oracle.DVIS_Plus_online.inference_video_vis(
        self_ns, torch.from_numpy(logits), torch.from_numpy(masks),
        IMG, OUT[0], OUT[1], PADDED, torch.arange(Q),
        aux_pred_cls=torch.from_numpy(aux),
    )
    ours = inference_video(logits, masks, IMG, OUT, PADDED, topk=10,
                           aux_pred_cls=aux)
    ref_rows = sorted(
        zip(ref["pred_scores"], ref["pred_labels"]), key=lambda r: (-r[0], r[1])
    )
    our_rows = sorted(
        zip(np.asarray(ours.scores).tolist(), np.asarray(ours.labels).tolist()),
        key=lambda r: (-r[0], r[1]),
    )
    for (rs, rl), (os_, ol) in zip(ref_rows, our_rows):
        assert os_ == pytest.approx(rs, abs=1e-6) and ol == rl


@pytest.mark.parametrize("seed", [8])
def test_vps_vss_aux_fusion_matches_reference(oracle, seed):
    import torch

    from dvis_plus_tpu.models.meta.dvis_online import (
        panoptic_probs,
        panoptic_segments_host,
        semantic_inference,
    )

    logits, masks = _inputs(seed)
    aux = np.random.RandomState(seed + 100).randn(Q, K + 1).astype(np.float32) * 2.0
    obj_thr, ovl_thr = 0.3, 0.6
    self_ns = types.SimpleNamespace(
        sem_seg_head=types.SimpleNamespace(num_classes=K),
        object_mask_threshold=obj_thr,
        overlap_threshold=ovl_thr,
        metadata=types.SimpleNamespace(
            thing_dataset_id_to_contiguous_id={i: i for i in range(N_THINGS)}
        ),
    )
    ref_vps = oracle.DVIS_Plus_online.inference_video_vps(
        self_ns, torch.from_numpy(logits.copy()), torch.from_numpy(masks),
        IMG, OUT[0], OUT[1], PADDED, torch.arange(Q),
        aux_pred_cls=torch.from_numpy(aux),
    )
    scores, labels, keep, up_masks, mask_ids = panoptic_probs(
        logits, masks, img_size=IMG, output_size=OUT, padded_size=PADDED,
        object_mask_threshold=obj_thr, aux_pred_cls=aux,
    )
    pan_seg, seg_infos, _ = panoptic_segments_host(
        np.asarray(scores), np.asarray(labels), np.asarray(keep),
        np.asarray(up_masks), np.asarray(mask_ids),
        num_thing_classes=N_THINGS, overlap_threshold=ovl_thr,
    )
    assert (pan_seg == ref_vps["pred_masks"].numpy()).all()
    assert [s["category_id"] for s in seg_infos] == [
        s["category_id"] for s in ref_vps["segments_infos"]
    ]

    ref_vss = oracle.DVIS_Plus_online.inference_video_vss(
        types.SimpleNamespace(), torch.from_numpy(logits), torch.from_numpy(masks),
        IMG, OUT[0], OUT[1], PADDED, torch.arange(Q),
        aux_pred_cls=torch.from_numpy(aux),
    )
    ours_vss = semantic_inference(logits, masks, img_size=IMG, output_size=OUT,
                                  padded_size=PADDED, aux_pred_cls=aux)
    assert (np.asarray(ours_vss) == ref_vss["pred_masks"].numpy()).all()


@pytest.mark.parametrize("seed", [9, 10])
def test_minvis_post_processing_matches_reference(oracle, seed):
    """Frame-by-frame embedding alignment (reference MinVIS.post_processing
    :373-419 + match_from_embds :362-371): identical aligned masks and
    time-meaned logits on generic random embeddings (unique optimum per
    frame, so the in-graph assignment must pick the scipy permutation)."""
    import functools

    import torch

    from dvis_plus_tpu.models.meta.minvis import minvis_post_processing

    rng = np.random.RandomState(seed)
    Tq, Qq, Kq, Cq, h4, w4 = 6, 7, 4, 16, 8, 12
    logits = rng.randn(Tq, Qq, Kq + 1).astype(np.float32)
    masks = rng.randn(Tq, Qq, h4, w4).astype(np.float32)
    embds = rng.randn(Tq, Qq, Cq).astype(np.float32)

    self_ns = types.SimpleNamespace()
    self_ns.match_from_embds = functools.partial(
        oracle.MinVIS.match_from_embds, self_ns
    )
    outputs = {
        "pred_logits": torch.from_numpy(logits)[None],  # (1, T, Q, K+1)
        "pred_masks": torch.from_numpy(
            np.transpose(masks, (1, 0, 2, 3))
        )[None],  # (1, Q, T, h, w)
        "pred_embds": torch.from_numpy(
            np.transpose(embds, (2, 0, 1))
        )[None],  # (1, C, T, Q)
    }
    ref = oracle.MinVIS.post_processing(self_ns, outputs)

    mean_logits, aligned = minvis_post_processing(logits, masks, embds)
    assert np.allclose(
        np.asarray(mean_logits), ref["pred_logits"][0].numpy(), atol=1e-5
    )
    assert np.allclose(
        np.asarray(aligned), ref["pred_masks"][0].numpy(), atol=1e-6
    )
