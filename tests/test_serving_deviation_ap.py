"""Serving-deviation AP guard (VERDICT r3 next #3).

The serving defaults deviate from the reference's train-what-you-serve
numerics (bf16 compute + bf16 deformable values vs the fp32 island in
msdeformattn.py:314; auction LAP vs scipy linear_sum_assignment). This test
overfits the staged DVIS++ recipe with PARITY settings and asserts that
evaluating the SAME weights under every serving knob keeps AP within a small
tolerance on the easy synthetic set — if a knob ever costs real AP here, the
serving default must flip (the measured per-knob table lives in PARITY.md,
produced by tools/serving_deviation_ap.py on the real chip).
"""
import pytest

pytestmark = pytest.mark.slow

TOL = 0.05  # easy overfit set: any real deviation shows up far above this


def test_serving_knobs_preserve_overfit_ap(synth_dataset, tmp_path):  # noqa: F811
    from tools.serving_deviation_ap import measure

    res = measure(str(tmp_path), steps_scale=1.0)
    for arch in ("online", "offline"):
        base = res[arch]["parity"]
        assert base > 0.2, res
        for name, ap in res[arch].items():
            assert ap >= base - TOL, (arch, name, res)


def test_swin_serving_knobs_preserve_overfit_ap(synth_dataset, tmp_path):  # noqa: F811
    """The headline bench serves swin_fast_softmax (bf16 attention scores);
    this guards that the knob never costs AP vs the fp32-parity weights
    (VERDICT r4 next #3 — the TPU-only fused_attn row is additionally
    measured on the real chip by tools/serving_deviation_ap.py)."""
    from tools.serving_deviation_ap import measure_swin

    res = measure_swin(str(tmp_path), steps_scale=1.0)
    base = res["swin"]["parity"]
    assert base > 0.2, res
    for name, ap in res["swin"].items():
        assert ap >= base - TOL, (name, res)


def test_vit_serving_knobs_preserve_overfit_ap(synth_dataset, tmp_path):  # noqa: F811
    """ViT-Adapter serving knobs: vit_flash_attention (served by the vitl
    bench) and the coarse stride-8 extractor deviation — the SAME overfit
    weights must keep AP under each knob (the coarse knob is an
    approximation; this is its evidence gate)."""
    from tools.serving_deviation_ap import measure_vit

    res = measure_vit(str(tmp_path), steps_scale=1.0)
    base = res["vit"]["parity"]
    assert base > 0.2, res
    for name, ap in res["vit"].items():
        assert ap >= base - TOL, (name, res)


from tests.test_data import synth_dataset  # noqa: F401,E402
