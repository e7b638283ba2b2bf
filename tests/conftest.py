"""Test harness: force CPU backend with a virtual 8-device mesh so sharding
tests run anywhere (SURVEY §4 implication (c)).

Note: the axon TPU plugin's sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at import, overriding the
JAX_PLATFORMS env var — so we must re-override the config after import.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()


import pytest  # noqa: E402

# Heavy tests pushed to the full lane (`pytest -m slow` / unfiltered CI run)
# to keep the default `-m "not slow"` lane fast (VERDICT r2 weak #9: <5 min).
# Central list rather than per-file decorators so the lane budget is
# maintained in one place; times are CPU seconds from --durations runs.
_SLOW_NODES = {
    "test_daq.py::test_daq_streaming_inference",           # 135s fixture
    "test_daq.py::test_daq_cutter_window_scan_matches_per_frame",
    "test_daq.py::test_daq_offline_refine",
    "test_minvis_e2e.py::test_post_processing_and_inference",
    "test_minvis_e2e.py::test_post_processing_permutation_invariance",
    "test_tracker.py::test_streaming_matches_full_clip",
    "test_tracker.py::test_tracker_train_emits_aux",
    "test_tracker.py::test_tracker_shapes_eval",
    "test_backbones.py::test_swin_nondivisible_input",
    "test_losses.py::test_criterion_jits_and_grads",
    "test_losses.py::test_clip_match_recovers_permutation",
    "test_losses.py::test_criterion_perfect_beats_noise",
    "test_losses.py::test_consistent_match_recovers_permutation",
    "test_flash_attn.py::test_vit_trunk_flash_flag_param_compatible",
    "test_flash_attn.py::test_cpu_fallback_is_dense_bitexact",
    "test_swin_fused_attn.py::test_swin_backbone_fused_flag_cpu_fallback",
    "test_ctvis.py::test_ctvis_loss_separates_good_bad",
    "test_video_maskformer.py::test_image_maskformer",
    "test_msdeform_pallas.py::test_border_samples_zero_padded",
    "test_msdeform_pallas.py::test_single_level_bigger_tiles",
    "test_msdeform.py::test_forward_matches_oracle",
    "test_refiner_offline.py::test_windowed_mask_head_matches_full_forward",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1].split("[")[0]
        if rel in _SLOW_NODES:
            item.add_marker(pytest.mark.slow)
