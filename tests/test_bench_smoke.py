"""Wall-clock-capped bench.py CI guard (mirrors test_dryrun_multichip).

BENCH_r04 regressed to a driver timeout (rc:124, parsed:null) because
main() chained six sections and printed one JSON at the very end. This test
runs ``python bench.py`` in DVIS_BENCH_SMOKE=1 mode (tiny shapes, CPU, R50
standing in for the big backbones) under a subprocess timeout and asserts
the timeout-proof output contract:

  * at least one flushed JSON line per completed section (cumulative), so a
    driver timeout still yields every number measured so far;
  * every line carries the {metric, value, unit, vs_baseline} schema;
  * the last line carries all smoke sections' numbers.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke_emits_cumulative_json_per_section(tmp_path):
    env = dict(os.environ)
    env.update(
        DVIS_BENCH_SMOKE="1",
        DVIS_BENCH_DEADLINE_S="1500",
        DVIS_BENCH_COMPILE_CACHE="0",
        JAX_PLATFORMS="cpu",
    )
    env.pop("XLA_FLAGS", None)  # single CPU device is fine (and faster)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    lines = [
        json.loads(ln) for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    # one cumulative emission per smoke section (none should error/skip
    # under the generous test deadline)
    assert len(lines) == 4, proc.stdout
    for ln in lines:
        assert {"metric", "value", "unit", "vs_baseline"} <= set(ln), ln
        assert "errors" not in ln, ln
        assert "skipped" not in ln, ln

    # after section 1 the fallback headline must already be valid
    first = lines[0]
    assert first["metric"].endswith("r50_online_720p")
    assert first["value"] == first["r50_online_fps_per_chip"] > 0

    # the last line is cumulative: every section's number + the restored
    # headline metric
    last = lines[-1]
    assert last["metric"].endswith("swinl_offline_720p")
    assert last["value"] > 0  # smoke swinl stand-in
    assert last["r50_online_fps_per_chip"] > 0
    assert last["daq_r50_online_fps_per_chip"] > 0
    assert last["e2e_eval_fps_r50_online"] > 0
    assert last["host_rle_s_per_video_r50"] >= 0
    assert set(last["section_s"]) == {
        "r50_online", "daq", "swinl_offline", "e2e_r50"
    }


def test_bench_deadline_skips_sections():
    """Deadline 0 => every section is skipped and recorded, each emission
    still a parseable cumulative line (the degenerate early-timeout case)."""
    env = dict(os.environ)
    env.update(
        DVIS_BENCH_SMOKE="1",
        DVIS_BENCH_DEADLINE_S="0",
        DVIS_BENCH_COMPILE_CACHE="0",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=240, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [
        json.loads(ln) for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    assert len(lines) == 4
    assert lines[-1]["skipped"] == [
        "r50_online", "daq", "swinl_offline", "e2e_r50"
    ]
