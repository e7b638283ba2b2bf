"""Real-weights readiness runbook guard (VERDICT r4 next #6).

``tools/zoo_runbook.py --dry-run`` must keep proving the whole zoo-weights
command path — synthetic reference-keyed .pth -> convert+coverage -> real
eval CLI -> results.json -> row-level differ — so that the day MODEL_ZOO
checkpoints appear, the one-command parity verdict documented in
GETTING_STARTED.md just works.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_zoo_runbook_dry_run(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "zoo_runbook.py"),
         "--dry-run", "--output-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = proc.stdout
    assert "[runbook] convert: filled" in out and "0 mismatched" in out
    assert "[runbook] eval: ytvis_2019_val" in out
    assert '"ok": true' in out
    assert "[runbook] OK" in out
