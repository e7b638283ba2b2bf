"""Wall-clock-capped dryrun_multichip CI guard.

MULTICHIP_r03 regressed to a driver timeout (rc:124) because the dryrun's
sections outgrew the wall clock. This test runs the REAL
``dryrun_multichip(2)`` under a hard ``signal.alarm`` so any future budget
blowup fails CI instead of the round artifact. 2 devices (not 8) keeps the
CPU cost proportional; the graphs compiled are the same ones the driver's
8-device run compiles, so a super-linear compile regression shows up here.
"""
import os
import signal

import pytest


@pytest.mark.slow
def test_dryrun_multichip_2_within_wall_clock():
    if os.name != "posix":
        pytest.skip("signal.alarm is POSIX-only")

    import jax

    if len(jax.devices("cpu")) < 2:
        pytest.skip(
            "needs >=2 cpu devices (tests/conftest.py sets "
            "xla_force_host_platform_device_count)"
        )

    def _timeout(signum, frame):
        raise TimeoutError(
            "dryrun_multichip(2) exceeded the CI wall clock — the driver's "
            "8-device run WILL time out (MULTICHIP rc:124). Shrink the "
            "offending section (see __graft_entry__ markers)."
        )

    from __graft_entry__ import dryrun_multichip

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(480)
    try:
        dryrun_multichip(2)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
