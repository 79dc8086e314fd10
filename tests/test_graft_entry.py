"""Drive __graft_entry__ under driver-like conditions.

Round-1 post-mortem: the driver's multichip check ran ``dryrun_multichip(8)``
in a process with JAX_PLATFORMS=axon and ONE real chip — a condition no test
reproduced, so the failure escaped the suite. This test invokes the entry in
a fresh subprocess with the driver's env (axon platform pinned, no pytest
conftest, no forced device count) and asserts the self-provisioning path
succeeds.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_dryrun_multichip_under_driver_env():
    env = dict(os.environ)
    # Recreate the driver's shell: axon platform pinned, no virtual devices,
    # no inner-marker leakage from a previous run.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("VIDSITU_DRYRUN_INNER", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8) OK" in proc.stdout
