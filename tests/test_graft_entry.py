"""The driver's multi-chip gate, exercised the way the driver runs it.

Round 1's MULTICHIP record failed because `dryrun_multichip` let JAX
initialize the real TPU backend.  It is now self-contained: from an
arbitrary environment it re-execs itself with JAX_PLATFORMS=cpu and an
n-device virtual mesh.  These tests pin both paths.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_cpu_mesh_ready_detection(monkeypatch):
    import __graft_entry__ as ge

    # pytest conftest pins cpu + 8 virtual devices -> ready for 8, not 16
    assert ge._cpu_mesh_ready(8)
    assert not ge._cpu_mesh_ready(16)
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    # jax.config still says cpu (conftest), but no forced device count
    assert not ge._cpu_mesh_ready(8)


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # conftest env -> runs in-process


@pytest.mark.slow
def test_dryrun_multichip_driver_env():
    """Simulate the driver: default env (no CPU pin), import + call."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "AIT_DRYRUN_CHILD")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8): dp ok" in proc.stdout
