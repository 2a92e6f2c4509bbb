"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated the way the driver does it —
`xla_force_host_platform_device_count` — so tests never need TPU hardware.

Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough; `jax.config.update` wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU aborts a collective whose participants straggle >40 s; on a
    # 1-core host the 8 virtual devices execute serially, so the sharded
    # step tests trip it under load.  Raise the bound (correctness gate,
    # not a speed gate).
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the CLI e2e tests spawn subprocess compiles of
# the full detector program; on this 1-vCPU host a cold XLA-CPU compile of
# that program is minutes.  The cache is keyed on HLO+platform, so sharing
# the repo-level dir with the TPU tools is safe.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import subprocess

import numpy as np
import pytest

# Build the native .so once per session if missing so the native-loader and
# s2d tests execute on a fresh checkout instead of skipping (the build is a
# few seconds; failures degrade to the previous skip behavior).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "native", "libait_native.so")
if not os.path.exists(_SO):
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            check=False, capture_output=True, timeout=120)
    except Exception:
        pass


@pytest.fixture
def rng():
    return np.random.RandomState(3)


@pytest.fixture(autouse=True)
def _isolate_reference_cfg():
    """Restore the reference's global cfg EasyDict after every test.

    Several parity tests mutate `model.utils.config.cfg` (ANCHOR_SCALES,
    NMS tops, scales, ...) for their scenario; without a restore the next
    test that builds a torch reference model inherits those — a real
    order-dependent failure (12-anchor rpn head vs the converter's 9).
    ref_harness.install() snapshots the import-time defaults; this puts
    them back in place."""
    yield
    import sys as _sys
    rh = _sys.modules.get("ref_harness")
    if rh is not None:
        rh.restore_cfg()
