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

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(3)
