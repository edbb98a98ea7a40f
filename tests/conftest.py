"""Test configuration: force an 8-virtual-device CPU backend so sharding and
collective tests run without TPU hardware (SURVEY.md §4 pattern)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon harness pins JAX_PLATFORMS=axon via sitecustomize; override after
# import (before any backend initialization) so tests run on the virtual
# 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
