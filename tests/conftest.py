"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths compile and run without TPU hardware.

The container's sitecustomize registers the axon TPU backend in every
interpreter and pins JAX_PLATFORMS=axon, so plain env vars are not enough;
we switch platforms through jax.config before any backend initializes
(backends init lazily on first use, after conftest import)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon TPU tunnel is bench-only

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
