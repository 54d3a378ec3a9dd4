"""Test environment: force CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual device mesh
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), per the test
strategy in SURVEY.md §4 — the reference has no tests at all, so the
oracles here are numpy/scipy re-derivations of its documented math.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU-tunnel plugin (sitecustomize) overrides JAX_PLATFORMS via
# jax.config; force CPU back explicitly so unit tests never dispatch over
# the tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
