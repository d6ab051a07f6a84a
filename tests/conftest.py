"""Test env: force an 8-device virtual CPU mesh before jax initializes.

This gives real multi-device (DP/shard_map) coverage on any host — something
the reference's test suite cannot do (its distributed path is only exercised
on real GPU clusters; see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon (the
# remote-TPU relay) before conftest runs, freezing the config default; the
# env var alone is too late. Override the live config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
