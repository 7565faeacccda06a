"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising pjit/shard_map logic without TPU
hardware (SURVEY.md §4d).  Must set the env vars before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# a sitecustomize.py may force JAX_PLATFORMS to a TPU plugin at interpreter
# startup; the config update below wins regardless of import order.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute e2e tests (deselect with `-m 'not slow'` for the "
        "fast tier; the 1-core host takes ~45 min for the full suite)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
