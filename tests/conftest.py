"""Test config: run on a virtual 8-device CPU mesh.

Tests never need the real TPU; sharding tests use
--xla_force_host_platform_device_count=8 (SURVEY.md's multi-chip test
strategy: both ends in one process, like the reference's ipcpipeline tests).
"""

import os

# Force CPU: the environment pins the axon TPU tunnel and its sitecustomize
# re-asserts jax_platforms="axon,cpu" at interpreter start, so the config must
# be overridden AFTER importing jax (env vars alone are not enough), and
# compiling every unit test through the tunnel is 20-40 s per program.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
