"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU backend at interpreter start,
so forcing CPU must happen via jax.config (env vars alone are overridden).
Multi-chip sharding is validated without TPU hardware via
--xla_force_host_platform_device_count; the real-TPU path is exercised by
bench.py / __graft_entry__.py.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
