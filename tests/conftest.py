"""Test configuration: force an 8-virtual-device CPU JAX backend.

Tests validate numerics against NumPy oracles and multi-chip sharding layouts
without TPU hardware (SURVEY.md §4): XLA's CPU backend is split into 8
virtual devices so shard_map layouts compile and execute exactly as they
would on a v5e-8 slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
