"""Test configuration: force an 8-virtual-device CPU JAX backend.

Tests validate numerics against NumPy oracles and multi-chip sharding layouts
without TPU hardware (SURVEY.md §4): XLA's CPU backend is split into 8
virtual devices so shard_map layouts compile and execute exactly as they
would on a v5e-8 slice.
"""

import os

# The environment's sitecustomize registers the TPU ("axon") backend and
# forces jax_platforms — plain env vars are overridden, so pin the platform
# through jax.config *before* any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # fresh, fixed-seed generator per test: results never depend on test order
    return np.random.default_rng(1234)
