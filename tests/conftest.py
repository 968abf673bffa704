"""Test harness: force an 8-device CPU mesh before JAX initializes.

SURVEY.md section 4 item 4: multi-chip collectives logic is validated on a
virtual CPU mesh (xla_force_host_platform_device_count), never on real pods.

NOTE: in this image the axon TPU plugin overrides the JAX_PLATFORMS env var,
so we must force CPU via jax.config.update (which wins) -- otherwise every
test compiles for the real TPU chip and runs ~50x slower.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
