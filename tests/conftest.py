"""Test harness: force an 8-device CPU mesh before JAX initializes.

SURVEY.md section 4 item 4: multi-chip collectives logic is validated on a
virtual CPU mesh (xla_force_host_platform_device_count), never on real pods.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
