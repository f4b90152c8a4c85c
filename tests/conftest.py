"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so every sharding/parallelism test runs without TPU hardware
(this also covers the reference's untested multi-device gap — SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# the axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms ("axon,cpu") — put it back to pure CPU so the virtual
# 8-device mesh is what tests see.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the tiny test models cost minutes to compile on
# CPU the first time; cached re-runs are seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cbl_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
