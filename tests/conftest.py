"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and a persistent compilation cache (this host has 1 CPU core; XLA
compiles are expensive — the cache makes re-runs fast)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import pytest

import jax

# NB: on this machine the experimental 'axon' TPU plugin overrides the
# JAX_PLATFORMS env var — the config API is the only reliable way to pin the
# test suite to the (8-virtual-device) CPU backend.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def tiny_cfg():
    """The one canonical tiny config — keep shapes identical across tests so
    each jit program compiles once per session (and hits the on-disk cache
    across sessions)."""
    from phdslam_tpu.config import load_config

    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=8, maxFeatures=16, maxMeasurements=8,
        birthWeight=1e-3, y0=0.0)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
