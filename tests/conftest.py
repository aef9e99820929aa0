"""Test configuration: run on a virtual 8-device CPU mesh.

NOTE this environment force-registers the "axon" TPU platform via a baked
sitecustomize and `JAX_PLATFORMS=axon`; plain env vars do NOT select the CPU
backend.  We must call `jax.config.update("jax_platforms", "cpu")` after
import (and set XLA_FLAGS before the CPU client is instantiated) to get the
virtual 8-device CPU mesh that sharding tests rely on.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Tests default to the host-golden prover engine: the device engine's jitted
# phase graphs take many minutes to compile on the 2-vCPU XLA:CPU backend,
# and its correctness is pinned by dedicated byte-exactness tests
# (tests/test_engine_device.py) plus the TPU bench, which drives the device
# engine end-to-end on real hardware.  Production default stays "device"
# (zkos_tpu/proof/plonk.py DEFAULT_ENGINE).
os.environ.setdefault("ZKOS_PROVER_ENGINE", "host")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# CPU-side persistent cache lives in its OWN directory: concurrent
# writes from a TPU bench/warm process into the same cache dir were
# observed to segfault readers mid-deserialization (two full-suite
# crashes in jax compilation_cache.get_executable_and_time)
from zkos_tpu.utils import machine as _machine  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  _machine.cache_dir("/root/repo/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _stop_leaked_service_threads():
    """Stop any Taskmaster monitor/worker threads a test leaked.

    A BalanceMonitor loop left running bleeds into later tests (observed
    still sampling during unrelated XLA compiles in full-suite crash
    dumps); shut every live fleet down after each test.
    """
    yield
    from zkos_tpu.srv import relayer

    relayer.shutdown_all()


def pytest_sessionstart(session):
    # fail fast if the virtual device mesh is unavailable
    assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
