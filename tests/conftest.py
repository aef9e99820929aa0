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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in _flags:
    # XLA:CPU in-process collectives abort the PROCESS when one partition
    # reaches a rendezvous >40s before another; 8 virtual devices on 2
    # cores legitimately skew that much inside large GSPMD modules.
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=3600"
               " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = _flags

# Tests default to the host-golden prover engine: the device engine's jitted
# phase graphs take many minutes to compile on the 2-vCPU XLA:CPU backend,
# and its correctness is pinned by dedicated byte-exactness tests
# (tests/test_engine_device.py) plus the TPU bench, which drives the device
# engine end-to-end on real hardware.  Production default stays "device"
# (zkos_tpu/proof/plonk.py DEFAULT_ENGINE).
os.environ.setdefault("ZKOS_PROVER_ENGINE", "host")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache on the CPU backend: this jaxlib's
# cpu_aot_loader rejects every AOT entry at load time (its own
# "+prefer-no-scatter/gather" pseudo-features fail the host feature
# check), so cache writes cost serialization time and disk for entries
# that can never be read back.  The TPU bench keeps its own cache
# (.jax_cache/<machine-fingerprint>), which does round-trip.

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
