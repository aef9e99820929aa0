"""Kernel timer + roofline accounting (utils.profiling)."""

import jax.numpy as jnp

from zkos_tpu.utils import profiling as prof


def test_kernel_timer_measures_and_reports():
    t = prof.KernelTimer(iters=2)
    rec = t.measure("add", lambda x: x + 1, jnp.arange(1024),
                    bytes_touched=8192, ops=1024)
    assert rec.median_s > 0
    assert rec.roofline is not None and "bound" in rec.roofline
    rep = t.report()
    assert "add" in rep and "bound=" in rep


def test_roofline_fractions_and_binding_ceiling():
    # 1 GB moved in 0.01 s = 100 GB/s ~ 12% of the 819 GB/s ceiling
    r = prof.roofline(0.01, bytes_touched=10**9, ops=10**6)
    assert abs(r["hbm_gbps"] - 100.0) < 1e-6
    assert 0.11 < r["hbm_frac"] < 0.13
    assert r["bound"] == "hbm"  # ops fraction is negligible here
    # speed-of-light projection scales by the binding fraction
    assert abs(r["sol_s"] - 0.01 * r["hbm_frac"]) < 1e-12
    # compute-bound case
    r2 = prof.roofline(0.01, bytes_touched=10**3, ops=10**11)
    assert r2["bound"] == "vpu"


def test_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("ZKOS_TRACE_DIR", raising=False)
    with prof.trace("x") as p:
        assert p is None


def test_msm_traffic_model_shapes():
    m = prof.msm_traffic_model(1 << 20, 13, 64)
    assert m["windows"] == 20
    assert m["ops"] > 10**9  # ~8e10 lane-ops at 2^20
    assert m["bytes"] > 10**8
