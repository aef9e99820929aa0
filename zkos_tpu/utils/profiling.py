"""Kernel timing + roofline accounting (the tracing/profiling subsystem).

SURVEY §5 names the TPU equivalents of the reference's tracing plane:
JAX-profiler traces and per-kernel roofline counters.  This module
provides both:

- ``KernelTimer``: wall-clock timing of jitted kernels that forces full
  execution with a tiny on-device reduction, so only a few bytes cross
  the host link (through the tunneled single-chip setup a full-output
  fetch costs more than the kernel; the prefix tensor of the 2^20 MSM
  is ~4.5 GB).
- ``roofline``: given the kernel's byte traffic and op count and the
  chip's peak bandwidth/throughput, reports achieved fraction of each
  ceiling and which one binds.
- ``trace``: a context manager around jax.profiler for full xprof
  traces when running on real hardware (``ZKOS_TRACE_DIR``).

Used by profile_msm.py / scaling_report.py; unit-tested on CPU.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field as dc_field

import jax
import jax.numpy as jnp
import numpy as np

#: per-chip peaks used for roofline fractions (v5e defaults; override
#: per call).  Sources: public TPU v5e specs — HBM ~819 GB/s, and an
#: effective u32 VPU throughput ceiling of ~1e12 lane-ops/s.
DEFAULT_PEAKS = {"hbm_gbps": 819.0, "vpu_ops_per_s": 1.0e12}


def _tiny(tree):
    """Scalar reduction over every leaf (forces full materialization)."""
    return sum(jnp.sum(leaf[..., ::17].astype(jnp.uint32))
               for leaf in jax.tree.leaves(tree))


@dataclass
class KernelRecord:
    name: str
    median_s: float
    times_s: list
    bytes_touched: int | None = None
    ops: int | None = None
    roofline: dict | None = None


@dataclass
class KernelTimer:
    """Times jitted callables; collects records for a report."""

    iters: int = 3
    records: list = dc_field(default_factory=list)

    def measure(self, name: str, fn, *args, bytes_touched: int | None = None,
                ops: int | None = None, peaks: dict | None = None
                ) -> KernelRecord:
        timed = jax.jit(lambda *a: _tiny(fn(*a)))
        np.asarray(timed(*args))  # compile + drain
        times = []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            np.asarray(timed(*args))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        rec = KernelRecord(name=name, median_s=med, times_s=times,
                           bytes_touched=bytes_touched, ops=ops)
        if bytes_touched is not None or ops is not None:
            rec.roofline = roofline(med, bytes_touched, ops, peaks)
        self.records.append(rec)
        return rec

    def report(self) -> str:
        lines = []
        for r in self.records:
            line = f"{r.name:30s} {r.median_s * 1e3:9.2f} ms"
            if r.roofline:
                line += (f"  bound={r.roofline['bound']}"
                         f" hbm={r.roofline.get('hbm_frac', 0):.1%}"
                         f" vpu={r.roofline.get('vpu_frac', 0):.1%}")
            lines.append(line)
        return "\n".join(lines)


def roofline(seconds: float, bytes_touched: int | None, ops: int | None,
             peaks: dict | None = None) -> dict:
    """Achieved fraction of each hardware ceiling + the binding one.

    bytes_touched: HBM traffic the kernel must move (read+write).
    ops: vector-lane operations (u32 MAC/add equivalents).
    """
    peaks = {**DEFAULT_PEAKS, **(peaks or {})}
    out: dict = {}
    if bytes_touched is not None:
        achieved = bytes_touched / seconds / 1e9
        out["hbm_gbps"] = achieved
        out["hbm_frac"] = achieved / peaks["hbm_gbps"]
    if ops is not None:
        achieved_ops = ops / seconds
        out["vpu_ops_per_s"] = achieved_ops
        out["vpu_frac"] = achieved_ops / peaks["vpu_ops_per_s"]
    fracs = {k[:-5]: v for k, v in out.items() if k.endswith("_frac")}
    out["bound"] = max(fracs, key=fracs.get) if fracs else "unknown"
    # speed-of-light time if the binding ceiling were saturated
    if fracs:
        out["sol_s"] = seconds * max(fracs.values())
    return out


@contextlib.contextmanager
def trace(name: str = "zkos"):
    """jax.profiler trace capture into $ZKOS_TRACE_DIR (no-op if unset).

    Produces xprof/tensorboard-compatible traces on real hardware —
    the reference's tracing-subscriber analog for kernels.
    """
    trace_dir = os.environ.get("ZKOS_TRACE_DIR")
    if not trace_dir:
        yield None
        return
    path = os.path.join(trace_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield path


# -- traffic/op models for this repo's hot kernels ---------------------------

def msm_traffic_model(n: int, c: int, steps: int) -> dict:
    """Approximate HBM bytes + lane-ops for msm_window_sums at (n, c).

    Per window every point is mixed-added once into the prefix scan
    (the dominant phase); an 18-limb field mul is ~18^2 MACs + carries.
    """
    w = -(-254 // c) + (1 if c * (-(-254 // c)) == 254 else 0)
    limb_bytes = 18 * 4
    muls_per_mixed_add = 11
    ops_per_mul = 18 * 18 + 3 * 18
    scan_bytes = steps and (n * w * (2 + 3) * limb_bytes)  # read xs + rw acc
    sort_bytes = n * w * 2 * limb_bytes * 2  # gather in+out, packed rows
    return {
        "bytes": scan_bytes + sort_bytes,
        "ops": n * w * muls_per_mixed_add * ops_per_mul,
        "windows": w,
    }
