"""Round benchmark — runs on the real TPU chip; prints JSON lines to stdout.

North-star metrics (BASELINE.json / SURVEY.md §6), all on device:
- msm_g1_points_per_s_2e20  (headline; vs 1.0e6 points/s CPU-rayon anchor)
- poseidon2_hashes_per_s    (Pallas t=8 kernel, batch 2^16)
- ntt_2e13_ms / ntt_2e24_ms (single-chip radix-2 over Fr)
- deposit_prove_ms          (END-TO-END: real height-13/k=11 Shielder
  deposit proof through the device engine, committed pronto pk artifacts,
  real ppot SRS; reference baseline 600-800 ms client-side,
  README.md:37-41)

Budget-safety (rounds 2 and 3 both lost their numbers to a single section
overrunning the driver budget — VERDICT.md r03 "What's missing" #1):
- a CUMULATIVE result line is printed after EVERY section, so whatever has
  finished when the budget expires is recorded (the last line printed is
  the most complete one);
- cheap sections run first (poseidon2 -> ntt 2^13 -> MSM at the
  last-known-good window width); among the risky sections the ORDER IS BY
  VALUE: the end-to-end prove (the number comparable to the reference's
  headline) first, then ntt 2^24, then the MSM window experiment;
- risky sections each run in their OWN subprocess under a sub-budget
  computed from what is left of ZKOS_BENCH_TOTAL_BUDGET, so a hung
  compile cannot take the whole bench down with it;
- the prove section loads the committed pronto ProvingKey
  (artifacts/deposit_pk.bin via proof.serialize.unmarshall_pk) instead of
  re-running keygen, exactly as the reference's `new_pronto` path does
  (crates/shielder_bindings/src/circuits/mod.rs:89-101).

Measurement notes (tunneled single-chip setup):
- inputs are synthesized ON DEVICE from a scalar seed where possible;
- timings force a device->host fetch (block_until_ready can return before
  remote execution completes through the tunnel);
- each device->host sync costs ~50 ms through this tunnel, so the e2e
  proof number carries ~0.4 s of transport latency a local host would not
  pay (the six Fiat-Shamir round trips + artifact fetches).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Deterministic tracing: the device engine's CSE memo iterates dicts keyed
# by str-bearing dataclass hashes, so randomized string hashing produces a
# different (equivalent) jaxpr each process — and a different persistent
# compile-cache key, which forced the six phase graphs to recompile every
# bench run.  Pin the hash seed (re-exec once if needed).
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

from zkos_tpu.utils import machine as _machine

jax.config.update("jax_compilation_cache_dir",
                  _machine.cache_dir("/root/repo/.jax_cache", kind="device"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zkos_tpu.ops import curve_golden as CG  # noqa: E402
from zkos_tpu.ops import field as F  # noqa: E402
from zkos_tpu.ops import msm as M  # noqa: E402
from zkos_tpu.ops import ntt as NTT  # noqa: E402
from zkos_tpu.ops import poseidon2 as P2  # noqa: E402

MSM_LOG_N = 20
MSM_C_SAFE = 13      # last config that completed a full bench (BENCH_r02)
# c=16 profiled faster at 2^19 (profile_msm.py) but its XLA graph takes
# >900 s to compile on this 2-vCPU host (killed at the sub-budget in both
# r03's driver run and the r04 in-round run) — an unpayable cold-start
# even with the persistent cache, since a killed compile writes nothing.
# c=14 is the experiment: same sorted-scan pipeline, 2x buckets of c=13.
MSM_C_EXPERIMENT = 14
POSEIDON_LOG_B = 16
BASELINE_MSM_PTS_PER_S = 1.0e6
BASELINE_PROVE_MS = 700.0  # reference 600-800 ms midpoint

T_START = time.perf_counter()
TOTAL_BUDGET = float(os.environ.get("ZKOS_BENCH_TOTAL_BUDGET", "3000"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def budget_left(reserve: float = 30.0) -> float:
    return TOTAL_BUDGET - (time.perf_counter() - T_START) - reserve


def timeit(fn, *args, iters=3):
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(fn(jnp.uint32(1), *args))[0])  # compile+drain
    log(f"  compile+first-run: {time.perf_counter() - t0:.1f}s "
        f"(persistent-cache hit if well under the cold-compile minute mark)")
    times = []
    for k in range(2, 2 + iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(jnp.uint32(k), *args))[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def device_points_affine(n: int) -> jax.Array:
    base = [CG.GEN]
    for _ in range(63):
        base.append(CG.add(base[-1], base[-1]))
    host = jnp.asarray(M.points_to_affine_limbs(base))

    @jax.jit
    def build(b):
        return jnp.tile(b, (1, 1, -(-n // 64)))[:, :, :n]

    return build(host)


def _seeded_limbs(seed, shape):
    total = int(np.prod(shape))
    i = jnp.arange(total, dtype=jnp.uint32).reshape(shape)
    x = (i * np.uint32(2654435761) + seed * np.uint32(40503)) ^ (i >> 7)
    return (x * (seed + np.uint32(12345))) & np.uint32(0x3FFF)


def bench_msm(c: int) -> float:
    n = 1 << MSM_LOG_N
    pts = device_points_affine(n)
    np.asarray(pts[0, 0, :4])

    @jax.jit
    def msm_run(seed, p):
        sc = _seeded_limbs(seed, (F.N_LIMBS, n))
        return M.msm_window_sums(p, sc, c=c)

    t = timeit(msm_run, pts, iters=2)
    pps = n / t
    log(f"msm 2^{MSM_LOG_N} (c={c}, sorted prefix-scan + pallas): "
        f"{t*1e3:.1f} ms -> {pps:,.0f} points/s")
    return pps


def bench_poseidon() -> float:
    b = 1 << POSEIDON_LOG_B

    @jax.jit
    def run(seed):
        leaves = _seeded_limbs(seed, (F.N_LIMBS, 7, b))
        return jnp.sum(P2.hash_n_best(leaves), axis=1)

    t = timeit(run)
    log(f"poseidon2 t=8 (pallas) batch 2^{POSEIDON_LOG_B}: {t*1e3:.1f} ms "
        f"-> {b/t:,.0f} hashes/s")
    return b / t


def bench_ntt(log_n: int) -> float:
    """Per-transform wall-clock.  Small transforms are timed as a CHAIN of
    dependent NTTs inside one jit: a single 2^13 launch is dominated by
    the ~50 ms tunnel sync of the result fetch (measurement note above),
    which a local host would not pay and which buried the actual kernel
    time in r04's 23.94 ms reading."""
    nn = 1 << log_n
    fn = NTT.ntt_large if log_n >= 18 else NTT.ntt  # 4-step above HBM knee
    chain = 8 if log_n <= 16 else 1

    @jax.jit
    def run(seed):
        coeffs = _seeded_limbs(seed, (F.N_LIMBS, nn))
        for _ in range(chain):
            # dependent applications: no overlap, no dead-code elimination
            coeffs = fn(coeffs)
        return jnp.sum(coeffs, axis=1)

    t = timeit(run, iters=2 if log_n >= 20 else 3) / chain
    log(f"ntt 2^{log_n}{' (4-step)' if log_n >= 18 else ''}"
        f"{f' (x{chain} chain)' if chain > 1 else ''}: {t*1e3:.2f} ms")
    return t * 1e3


def bench_deposit_prove() -> float | None:
    """Real height-13 deposit proof, k=11 ppot SRS, device engine.

    Uses the committed pronto ProvingKey (artifacts/deposit_pk.bin) so the
    measured time is proving only — the reference's 600-800 ms number is
    likewise measured with pre-baked `new_pronto` keys.
    """
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests"))
        from test_artifacts import _deposit_knowledge  # noqa: PLC0415

        from zkos_tpu.models import shielder as sh
        from zkos_tpu.proof import plonk, serialize, srs as srs_mod

        art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts")
        meta = json.load(open(os.path.join(art, "deposit_meta.json")))
        t0 = time.perf_counter()
        srs11 = srs_mod.read(k=meta["k"])
        log(f"ppot k={meta['k']} SRS read: {time.perf_counter()-t0:.1f}s")

        pkn, root = _deposit_knowledge()
        builder = sh.build_deposit(meta["k"], pkn)
        cs = sh._cs_with_copies(meta["k"], builder)
        t0 = time.perf_counter()
        pk = serialize.unmarshall_pk(
            open(os.path.join(art, "deposit_pk.bin"), "rb").read(), cs, srs11)
        log(f"pronto pk load: {time.perf_counter()-t0:.1f}s")
        pub = pkn.public_input(root)

        import random as _random

        # compile + warm all six phase graphs
        t0 = time.perf_counter()
        proof = plonk.prove(pk, builder.advice, pub,
                            rng=_random.Random(7), engine="device")
        log(f"deposit prove #1 (compile+run): {time.perf_counter()-t0:.1f}s")
        times = []
        for i in range(2):
            t0 = time.perf_counter()
            proof = plonk.prove(pk, builder.advice, pub,
                                rng=_random.Random(8 + i), engine="device")
            times.append(time.perf_counter() - t0)
        t = min(times)
        ok = plonk.verify(pk.vk, proof, pub)
        log(f"deposit prove (height 13, k={meta['k']}, device): {t*1e3:.0f} ms, "
            f"verify={'OK' if ok else 'FAIL'} "
            f"(reference: 600-800 ms client-side)")
        assert ok
        return t * 1e3
    except Exception as e:  # noqa: BLE001 — report, don't sink the bench
        log(f"deposit prove bench unavailable: {type(e).__name__}: {e}")
        return None


def _sub(section: str, marker: str, min_budget: float,
         cap: float) -> float | None:
    """Run `python bench.py --<section>` in a budgeted subprocess; parse the
    `<marker> <float>` line from its stdout.  Returns None on timeout,
    crash, or insufficient remaining budget."""
    left = budget_left()
    budget = min(cap, left)
    if budget < min_budget:
        log(f"{section}: only {left:.0f}s of the {TOTAL_BUDGET:.0f}s total "
            f"budget left; skipped this run")
        return None
    try:
        sp = subprocess.run([sys.executable, __file__, f"--{section}"],
                            capture_output=True, timeout=budget, text=True)
        sys.stderr.write(sp.stderr)
        for line in sp.stdout.splitlines():
            if line.startswith(marker + " "):
                return float(line.split()[1])
        log(f"{section}: subprocess exited rc={sp.returncode} "
            f"without a {marker} line")
    except subprocess.TimeoutExpired:
        log(f"{section}: exceeded {budget:.0f}s sub-budget; skipped this run")
    return None


def main() -> None:
    dev = jax.devices()[0]
    log(f"bench device: {dev.platform} / {dev.device_kind}")

    res: dict = {}

    def emit() -> None:
        """Print the cumulative result line (last printed line = the most
        complete record; every line is a full, valid record)."""
        out = {
            "metric": f"msm_g1_points_per_s_2e{MSM_LOG_N}",
            "value": res.get("msm", 0.0),
            "unit": "points/s",
            "vs_baseline": round(res.get("msm", 0.0) / BASELINE_MSM_PTS_PER_S,
                                 4),
        }
        for k in ("msm_c", "poseidon2_hashes_per_s", "ntt_2e13_ms",
                  "ntt_2e24_ms", "deposit_prove_ms", "prove_vs_reference"):
            if k in res:
                out[k] = res[k]
        print(json.dumps(out), flush=True)

    # 1. cheap kernels first — numbers on the board within a few minutes
    try:
        res["poseidon2_hashes_per_s"] = round(bench_poseidon(), 1)
    except Exception as e:  # noqa: BLE001
        log(f"poseidon bench failed: {type(e).__name__}: {e}")
    emit()
    try:
        res["ntt_2e13_ms"] = round(bench_ntt(13), 2)
    except Exception as e:  # noqa: BLE001
        log(f"ntt 2^13 bench failed: {type(e).__name__}: {e}")
    emit()

    # 2. MSM at the last-known-good window width (the headline metric)
    try:
        res["msm"] = round(bench_msm(MSM_C_SAFE), 1)
        res["msm_c"] = MSM_C_SAFE
    except Exception as e:  # noqa: BLE001
        log(f"msm c={MSM_C_SAFE} bench failed: {type(e).__name__}: {e}")
    emit()

    # 3. risky sections, each in its own budgeted subprocess.
    # PROVE FIRST: deposit_prove_ms is the one number directly comparable
    # to the reference's 600-800 ms headline and it must never again lose
    # its budget to an experiment (VERDICT r04 "Next round" #1); ntt24
    # (never yet recorded) second; the MSM window experiment (an upside
    # attempt over an already-recorded number) last.
    if os.environ.get("ZKOS_BENCH_SKIP_PROVE") != "1":
        cap = float(os.environ.get("ZKOS_BENCH_PROVE_TIMEOUT", "2400"))
        ms = _sub("prove-only", "PROVE_MS", min_budget=60, cap=cap)
        if ms is not None:
            res["deposit_prove_ms"] = round(ms, 1)
            res["prove_vs_reference"] = round(BASELINE_PROVE_MS / ms, 3)
            emit()

    if os.environ.get("ZKOS_BENCH_SKIP_NTT24") != "1":
        ms = _sub("ntt24-only", "NTT24_MS", min_budget=60, cap=900)
        if ms is not None:
            res["ntt_2e24_ms"] = round(ms, 1)
            emit()

    if os.environ.get("ZKOS_BENCH_SKIP_MSM_EXP") != "1":
        pps = _sub("msm-experiment", "MSM_PPS", min_budget=60, cap=600)
        if pps is not None and pps > res.get("msm", 0.0):
            res["msm"] = round(pps, 1)
            res["msm_c"] = MSM_C_EXPERIMENT
            emit()

    emit()


if __name__ == "__main__":
    if "--prove-only" in sys.argv:
        ms = bench_deposit_prove()
        if ms is not None:
            print(f"PROVE_MS {ms}")
    elif "--msm-experiment" in sys.argv:
        print(f"MSM_PPS {bench_msm(MSM_C_EXPERIMENT)}")
    elif "--ntt24-only" in sys.argv:
        print(f"NTT24_MS {bench_ntt(24)}")
    else:
        main()
