"""Round benchmark — runs on the real TPU chip; prints ONE JSON line to stdout.

North-star metrics (BASELINE.json / SURVEY.md §6), all on device:
- msm_g1_points_per_s_2e20  (headline; vs 1.0e6 points/s CPU-rayon anchor)
- poseidon2_hashes_per_s    (Pallas t=8 kernel, batch 2^16)
- ntt_2e13_ms / ntt_2e24_ms (single-chip radix-2 over Fr)
- deposit_prove_ms          (END-TO-END: real height-13/k=11 Shielder
  deposit proof through the device engine, real ppot SRS; reference
  baseline 600-800 ms client-side, README.md:37-41)

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
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zkos_tpu.ops import curve_golden as CG  # noqa: E402
from zkos_tpu.ops import field as F  # noqa: E402
from zkos_tpu.ops import msm as M  # noqa: E402
from zkos_tpu.ops import ntt as NTT  # noqa: E402
from zkos_tpu.ops import poseidon2 as P2  # noqa: E402

MSM_LOG_N = 20
MSM_C = 16  # W=16 windows; profiled fastest on v5e (profile_msm.py)
POSEIDON_LOG_B = 16
BASELINE_MSM_PTS_PER_S = 1.0e6
BASELINE_PROVE_MS = 700.0  # reference 600-800 ms midpoint


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=3):
    np.asarray(jax.tree.leaves(fn(jnp.uint32(1), *args))[0])  # compile+drain
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


def bench_msm() -> float:
    n = 1 << MSM_LOG_N
    pts = device_points_affine(n)
    np.asarray(pts[0, 0, :4])

    @jax.jit
    def msm_run(seed, p):
        sc = _seeded_limbs(seed, (F.N_LIMBS, n))
        return M.msm_window_sums(p, sc, c=MSM_C)

    t = timeit(msm_run, pts)
    pps = n / t
    log(f"msm 2^{MSM_LOG_N} (c={MSM_C}, sorted prefix-scan + pallas): "
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
    nn = 1 << log_n
    fn = NTT.ntt_large if log_n >= 18 else NTT.ntt  # 4-step above HBM knee

    @jax.jit
    def run(seed):
        coeffs = _seeded_limbs(seed, (F.N_LIMBS, nn))
        return jnp.sum(fn(coeffs), axis=1)

    t = timeit(run, iters=2 if log_n >= 20 else 3)
    log(f"ntt 2^{log_n}{' (4-step)' if log_n >= 18 else ''}: {t*1e3:.2f} ms")
    return t * 1e3


def bench_deposit_prove() -> float | None:
    """Real height-13 deposit proof, k=11 ppot SRS, device engine."""
    try:
        from zkos_tpu.models import shielder as sh
        from zkos_tpu.protocol import contract, merkle, notes, secrets
        from zkos_tpu.proof import srs as srs_mod

        t0 = time.perf_counter()
        srs11 = srs_mod.read(k=11)
        log(f"ppot k=11 SRS read: {time.perf_counter()-t0:.1f}s")
        id_ = secrets.generate_user_id(777)
        tree = merkle.MerkleTree(height=13)
        nul = secrets.derive_nullifier(id_, 0)
        idx = tree.add_note(notes.make_note(id_, nul, 1_000_000, 0))
        path = merkle.path_to_matrix(tree.get_merkle_path(idx))
        root = tree.get_merkle_path(idx)[-1]
        pkn = sh.DepositProverKnowledge(
            id=id_, nullifier_old=nul, account_old_balance=1_000_000,
            token_address=0, path=path, value=77,
            commitment=contract.deposit_commitment(0xAA, 0),
            nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
        builder = sh.build_deposit(11, pkn)
        pub = pkn.public_input(root)

        from zkos_tpu.proof import plonk

        t0 = time.perf_counter()
        cs = sh._cs_with_copies(11, builder)
        pk, vk = plonk.keygen(cs, srs11, builder.fixed, engine="device")
        log(f"device keygen (k=11): {time.perf_counter()-t0:.1f}s")

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
        ok = plonk.verify(vk, proof, pub)
        log(f"deposit prove (height 13, k=11, device): {t*1e3:.0f} ms, "
            f"verify={'OK' if ok else 'FAIL'} "
            f"(reference: 600-800 ms client-side)")
        assert ok
        return t * 1e3
    except Exception as e:  # noqa: BLE001 — report, don't sink the bench
        log(f"deposit prove bench unavailable: {type(e).__name__}: {e}")
        return None


def main() -> None:
    t_start = time.perf_counter()
    dev = jax.devices()[0]
    log(f"bench device: {dev.platform} / {dev.device_kind}")

    msm_pps = bench_msm()
    poseidon = bench_poseidon()
    ntt13 = bench_ntt(13)
    ntt24 = None
    if os.environ.get("ZKOS_BENCH_SKIP_NTT24") != "1":
        try:
            ntt24 = bench_ntt(24)
        except Exception as e:  # noqa: BLE001
            log(f"ntt 2^24 unavailable: {type(e).__name__}: {e}")

    out = {
        "metric": f"msm_g1_points_per_s_2e{MSM_LOG_N}",
        "value": round(msm_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_pps / BASELINE_MSM_PTS_PER_S, 4),
        "poseidon2_hashes_per_s": round(poseidon, 1),
        "ntt_2e13_ms": round(ntt13, 2),
    }
    if ntt24 is not None:
        out["ntt_2e24_ms"] = round(ntt24, 1)
    # Emit the kernel metrics NOW: if the driver's budget expires during the
    # prove section below, this round still records its perf numbers (round 2
    # lost all metrics to exactly that, VERDICT.md "What's missing" #1).
    print(json.dumps(out), flush=True)

    prove_ms = None
    if os.environ.get("ZKOS_BENCH_SKIP_PROVE") != "1":
        # run in a budgeted subprocess: the six phase graphs compile for
        # many minutes on a cold cache, and a driver-side bench run must
        # never hang past its budget (warm-cache runs take seconds).  The
        # budget is the smaller of ZKOS_BENCH_PROVE_TIMEOUT and what is
        # left of the total bench budget after the kernel sections.
        import subprocess

        total = float(os.environ.get("ZKOS_BENCH_TOTAL_BUDGET", "3000"))
        left = total - (time.perf_counter() - t_start) - 30.0
        budget = min(float(os.environ.get("ZKOS_BENCH_PROVE_TIMEOUT", "2400")),
                     left)
        if budget < 60:
            log(f"deposit prove bench: only {left:.0f}s of the "
                f"{total:.0f}s total budget left; skipped this run")
        else:
            try:
                sp = subprocess.run(
                    [sys.executable, __file__, "--prove-only"],
                    capture_output=True, timeout=budget, text=True)
                sys.stderr.write(sp.stderr)
                for line in sp.stdout.splitlines():
                    if line.startswith("PROVE_MS "):
                        prove_ms = float(line.split()[1])
            except subprocess.TimeoutExpired:
                log(f"deposit prove bench: exceeded {budget:.0f}s budget "
                    f"(cold compile cache); skipped this run")

    if prove_ms is not None:
        out["deposit_prove_ms"] = round(prove_ms, 1)
        out["prove_vs_reference"] = round(BASELINE_PROVE_MS / prove_ms, 3)
        # updated line (supersedes the kernel-only line above)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--prove-only" in sys.argv:
        ms = bench_deposit_prove()
        if ms is not None:
            print(f"PROVE_MS {ms}")
    else:
        main()
