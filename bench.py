"""Round benchmark — runs on the real TPU chip; prints ONE JSON line to stdout.

Headline metric: Pippenger MSM throughput on BN254 G1 (the dominant cost of
halo2 proving — per-column commitments + BDFG21 opens, SURVEY.md §2.2).
Secondary diagnostics (Poseidon2 hashes/s, NTT wall-clock) go to stderr.

``vs_baseline`` compares against 1.0e6 points/s — the ballpark of the
reference stack's multicore-CPU Pippenger (halo2_proofs + rayon; the
reference publishes only end-to-end 600-800 ms proving times, README.md:37-41,
so this is the derived per-kernel anchor).
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zkos_tpu.ops import curve as C  # noqa: E402
from zkos_tpu.ops import field as F  # noqa: E402
from zkos_tpu.ops import field_golden as G  # noqa: E402
from zkos_tpu.ops import msm as M  # noqa: E402
from zkos_tpu.ops import ntt as NTT  # noqa: E402
from zkos_tpu.ops import poseidon2 as P2  # noqa: E402

MSM_LOG_N = 16
POSEIDON_LOG_B = 14
NTT_LOG_N = 13

BASELINE_MSM_PTS_PER_S = 1.0e6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _materialize(out):
    return [np.asarray(x) for x in jax.tree.leaves(out)]


def timeit(fn, arg_sets):
    """Median wall time over distinct input sets, forcing a host fetch.

    Two quirks of the tunneled TPU backend: repeated executions with
    identical inputs are memoized, and ``block_until_ready`` can return
    before execution completes — so every iteration uses fresh inputs and is
    timed through an explicit device-to-host fetch of the (small) output.
    """
    _materialize(fn(*arg_sets[0]))  # warmup/compile + queue drain
    times = []
    for args in arg_sets:
        t0 = time.perf_counter()
        _materialize(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def device_points(n: int, seed: int = 5) -> jax.Array:
    """n valid G1 points: random-ish multiples of G built by doubling on device."""
    g = jnp.asarray(C.point_from_affine_ints([(1, 2)]))  # (3, 18, 1)
    doubles = [g]
    for _ in range(63):
        doubles.append(C.ec_double(doubles[-1]))
    base = jnp.concatenate(doubles, axis=-1)  # (3, 18, 64) = 2^i * G
    reps = -(-n // 64)
    return jnp.tile(base, (1, 1, reps))[:, :, :n]


def main() -> None:
    dev = jax.devices()[0]
    log(f"bench device: {dev.platform} / {dev.device_kind}")
    rng = np.random.default_rng(5)

    iters = 3

    # --- MSM (headline) ---
    n = 1 << MSM_LOG_N
    pts = device_points(n)
    scalar_sets = [
        (pts, jnp.asarray(rng.integers(0, 1 << 15,
                                       size=(F.N_LIMBS, n), dtype=np.uint32)))
        for _ in range(iters)]
    t = timeit(lambda p, s: M.msm_mont(p, s, c=8), scalar_sets)
    msm_pps = n / t
    log(f"msm 2^{MSM_LOG_N}: {t*1e3:.1f} ms -> {msm_pps:,.0f} points/s")

    # --- Poseidon2 ---
    b = 1 << POSEIDON_LOG_B
    leaf_sets = [
        (jnp.asarray(rng.integers(0, 1 << 15, size=(F.N_LIMBS, 7, b),
                                  dtype=np.uint32)),)
        for _ in range(iters)]
    # checksum-reduce inside jit: keeps the fetch tiny without DCE'ing lanes
    t = timeit(jax.jit(lambda a: jnp.sum(P2.hash_n(a), axis=1)), leaf_sets)
    log(f"poseidon2 t=8 batch 2^{POSEIDON_LOG_B}: {t*1e3:.1f} ms -> "
        f"{b/t:,.0f} hashes/s")

    # --- NTT ---
    nn = 1 << NTT_LOG_N
    coeff_sets = [
        (jnp.asarray(rng.integers(0, 1 << 15, size=(F.N_LIMBS, nn),
                                  dtype=np.uint32)),)
        for _ in range(iters)]
    t = timeit(jax.jit(lambda a: jnp.sum(NTT.ntt(a), axis=1)), coeff_sets)
    log(f"ntt 2^{NTT_LOG_N}: {t*1e3:.2f} ms")

    print(json.dumps({
        "metric": f"msm_g1_points_per_s_2e{MSM_LOG_N}",
        "value": round(msm_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_pps / BASELINE_MSM_PTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
