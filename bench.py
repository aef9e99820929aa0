"""Round benchmark — runs on the real TPU chip; prints ONE JSON line to stdout.

Headline metric: Pippenger MSM throughput on BN254 G1 (the dominant cost of
halo2 proving — per-column commitments + BDFG21 opens, SURVEY.md §2.2).
Secondary diagnostics (Poseidon2 hashes/s, NTT wall-clock) go to stderr.

Measurement notes (tunneled single-chip setup):
- inputs are synthesized ON DEVICE from a scalar seed: host->device uploads
  crawl through the tunnel and would dominate, and the backend memoizes
  repeated executions of identical inputs;
- timing forces a device->host fetch of a small checksum, because
  block_until_ready can return before remote execution completes.

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
from zkos_tpu.ops import msm as M  # noqa: E402
from zkos_tpu.ops import ntt as NTT  # noqa: E402
from zkos_tpu.ops import poseidon2 as P2  # noqa: E402

MSM_LOG_N = 20
MSM_C = 8
POSEIDON_LOG_B = 16
NTT_LOG_N = 13

BASELINE_MSM_PTS_PER_S = 1.0e6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=3):
    """Median over runs with a fresh seed scalar each time; fetch-forced."""
    np.asarray(jax.tree.leaves(fn(jnp.uint32(1), *args))[0])  # compile+drain
    times = []
    for k in range(2, 2 + iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(jnp.uint32(k), *args))[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def device_points(n: int) -> jax.Array:
    """n valid G1 points built on device: doubling chain of G, tiled.

    One jitted graph (eager per-op dispatch through the device tunnel is
    ~1000x slower than a single compiled call).
    """
    g_host = jnp.asarray(C.point_from_affine_ints([(1, 2)]))  # (3, 18, 1)

    @jax.jit
    def build(g):
        def step(p, _):
            return C.ec_double(p), p

        _, chain = jax.lax.scan(step, g, None, length=64)  # (64, 3, 18, 1)
        base = jnp.moveaxis(chain[..., 0], 0, -1)  # (3, 18, 64): 2^i * G
        reps = -(-n // 64)
        return jnp.tile(base, (1, 1, reps))[:, :, :n]

    return build(g_host)


def _seeded_limbs(seed, shape):
    """Pseudo-random 14-bit limb array from a device seed scalar (cheap)."""
    total = int(np.prod(shape))
    i = jnp.arange(total, dtype=jnp.uint32).reshape(shape)
    x = (i * np.uint32(2654435761) + seed * np.uint32(40503)) ^ (i >> 7)
    return (x * (seed + np.uint32(12345))) & np.uint32(0x3FFF)


def main() -> None:
    dev = jax.devices()[0]
    log(f"bench device: {dev.platform} / {dev.device_kind}")

    # --- MSM (headline) ---
    n = 1 << MSM_LOG_N
    pts = device_points(n)
    jax.block_until_ready(pts)

    @jax.jit
    def msm_run(seed, p):
        sc = _seeded_limbs(seed, (F.N_LIMBS, n))
        return M.msm_mont(p, sc, c=MSM_C)

    t = timeit(msm_run, pts)
    msm_pps = n / t
    log(f"msm 2^{MSM_LOG_N} (c={MSM_C}): {t*1e3:.1f} ms -> "
        f"{msm_pps:,.0f} points/s")

    # --- Poseidon2 ---
    b = 1 << POSEIDON_LOG_B

    @jax.jit
    def poseidon_run(seed):
        leaves = _seeded_limbs(seed, (F.N_LIMBS, 7, b))
        return jnp.sum(P2.hash_n_best(leaves), axis=1)

    t = timeit(poseidon_run)
    log(f"poseidon2 t=8 (pallas) batch 2^{POSEIDON_LOG_B}: {t*1e3:.1f} ms -> "
        f"{b/t:,.0f} hashes/s")

    # --- NTT ---
    nn = 1 << NTT_LOG_N

    @jax.jit
    def ntt_run(seed):
        coeffs = _seeded_limbs(seed, (F.N_LIMBS, nn))
        return jnp.sum(NTT.ntt(coeffs), axis=1)

    t = timeit(ntt_run)
    log(f"ntt 2^{NTT_LOG_N}: {t*1e3:.2f} ms")

    print(json.dumps({
        "metric": f"msm_g1_points_per_s_2e{MSM_LOG_N}",
        "value": round(msm_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_pps / BASELINE_MSM_PTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
