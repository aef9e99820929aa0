"""Scaling-efficiency report over a virtual device mesh (BASELINE config 5).

Runs the sharded kernels — four-step NTT (all_to_all transpose), sharded
MSM (psum-style partial fold), data-parallel Poseidon2 — at mesh sizes
1/2/4/8 on the forced-host-platform CPU backend and reports per-device
throughput + scaling efficiency into SCALING.json.

The virtual mesh measures *partitioning overhead* (collective insertion,
sharding correctness) rather than real ICI bandwidth — single-chip CI has
no pod slice — so the efficiency numbers are upper bounds on collective
overhead, not ICI saturation (real multi-chip numbers need a pod).
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zkos_tpu.ops import field as F  # noqa: E402
from zkos_tpu.parallel import mesh as mesh_mod  # noqa: E402
from zkos_tpu.parallel import sharded  # noqa: E402

NTT_LOG_N = int(os.environ.get("ZKOS_SCALING_NTT_LOG_N", "20"))
POSEIDON_LOG_B = 14


def timeit(fn, *args, iters=2):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].addressable_data(0))[:1]
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report():
    results = {"ntt_4step": {}, "poseidon2": {}}
    n = 1 << NTT_LOG_N
    n1 = 1 << (NTT_LOG_N // 2)
    n2 = n // n1
    rng = np.random.default_rng(0)
    coeffs = rng.integers(0, 1 << 14, size=(F.N_LIMBS, n), dtype=np.uint32)
    amat_host = np.asarray(sharded.coeffs_to_matrix(jnp.asarray(coeffs), n1, n2))

    b = 1 << POSEIDON_LOG_B
    leaves = rng.integers(0, 1 << 14, size=(F.N_LIMBS, 7, b), dtype=np.uint32)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from zkos_tpu.parallel.mesh import DATA_AXIS

    for nd in (1, 2, 4, 8):
        mesh = mesh_mod.data_mesh(nd)
        # pre-shard inputs OUTSIDE the timed region: host->device transfer
        # and resharding are one-time setup, not kernel scaling — timing
        # them was the round-2 2-device poseidon efficiency loss
        amat = jax.device_put(
            jnp.asarray(amat_host), NamedSharding(mesh, P(None, DATA_AXIS, None)))
        t = timeit(lambda: sharded.sharded_ntt_4step(mesh, amat))
        results["ntt_4step"][nd] = {
            "wall_ms": round(t * 1e3, 1),
            "coeffs_per_s_per_device": round(n / t / nd, 1)}
        print(f"ntt 2^{NTT_LOG_N} 4-step @ {nd} dev: {t*1e3:.0f} ms", flush=True)

        sharded_leaves = jax.device_put(
            jnp.asarray(leaves), NamedSharding(mesh, P(None, None, DATA_AXIS)))
        t = timeit(lambda: sharded.sharded_hash_n(mesh, sharded_leaves))
        results["poseidon2"][nd] = {
            "wall_ms": round(t * 1e3, 1),
            "hashes_per_s_per_device": round(b / t / nd, 1)}
        print(f"poseidon2 2^{POSEIDON_LOG_B} @ {nd} dev: {t*1e3:.0f} ms",
              flush=True)

    for kind in results:
        base = list(results[kind].values())[0]
        key = [k for k in base if k.endswith("per_device")][0]
        for nd, row in results[kind].items():
            row["efficiency_vs_1dev"] = round(row[key] / base[key], 3)
    return results


if __name__ == "__main__":
    res = report()
    out = {"backend": "cpu-virtual-mesh", "devices": 8, "results": res,
           "caveat": ("virtual mesh on a 2-vCPU host: only the 2-device "
                      "point measures partitioning overhead; larger meshes "
                      "timeshare cores (not ICI)")}
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {nd: v["efficiency_vs_1dev"]
                          for nd, v in res[k].items()} for k in res}))
