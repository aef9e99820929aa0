"""Phase-level MSM profiler (run on the TPU, solo).

Times each stage of ops.msm.msm_window_sums as its own jit at the bench
shape (2^20, c=13): sort+gather, prefix scan, boundary gather + bucket
diff, weighted window sums.  Per-kernel roofline context printed per
phase (bytes touched, EC adds).
"""

import sys
import time

import jax

from zkos_tpu.utils import machine as _machine
jax.config.update("jax_compilation_cache_dir",
                  _machine.cache_dir("/root/repo/.jax_cache", kind="device"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zkos_tpu.ops import curve as C  # noqa: E402
from zkos_tpu.ops import field as F  # noqa: E402
from zkos_tpu.ops import msm as M  # noqa: E402

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
CVAL = int(sys.argv[2]) if len(sys.argv) > 2 else 13
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
N = 1 << LOG_N


def _drain(out):
    """Force completion with a TINY device->host fetch: materializing any
    slice of an output buffer requires the whole computation to finish, but
    transfers only bytes — fetching full phase outputs (GBs) through the
    tunnel would time transport, not the kernel."""
    for leaf in jax.tree.leaves(out):
        flat = leaf.reshape(-1)
        np.asarray(jax.lax.dynamic_slice(flat, (flat.shape[0] - 1,), (1,)))


def t(fn, *args, iters=3, tag=""):
    out = fn(*args)
    _drain(out)  # compile+drain
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"{tag:28s} {times[len(times)//2]*1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"device={jax.devices()[0].device_kind} n=2^{LOG_N} c={CVAL} "
          f"steps={STEPS}", flush=True)
    pts = M.__dict__.get("device_points_affine")
    from bench import device_points_affine, _seeded_limbs

    points = device_points_affine(N)
    np.asarray(points[0, 0, :2])

    @jax.jit
    def digits(seed):
        sc = _seeded_limbs(seed, (F.N_LIMBS, N))
        return M.limbs_to_digits_signed(sc, CVAL)

    sd = t(digits, jnp.uint32(1), tag="digit recode")

    sort_j = jax.jit(M._sorted_window_inputs)
    packed, ssign, sorted_mag = t(sort_j, points, sd, tag="sort+gather")

    # NOTE: profile phases at n <= 2^19 — holding every phase output alive
    # (sorted points + transposed copy + the (M,3,18,W,L) prefix) overflows
    # the 16 GB HBM at 2^20; in the fused kernel XLA frees intermediates.
    scan_j = jax.jit(lambda sp: M._chunked_prefix_scan(sp, STEPS))
    prefix, chunk_excl = t(scan_j, packed, tag="prefix scan")
    del packed

    b = 1 << (CVAL - 1)

    @jax.jit
    def boundary(prefix, chunk_excl, sd):
        bounds = M._bucket_boundaries(jnp.abs(sd).astype(jnp.uint32), b)
        return M._boundary_prefix(prefix, chunk_excl, bounds)

    s_at = t(boundary, prefix, chunk_excl, sd, tag="hist+boundary gather")

    @jax.jit
    def abel(s_at):
        top = s_at[..., -1]
        for _ in range(b.bit_length() - 1):
            top = C.ec_add(top, top)
        rest = s_at[..., :-1]
        k = b
        while k > 1:
            rest = C.ec_add(rest[..., : k // 2], rest[..., k // 2 : k])
            k //= 2
        return C.ec_add(top, C.ec_neg(rest[..., 0]))

    t(abel, s_at, tag="abel fold")

    @jax.jit
    def full(seed, p):
        sc = _seeded_limbs(seed, (F.N_LIMBS, N))
        return M.msm_window_sums(p, sc, c=CVAL, steps=STEPS)

    t(full, jnp.uint32(2), points, tag="FULL msm_window_sums")


if __name__ == "__main__":
    main()
