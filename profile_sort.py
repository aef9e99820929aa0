"""Split the MSM sort+gather phase: argsort vs row gather vs unpack.

Run on the TPU, solo:  python profile_sort.py [log_n] [c]
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

from zkos_tpu.ops import field as F  # noqa: E402
from zkos_tpu.ops import msm as M  # noqa: E402

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 19
CVAL = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N = 1 << LOG_N


def _drain(out):
    for leaf in jax.tree.leaves(out):
        flat = leaf.reshape(-1)
        np.asarray(jax.lax.dynamic_slice(flat, (flat.shape[0] - 1,), (1,)))


def t(fn, *args, iters=3, tag=""):
    out = fn(*args)
    _drain(out)
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
    from bench import device_points_affine, _seeded_limbs

    print(f"device={jax.devices()[0].device_kind} n=2^{LOG_N} c={CVAL}",
          flush=True)
    points = device_points_affine(N)
    np.asarray(points[0, 0, :2])

    @jax.jit
    def digits(seed):
        sc = _seeded_limbs(seed, (F.N_LIMBS, N))
        return M.limbs_to_digits_signed(sc, CVAL)

    sd = t(digits, jnp.uint32(1), tag="digit recode")

    @jax.jit
    def sort_only(sdig):
        mag = jnp.abs(sdig).astype(jnp.uint32)
        return jnp.argsort(mag, axis=-1)

    order = t(sort_only, sd, tag="argsort")

    @jax.jit
    def pack_only(pts):
        flat = pts.reshape(2 * F.N_LIMBS, N)
        return (flat[0::2] | (flat[1::2] << 15)).T  # (N, 18)

    packed = t(pack_only, points, tag="pack")

    @jax.jit
    def gather_only(pk, od):
        return jnp.moveaxis(jnp.take(pk, od, axis=0), -1, 0)  # (18, W, N)

    g = t(gather_only, packed, order, tag="row gather")

    @jax.jit
    def unpack_only(gg, sdig, od):
        w_count = sdig.shape[0]
        sorted_sign = jnp.take_along_axis(sdig, od, axis=-1) < 0
        lo = gg & jnp.uint32(0x7FFF)
        hi = gg >> 15
        pts = jnp.stack([lo, hi], axis=1).reshape(
            2 * F.N_LIMBS, w_count, N).reshape(2, F.N_LIMBS, w_count, N)
        y = pts[1]
        y_neg = F.neg(F.FQ, y, k=2)
        return pts.at[1].set(jnp.where(sorted_sign[None], y_neg, y))

    t(unpack_only, g, sd, order, tag="unpack+negate")

    @jax.jit
    def hist_only(sdig):
        return M._bucket_boundaries(jnp.abs(sdig).astype(jnp.uint32),
                                    1 << (CVAL - 1))

    t(hist_only, sd, tag="mxu histogram bounds")


if __name__ == "__main__":
    main()
