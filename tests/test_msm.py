"""MSM tests: scan-Pippenger kernel vs naive golden MSM."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkos_tpu.ops import curve as C
from zkos_tpu.ops import curve_golden as CG
from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import msm as M


def _setup(rng, n, full_range=False):
    pts = CG.random_points(rng, n)
    if full_range:
        scalars = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63))
                   * int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % G.FR_MODULUS
                   for _ in range(n)]
    else:
        scalars = [int(rng.integers(0, 2**62)) for _ in range(n)]
    parr = jnp.asarray(C.point_from_affine_ints(pts))
    sarr = jnp.asarray(F.to_limbs(scalars), dtype=jnp.uint32)
    return pts, scalars, parr, sarr


def test_digits_roundtrip(rng):
    scalars = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % G.FR_MODULUS
               for _ in range(4)]
    sarr = jnp.asarray(F.to_limbs(scalars), dtype=jnp.uint32)
    for c in (4, 8, 13, 15):
        digits = np.asarray(M.limbs_to_digits(sarr, c))
        for j, s in enumerate(scalars):
            rebuilt = sum(int(digits[w, j]) << (c * w) for w in range(digits.shape[0]))
            assert rebuilt == s, (c, j)


def test_msm_small(rng):
    pts, scalars, parr, sarr = _setup(rng, 32, full_range=True)
    out = M.msm_mont(parr, sarr, c=4, groups=8)
    assert C.point_to_affine_ints(out) == CG.msm(scalars, pts)


def test_msm_with_zero_and_dup_scalars(rng):
    pts = CG.random_points(rng, 8)
    scalars = [0, 1, 1, G.FR_MODULUS - 1, 2**62, 7, 7, 0]
    parr = jnp.asarray(C.point_from_affine_ints(pts))
    sarr = jnp.asarray(F.to_limbs(scalars), dtype=jnp.uint32)
    out = M.msm_mont(parr, sarr, c=8, groups=4)
    assert C.point_to_affine_ints(out) == CG.msm(scalars, pts)


def test_msm_padding(rng):
    """N not divisible by groups exercises the identity padding."""
    pts, scalars, parr, sarr = _setup(rng, 13)
    out = M.msm_mont(parr, sarr, c=8, groups=4)
    assert C.point_to_affine_ints(out) == CG.msm(scalars, pts)


def test_msm_identity_points(rng):
    pts = [None] * 4
    scalars = [5, 6, 7, 8]
    parr = jnp.asarray(C.point_from_affine_ints(pts))
    sarr = jnp.asarray(F.to_limbs(scalars), dtype=jnp.uint32)
    out = M.msm_mont(parr, sarr, c=4, groups=2)
    assert C.point_to_affine_ints(out) is None


# -- sorted prefix-scan MSM (v2) --

def test_msm_sorted_vs_golden(rng):
    pts, scalars, _, sarr = _setup(rng, 13, full_range=True)
    scalars[3] = 0
    scalars[7] = 1
    sarr = jnp.asarray(F.to_limbs(scalars), dtype=jnp.uint32)
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    want = CG.msm(scalars, pts)
    assert M.msm_affine_ints(parr, sarr, c=8, steps=2) == want


def test_msm_sorted_repeated_points(rng):
    """Duplicate points force doubling cases inside the prefix scan."""
    base = CG.random_points(rng, 4)
    pts = base * 4
    scalars = [int(rng.integers(0, 2**62)) for _ in range(16)]
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.asarray(F.to_limbs(scalars), dtype=jnp.uint32)
    assert M.msm_affine_ints(parr, sarr, c=4, steps=4) == CG.msm(scalars, pts)


def test_msm_sorted_zero_sum(rng):
    pts = CG.random_points(rng, 3)
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.asarray(F.to_limbs([0, 0, 0]), dtype=jnp.uint32)
    assert M.msm_affine_ints(parr, sarr, c=8, steps=2) is None


def test_msm_batched_commit(rng):
    """vmapped window sums: several scalar vectors over shared points."""
    import jax

    pts = CG.random_points(rng, 8)
    cols = [[int(rng.integers(0, 2**62)) for _ in range(8)] for _ in range(3)]
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.stack([jnp.asarray(F.to_limbs(col), dtype=jnp.uint32)
                      for col in cols])  # (3, 18, 8)
    ws = jax.vmap(lambda s: M.msm_window_sums(parr, s, c=8, steps=2))(sarr)
    for b, col in enumerate(cols):
        assert M.fold_windows_host(ws[b], 8) == CG.msm(col, pts)


@pytest.mark.parametrize("c", [14, 16])
def test_msm_sorted_wide_windows(rng, c):
    """Wide windows that span two 15-bit limbs: c=14 is the bench
    experiment config (bench.py MSM_C_EXPERIMENT — the benched config must
    have golden-model coverage, round-4 ADVICE); c=16's sh=14 worst case
    uses bits 14..29.  Full-scalar MSM must match the golden oracle."""
    pts = CG.random_points(np.random.default_rng(9), 32)
    scalars = [int(x) for x in
               np.random.default_rng(10).integers(0, 2**63, size=32)]
    scalars[0] = G.FR_MODULUS - 1  # all-ones-ish top window + signed carry
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.asarray(F.to_limbs(scalars))
    assert M.msm_affine_ints(parr, sarr, c=c, steps=4) == CG.msm(scalars, pts)


def test_msm_window_sums_batch(rng):
    """The one-pass batched form (B*W windows) equals per-vector MSMs —
    the engine's commit path; NEVER vmap the single form on TPU (Pallas
    scratch corruption, msm.msm_window_sums_batch docstring)."""
    pts = CG.random_points(rng, 16)
    cols = [[int(rng.integers(0, 2**62)) for _ in range(16)]
            for _ in range(4)]
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.stack([jnp.asarray(F.to_limbs(col), dtype=jnp.uint32)
                      for col in cols])  # (4, 18, 16)
    ws = M.msm_window_sums_batch(parr, sarr, c=8, steps=2)
    for b, col in enumerate(cols):
        assert M.fold_windows_host(np.asarray(ws[b]), 8) == CG.msm(col, pts)


def test_msm_window_sums_batch_with_padding(rng):
    """N not a multiple of lanes*steps exercises the batch padding.

    Runs EAGERLY: XLA:CPU segfaults compiling this exact batched+padded
    graph when it is compiled late in a long suite process (3/3 full-suite
    runs crashed in backend_compile here; the same test passes solo and
    the unpadded batch graph compiles fine).  The numerics are what this
    test pins; the engine itself only commits power-of-two domains, so
    the padded batch shape never reaches a production compile.
    """
    import jax

    pts = CG.random_points(rng, 13)
    cols = [[int(rng.integers(0, 2**62)) for _ in range(13)]
            for _ in range(2)]
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.stack([jnp.asarray(F.to_limbs(col), dtype=jnp.uint32)
                      for col in cols])
    with jax.disable_jit():
        ws = M.msm_window_sums_batch(parr, sarr, c=8, steps=4)
    for b, col in enumerate(cols):
        assert M.fold_windows_host(np.asarray(ws[b]), 8) == CG.msm(col, pts)
