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
