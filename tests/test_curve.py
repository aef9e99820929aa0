"""G1 kernel tests: complete projective addition vs the branchy affine oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkos_tpu.ops import curve as C
from zkos_tpu.ops import curve_golden as CG
from zkos_tpu.ops import field_golden as G


def test_add_random_points(rng):
    pts1 = CG.random_points(rng, 6)
    pts2 = CG.random_points(rng, 6)
    a = jnp.asarray(C.point_from_affine_ints(pts1))
    b = jnp.asarray(C.point_from_affine_ints(pts2))
    out = jax.jit(C.ec_add)(a, b)
    got = C.point_to_affine_ints(out)
    want = [CG.add(p, q) for p, q in zip(pts1, pts2)]
    assert got == want


def test_add_special_cases(rng):
    p = CG.random_points(rng, 1)[0]
    cases = [
        (p, p),                    # doubling through the unified formula
        (p, None),                 # P + O
        (None, p),                 # O + P
        (None, None),              # O + O
        (p, CG.neg(p)),            # P + (-P) = O
    ]
    a = jnp.asarray(C.point_from_affine_ints([c[0] for c in cases]))
    b = jnp.asarray(C.point_from_affine_ints([c[1] for c in cases]))
    got = C.point_to_affine_ints(C.ec_add(a, b))
    want = [CG.add(x, y) for x, y in cases]
    assert got == want


def test_double_chain(rng):
    """Repeated doubling stays on-curve and matches golden."""
    p = CG.random_points(rng, 1)[0]
    arr = jnp.asarray(C.point_from_affine_ints([p]))
    want = p
    for _ in range(5):
        arr = C.ec_double(arr)
        want = CG.add(want, want)
    assert C.point_to_affine_ints(arr) == [want]
    assert CG.is_on_curve(want)


def test_scalar_mul(rng):
    p = CG.random_points(rng, 1)[0]
    k = int(rng.integers(1, 2**62)) * int(rng.integers(1, 2**62))
    arr = jnp.asarray(C.point_from_affine_ints([p]))
    bits = np.array([(k >> i) & 1 for i in range(64 * 2)], dtype=np.uint32)
    out = jax.jit(C.ec_scalar_mul_bits)(arr, jnp.asarray(bits))
    assert C.point_to_affine_ints(out) == [CG.scalar_mul(k, p)]


def test_scalar_mul_order():
    """r * G = O (the group order annihilates the generator)."""
    arr = jnp.asarray(C.point_from_affine_ints([CG.GEN]))
    r = G.FR_MODULUS
    bits = np.array([(r >> i) & 1 for i in range(255)], dtype=np.uint32)
    out = C.ec_scalar_mul_bits(arr, jnp.asarray(bits))
    assert C.point_to_affine_ints(out) == [None]


def test_neg_and_eq(rng):
    p = CG.random_points(rng, 2)
    arr = jnp.asarray(C.point_from_affine_ints(p))
    negd = C.ec_neg(arr)
    assert C.point_to_affine_ints(negd) == [CG.neg(x) for x in p]
    s = C.ec_add(arr, negd)
    assert list(np.asarray(C.ec_is_identity(s))) == [True, True]
    # eq: same point under different projective scaling
    doubled = C.ec_add(arr, jnp.asarray(C.point_from_affine_ints([None, None])))
    assert list(np.asarray(C.ec_eq(arr, doubled))) == [True, True]
    assert list(np.asarray(C.ec_eq(arr, negd))) == [False, False]
