"""Field kernel tests: JAX limb arithmetic vs the python-int golden model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G


SPECS = [F.FR, F.FQ]
GOLDEN = {"Fr": G.FR, "Fq": G.FQ}


def rand_elems(rng, p, n):
    return [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63))
            * int(rng.integers(0, 2**63)) * 7919 % p for _ in range(n)]


def limbs(vals):
    return jnp.asarray(F.to_limbs(vals), dtype=jnp.uint32)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_limb_roundtrip(spec, rng):
    vals = rand_elems(rng, spec.p, 8) + [0, 1, spec.p - 1]
    arr = F.to_limbs(vals)
    assert F.from_limbs(arr) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec, rng):
    g = GOLDEN[spec.name]
    a_vals = rand_elems(rng, spec.p, 16) + [0, spec.p - 1]
    b_vals = rand_elems(rng, spec.p, 16) + [spec.p - 1, spec.p - 1]
    a, b = limbs(a_vals), limbs(b_vals)
    got_add = F.from_limbs(np.asarray(jax.jit(lambda x, y: F.canon(spec, F.add(spec, x, y)))(a, b)))
    got_sub = F.from_limbs(np.asarray(jax.jit(lambda x, y: F.canon(spec, F.sub(spec, x, y)))(a, b)))
    got_neg = F.from_limbs(np.asarray(jax.jit(lambda x: F.canon(spec, F.neg(spec, x)))(a)))
    assert got_add == [g.add(x, y) for x, y in zip(a_vals, b_vals)]
    assert got_sub == [g.sub(x, y) for x, y in zip(a_vals, b_vals)]
    assert got_neg == [g.neg(x) for x in a_vals]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul(spec, rng):
    g = GOLDEN[spec.name]
    a_vals = rand_elems(rng, spec.p, 32) + [0, 1, spec.p - 1, g.r]
    b_vals = rand_elems(rng, spec.p, 32) + [spec.p - 1, g.r2, 1, g.r]
    a, b = limbs(a_vals), limbs(b_vals)
    got = F.from_limbs(np.asarray(jax.jit(
        lambda x, y: F.normalize(spec, F.mont_mul(spec, x, y)))(a, b)))
    want = [g.mont_mul(x, y) for x, y in zip(a_vals, b_vals)]
    assert got == want


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_lazy_domain_chaining(spec, rng):
    """Chains of lazy adds/subs feed mont_mul correctly (no normalization)."""
    g = GOLDEN[spec.name]
    a_vals = rand_elems(rng, spec.p, 8)
    b_vals = rand_elems(rng, spec.p, 8)
    a, b = limbs(a_vals), limbs(b_vals)

    def fn(x, y):
        s = F.add(spec, x, y)          # < 2p
        s = F.add(spec, s, s)          # < 4p
        d = F.sub(spec, s, y, k=4)     # < 8p
        return F.normalize(spec, F.mont_mul(spec, d, F.to_mont(spec, y)))

    got = F.from_limbs(np.asarray(jax.jit(fn)(a, b)))
    want = [g.mul(2 * (x + y) - y, y) for x, y in zip(a_vals, b_vals)]
    assert got == want


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_roundtrip_and_mul(spec, rng):
    g = GOLDEN[spec.name]
    a_vals = rand_elems(rng, spec.p, 8)
    b_vals = rand_elems(rng, spec.p, 8)
    a, b = limbs(a_vals), limbs(b_vals)
    am = F.to_mont(spec, a)
    bm = F.to_mont(spec, b)
    prod = F.from_mont(spec, F.mont_mul(spec, am, bm))
    assert F.from_limbs(np.asarray(prod)) == [g.mul(x, y) for x, y in zip(a_vals, b_vals)]
    back = F.from_mont(spec, am)
    assert F.from_limbs(np.asarray(back)) == a_vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inv(spec, rng):
    g = GOLDEN[spec.name]
    a_vals = rand_elems(rng, spec.p, 4) + [1, spec.p - 1]
    a = limbs(a_vals)
    am = F.to_mont(spec, a)
    inv = F.from_mont(spec, jax.jit(lambda x: F.mont_inv(spec, x))(am))
    got = F.from_limbs(np.asarray(inv))
    assert got == [g.inv(x) for x in a_vals]
    # zero maps to zero
    z = F.from_mont(spec, F.mont_inv(spec, F.zero(spec, (1,))))
    assert F.from_limbs(np.asarray(z)) == [0]


def test_modulus_constants_match_reference():
    """Pin the Fr modulus limbs given at shielder-account/src/secrets.rs:20-25."""
    limbs64 = [0x43E1F593F0000001, 0x2833E84879B97091, 0xB85045B68181585D, 0x30644E72E131A029]
    assert sum(l << (64 * i) for i, l in enumerate(limbs64)) == G.FR_MODULUS


def test_root_of_unity():
    w = G.fr_root_of_unity()
    assert pow(w, 1 << 28, G.FR_MODULUS) == 1
    assert pow(w, 1 << 27, G.FR_MODULUS) == G.FR_MODULUS - 1
