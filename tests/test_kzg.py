"""SRS reading + KZG commit/open/verify: device engine vs golden vs pairing."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkos_tpu.ops import curve as C
from zkos_tpu.ops import curve_golden as cg
from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import ntt as NTT
from zkos_tpu.proof import kzg, srs as srs_mod

P = G.FR_MODULUS


@pytest.fixture(scope="module")
def small_srs():
    return srs_mod.synthetic_srs(k=4)


@pytest.fixture(scope="module")
def dsrs(small_srs):
    return kzg.DeviceSrs.build(small_srs)


def test_synthetic_srs_structure(small_srs):
    # g1[i] = tau^i * G: check the pairing-free relation via known tau
    tau = 0x1F2E3D4C5B6A79880102030405060708090A0B0C0D0E0F10 % P
    assert small_srs.g1[0] == cg.GEN
    assert small_srs.g1[3] == cg.scalar_mul(pow(tau, 3, P), cg.GEN)
    # s_g2 consistency through a pairing: e(tau*G, g2) == e(G, s_g2)
    from zkos_tpu.ops import pairing_golden as PG

    lhs = PG.pairing(small_srs.g2, small_srs.g1[1])
    rhs = PG.pairing(small_srs.s_g2, small_srs.g1[0])
    assert lhs == rhs


def test_golden_kzg_roundtrip(small_srs):
    random.seed(7)
    coeffs = [random.randrange(P) for _ in range(1 << 4)]
    com = kzg.commit_ints(small_srs, coeffs)
    z = random.randrange(P)
    w, y = kzg.open_ints(small_srs, coeffs, z)
    assert y == kzg.poly_eval(coeffs, z)
    assert kzg.verify(small_srs, com, z, y, w)
    # wrong evaluation must fail
    assert not kzg.verify(small_srs, com, z, (y + 1) % P, w)


def test_device_commit_matches_golden(small_srs, dsrs):
    random.seed(8)
    coeffs = [random.randrange(P) for _ in range(1 << 4)]
    com_dev = kzg.commit(dsrs, jnp.asarray(F.to_limbs(coeffs)), c=6)
    assert C.point_to_affine_ints(com_dev) == kzg.commit_ints(small_srs, coeffs)


def test_device_commit_lagrange_is_commit_of_intt(small_srs, dsrs):
    """halo2 oracle: commit_lagrange(evals) == commit(coeffs) when
    evals = NTT(coeffs) (powers-of-tau lib.rs:248-263)."""
    random.seed(9)
    coeffs = [random.randrange(P) for _ in range(1 << 4)]
    evals = NTT.ntt_ints(coeffs)
    com_l = kzg.commit_lagrange(dsrs, jnp.asarray(F.to_limbs(evals)), c=6)
    assert C.point_to_affine_ints(com_l) == kzg.commit_ints(small_srs, coeffs)


def test_device_open_verifies(small_srs, dsrs):
    random.seed(10)
    coeffs = [random.randrange(P) for _ in range(1 << 4)]
    limbs = jnp.asarray(F.to_limbs(coeffs))
    com = C.point_to_affine_ints(kzg.commit(dsrs, limbs, c=6))
    z = random.randrange(P)
    w_dev, y = kzg.open_device(dsrs, limbs, z, c=6)
    w = C.point_to_affine_ints(w_dev)
    assert y == kzg.poly_eval(coeffs, z)
    assert kzg.verify(small_srs, com, z, y, w)


def test_raw_equals_perpetual():
    """The reference's own cross-format oracle (powers-of-tau lib.rs:267-281)."""
    import os

    if not os.path.exists(srs_mod.default_raw_path(11)):
        pytest.skip("reference raw srs not present")
    a = srs_mod.read(11, max_points=32)
    b = srs_mod.read(11, fmt="raw", max_points=32)
    assert (a.k, a.g1, a.g2, a.s_g2) == (b.k, b.g1, b.g2, b.s_g2)


def test_read_reference_ptau():
    """Parse the in-repo reference SRS (k=11) and sanity-check structure."""
    import os

    path = srs_mod.default_ptau_path(11)
    if not os.path.exists(path):
        pytest.skip("reference ptau not present")
    srs = srs_mod.read(11, max_points=64)
    assert srs.k == 11
    assert srs.g1[0] == cg.GEN  # first power is the generator
    assert all(cg.is_on_curve(p) for p in srs.g1)
    # g2/s_g2 relation: e(tau*G, g2) == e(G, s_g2)
    from zkos_tpu.ops import pairing_golden as PG

    assert PG.pairing(srs.g2, srs.g1[1]) == PG.pairing(srs.s_g2, srs.g1[0])
