"""NTT tests: roundtrip, naive-DFT oracle, halo2 domain conventions."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import ntt as NTT


def limbs(vals):
    return jnp.asarray(F.to_limbs(vals), dtype=jnp.uint32)


def test_ntt_matches_naive_dft(rng):
    n = 16
    coeffs = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % G.FR_MODULUS
              for _ in range(n)]
    got = F.from_limbs(np.asarray(NTT.ntt(limbs(coeffs))))
    want = NTT.ntt_ints(coeffs)
    assert got == want


def test_intt_roundtrip(rng):
    n = 64
    coeffs = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % G.FR_MODULUS
              for _ in range(n)]
    evals = NTT.ntt(limbs(coeffs))
    back = F.from_limbs(np.asarray(NTT.ntt(evals, inverse=True)))
    assert back == coeffs


def test_ntt_batched(rng):
    """Batch dimension: (18, n, B) transforms each column independently."""
    n, b = 8, 3
    cols = [[int(rng.integers(1, 2**60)) for _ in range(n)] for _ in range(b)]
    arr = np.stack([[G.to_limbs(cols[j][i]) for j in range(b)]
                    for i in range(n)]).astype(np.uint32).transpose(2, 0, 1)
    out = np.asarray(NTT.ntt(jnp.asarray(arr)))
    for j in range(b):
        got = [G.from_limbs(out[:, i, j]) for i in range(n)]
        assert got == NTT.ntt_ints(cols[j])


def test_evaluation_semantics():
    """ntt(coeffs)[i] == poly(omega^i) — halo2's coeff->lagrange convention."""
    n = 8
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    w = NTT.root_of_unity(n)
    evals = F.from_limbs(np.asarray(NTT.ntt(limbs(coeffs))))
    p = G.FR_MODULUS
    for i in range(n):
        x = pow(w, i, p)
        want = sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
        assert evals[i] == want


def test_root_of_unity_orders():
    for k in (1, 4, 11, 13):
        n = 1 << k
        w = NTT.root_of_unity(n)
        assert pow(w, n, G.FR_MODULUS) == 1
        assert pow(w, n // 2, G.FR_MODULUS) == G.FR_MODULUS - 1
        assert G.FR.mul(NTT.root_of_unity(n), NTT.root_of_unity(n, inverse=True)) == 1


def test_k11_domain(rng):
    """The ppot_0080_11 domain size (2^11) — full roundtrip."""
    n = 1 << 11
    coeffs = [int(x) for x in rng.integers(0, 2**62, size=n)]
    evals = NTT.ntt(limbs(coeffs))
    back = F.from_limbs(np.asarray(NTT.ntt(evals, inverse=True)))
    assert back == coeffs
