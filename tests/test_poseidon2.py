"""Poseidon2 tests: JAX limb kernel vs the python-int golden model."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import poseidon2 as P2


def test_permute_matches_golden(rng):
    batch = 3
    states = [[int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % G.FR_MODULUS
               for _ in range(8)] for _ in range(batch)]
    # JAX: state (18, 8, B) limb-major in Montgomery form
    arr = np.stack([[G.to_limbs(G.FR.to_mont(states[b][lane])) for b in range(batch)]
                    for lane in range(8)]).astype(np.uint32).transpose(2, 0, 1)
    out = P2.permute(jnp.asarray(arr))
    out_can = np.asarray(F.from_mont(F.FR, out))
    got = [[G.from_limbs(out_can[:, lane, b]) for lane in range(8)] for b in range(batch)]
    want = [P2.permute_ints(s) for s in states]
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3, 7])
def test_hash_n_matches_golden(n, rng):
    batch = 4
    inputs = [[int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % G.FR_MODULUS
               for _ in range(n)] for _ in range(batch)]
    arr = np.stack([[G.to_limbs(inputs[b][i]) for b in range(batch)]
                    for i in range(n)]).astype(np.uint32).transpose(2, 0, 1)
    out = np.asarray(P2.hash_n(jnp.asarray(arr)))  # (18, B)
    got = [G.from_limbs(out[:, b]) for b in range(batch)]
    want = [P2.hash_ints(row) for row in inputs]
    assert got == want


def test_hash_capacity_tag_distinguishes_arity():
    """hash::<1>([x]) must differ from hash::<2>([x, 0]) (capacity tag N*2^64)."""
    assert P2.hash_ints([5]) != P2.hash_ints([5, 0])


# Externally pinned hash::<N>([1..N]) values, derived by executing an
# INDEPENDENT reimplementation of the reference generator's semantics
# (poseidon2-solidity/generate_t8.py mm4/fr_mm/partial-round algebra, with
# the 448 round constants and diag D parsed from the reference file itself)
# — the analog of the reference's on/off-chain equivalence test
# (crates/integration-tests/src/poseidon2.rs:32-50).
PINNED_HASHES = {
    1: 0x10C443C519E99936A7474C5FC1782865DE0F51B224D08962F975692F53D38B88,
    2: 0x0F4A96AFEB9E85E83CDB3F5371D6A156A785A10F5DFE527241E64357D5961313,
    3: 0x1C740C41FC80FE33E9A636AB78C798F087D86E61EA649924308A4C3E327E684C,
    4: 0x023CDDB32C1C62A55A0E0BB0A9541AF488D82341A74AEBF642DFFE2B60592BC7,
    5: 0x17A44411CD28B3D1444A729FB526BF42EEF35E3CF1201B2DEB3038938C4B49D7,
    6: 0x1A2CC1B8291781A3D30C1F674F18A0AEEE26785050A8C51421806C4160A4BC07,
    7: 0x052DE13371E49EA6D8C9E16FF7199279C2317359D919B79F163BFF3D5B2DEB4B,
}


def test_hash_pinned_all_arities():
    """hash::<1..7>([1..N]) against the externally derived pins above."""
    for n, want in PINNED_HASHES.items():
        assert P2.hash_ints(list(range(1, n + 1))) == want, n


def _reference_constants():
    """Parse C, D from the reference generator file (data-only oracle)."""
    import os
    import re

    path = os.path.join(
        os.environ.get("ZKOS_REFERENCE_DIR", "/root/reference"),
        "poseidon2-solidity", "generate_t8.py")
    if not os.path.exists(path):
        return None
    src = open(path).read()

    def parse_list(name):
        m = re.search(rf"^{name} = \[(.*?)\]\n", src, re.S | re.M)
        return [int(x, 0)
                for x in re.findall(r"0x[0-9a-fA-F]+|\b\d{8,}\b", m.group(1))]

    return parse_list("C"), parse_list("D")


def test_independent_permutation_vs_reference_constants():
    """Re-derive hash::<1..7> from an independent implementation of the
    generator's mm4/fr_mm algebra using constants parsed straight from the
    reference file; a transcription error in poseidon2_constants.py or a
    systematic misreading of the round structure fails here."""
    consts = _reference_constants()
    if consts is None:
        import pytest

        pytest.skip("reference tree not available")
    C, D = consts
    assert len(C) == 448 and len(D) == 8
    P = G.FR_MODULUS

    def mm4(s, a, b, c, d):
        t0 = s[a] + s[b]
        t1 = s[c] + s[d]
        t2 = s[b] + s[b] + t1
        t3 = s[d] + s[d] + t0
        t4 = (2 * (t1 + t1) + t3) % P
        t5 = (2 * (t0 + t0) + t2) % P
        s[a] = (t3 + t5) % P
        s[b] = t5 % P
        s[c] = (t2 + t4) % P
        s[d] = t4 % P

    def fr_mm(s):
        mm4(s, 0, 1, 2, 3)
        mm4(s, 4, 5, 6, 7)
        tmp = [(s[i] + s[i + 4]) % P for i in range(4)]
        for i in range(4):
            s[i] = (s[i] + tmp[i]) % P
            s[i + 4] = (s[i + 4] + tmp[i]) % P

    def perm(inputs7, cap):
        s = list(inputs7) + [cap]
        fr_mm(s)
        for r in range(56):
            if r < 4 or r >= 52:
                s = [pow((x + C[8 * r + j]) % P, 7, P)
                     for j, x in enumerate(s)]
                fr_mm(s)
            else:
                s0 = pow((s[0] + C[8 * r]) % P, 7, P)
                w = [s0] + s[1:]
                tot = sum(w) % P
                s = [(D[j] * w[j] + tot) % P for j in range(8)]
        return s[0]

    for n in range(1, 8):
        vals = list(range(1, n + 1))
        ind = perm(vals + [0] * (7 - n), n * (1 << 64))
        assert ind == PINNED_HASHES[n], n
        assert P2.hash_ints(vals) == ind, n
