"""End-to-end PLONK prove -> verify on a small mul-chain circuit.

Circuit (k=5): gate q*(a*b - c) = 0; copy chain c[r] -> a[r+1]; final
product copied to the instance column.  Exercises custom gates, the
permutation argument (incl. instance column), quotient construction,
and the BDFG21 multiopen + pairing check.
"""

import random

import pytest

from zkos_tpu.proof import domain as dom
from zkos_tpu.proof import plonk, srs as srs_mod

P = dom.P
K = 5
N = 1 << K
CHAIN = 8


@pytest.fixture(scope="module")
def srs():
    return srs_mod.synthetic_srs(k=K)


def _build_cs() -> plonk.ConstraintSystem:
    q = plonk.Fixed(0)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    c = plonk.Advice(2)
    cs = plonk.ConstraintSystem(k=K, num_fixed=1, num_advice=3)
    cs.gates.append(("mul", [q * (a * b - c)]))
    col_a = plonk.Column("advice", 0)
    col_c = plonk.Column("advice", 2)
    col_i = plonk.Column("instance", 0)
    cs.permutation_columns = [col_a, col_c, col_i]
    for r in range(CHAIN - 1):
        cs.copies.append((col_c, r, col_a, r + 1))
    cs.copies.append((col_c, CHAIN - 1, col_i, 0))
    return cs


def _assign(x0: int, bs: list[int]):
    a = [0] * N
    b = [0] * N
    c = [0] * N
    q = [0] * N
    cur = x0
    for r in range(CHAIN):
        q[r] = 1
        a[r] = cur
        b[r] = bs[r]
        c[r] = cur * bs[r] % P
        cur = c[r]
    return q, [a, b, c], cur


@pytest.fixture(scope="module")
def keys(srs):
    cs = _build_cs()
    rng = random.Random(5)
    q, _, _ = _assign(3, [rng.randrange(1, P) for _ in range(CHAIN)])
    pk, vk = plonk.keygen(cs, srs, [q])
    return pk, vk


def test_delta_matches_reference_constant():
    # templates/Halo2Verifier.sol:475 pins delta; must equal GENERATOR^(2^S)
    assert dom.DELTA == (
        4131629893567559867359510883348571134090853742863529169391034518566172092834)


def test_prove_verify_roundtrip(keys):
    pk, vk = keys
    rng = random.Random(5)
    bs = [rng.randrange(1, P) for _ in range(CHAIN)]
    _, advice, result = _assign(3, bs)
    proof = plonk.prove(pk, advice, [result], rng=random.Random(7))
    assert plonk.verify(vk, proof, [result])


def test_wrong_instance_rejected(keys):
    pk, vk = keys
    rng = random.Random(6)
    bs = [rng.randrange(1, P) for _ in range(CHAIN)]
    _, advice, result = _assign(4, bs)
    proof = plonk.prove(pk, advice, [result], rng=random.Random(8))
    assert plonk.verify(vk, proof, [result])
    assert not plonk.verify(vk, proof, [(result + 1) % P])


def test_corrupted_proof_rejected(keys):
    pk, vk = keys
    rng = random.Random(9)
    bs = [rng.randrange(1, P) for _ in range(CHAIN)]
    _, advice, result = _assign(5, bs)
    proof = bytearray(plonk.prove(pk, advice, [result], rng=random.Random(10)))
    # flip a byte inside an evaluation word (past the commitments)
    proof[-100] ^= 1
    assert not plonk.verify(vk, bytes(proof), [result])


def test_unsatisfied_witness_rejected(keys):
    pk, vk = keys
    rng = random.Random(11)
    bs = [rng.randrange(1, P) for _ in range(CHAIN)]
    _, advice, result = _assign(6, bs)
    advice[2][3] = (advice[2][3] + 1) % P  # break c = a*b at row 3
    try:
        proof = plonk.prove(pk, advice, [result], rng=random.Random(12))
    except AssertionError:
        return  # prover's own degree/zero check caught it
    assert not plonk.verify(vk, proof, [result])
