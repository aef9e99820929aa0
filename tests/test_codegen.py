"""Generated standalone verifier: accepts real proofs, rejects tampering."""

import importlib.util
import random

import pytest

from zkos_tpu.proof import codegen, plonk, srs as srs_mod

P = plonk.P
K = 5
N = 1 << K
CHAIN = 6


@pytest.fixture(scope="module")
def setup():
    srs = srs_mod.synthetic_srs(k=K)
    q = plonk.Fixed(0)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    c = plonk.Advice(2)
    cs = plonk.ConstraintSystem(k=K, num_fixed=1, num_advice=3)
    cs.gates.append(("mul", [q * (a * b - c)]))
    ca, cc, ci = (plonk.Column("advice", 0), plonk.Column("advice", 2),
                  plonk.Column("instance", 0))
    cs.permutation_columns = [ca, cc, ci]
    for r in range(CHAIN - 1):
        cs.copies.append((cc, r, ca, r + 1))
    cs.copies.append((cc, CHAIN - 1, ci, 0))

    qv = [1 if r < CHAIN else 0 for r in range(N)]
    pk, vk = plonk.keygen(cs, srs, [qv])

    rng = random.Random(17)
    av, bv, cv = [0] * N, [0] * N, [0] * N
    cur = 11
    for r in range(CHAIN):
        av[r] = cur
        bv[r] = rng.randrange(1, P)
        cv[r] = cur * bv[r] % P
        cur = cv[r]
    proof = plonk.prove(pk, [av, bv, cv], [cur], rng=random.Random(18))
    assert plonk.verify(vk, proof, [cur])
    return vk, proof, cur


def _load_generated(vk, tmp_path):
    path = str(tmp_path / "generated_verifier.py")
    codegen.generate_verifier(vk, path)
    spec = importlib.util.spec_from_file_location("generated_verifier", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generated_verifier_accepts(setup, tmp_path):
    vk, proof, result = setup
    mod = _load_generated(vk, tmp_path)
    assert mod.VK_DIGEST == vk.vk_digest
    assert mod.verify(proof, [result])


def test_generated_verifier_rejects(setup, tmp_path):
    vk, proof, result = setup
    mod = _load_generated(vk, tmp_path)
    assert not mod.verify(proof, [(result + 1) % P])
    bad = bytearray(proof)
    bad[70] ^= 1
    assert not mod.verify(bytes(bad), [result])
    assert not mod.verify(proof[:-32], [result])


def test_calldata_roundtrip(setup):
    _, proof, result = setup
    blob = codegen.encode_calldata(proof, [result])
    proof2, instances = codegen.decode_calldata(blob)
    assert proof2 == proof and instances == [result]


def test_generated_verifier_lookup_circuit(tmp_path):
    """Generated artifact replays the lookup transcript + 5-row block."""
    srs = srs_mod.synthetic_srs(k=K)
    q, t = plonk.Fixed(0), plonk.Fixed(1)
    a, b = plonk.Advice(0), plonk.Advice(1)
    cs = plonk.ConstraintSystem(k=K, num_fixed=2, num_advice=2)
    cs.gates.append(("copy_b", [q * (b - a)]))
    cs.lookups.append(("range16", [q * a], [t]))
    cs.permutation_columns = [plonk.Column("advice", 0),
                              plonk.Column("instance", 0)]
    cs.copies.append((plonk.Column("advice", 0), 0,
                      plonk.Column("instance", 0), 0))
    qv = [0] * N
    tv = [0] * N
    av = [0] * N
    bv = [0] * N
    for i in range(16):
        tv[i] = i
    for r, v in enumerate([1, 5, 15, 0, 7]):
        qv[r] = 1
        av[r] = v
        bv[r] = v
    pk, vk = plonk.keygen(cs, srs, [qv, tv], engine="host")
    proof = plonk.prove(pk, [av, bv], [1], rng=random.Random(9),
                        engine="host")
    assert plonk.verify(vk, proof, [1])

    path = str(tmp_path / "lookup_verifier.py")
    codegen.generate_verifier(vk, path)
    spec = importlib.util.spec_from_file_location("lookup_verifier", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.verify(proof, [1])
    assert not mod.verify(proof, [2])
    bad = bytearray(proof)
    bad[80] ^= 1
    assert not mod.verify(bytes(bad), [1])
