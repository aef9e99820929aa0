"""Bindings facade, artifact (de)serialization, operational tools."""

from zkos_tpu.ops.grumpkin_golden import GEN as GRUMPKIN_GEN
import random

import pytest

from zkos_tpu import bindings
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.proof import plonk, serialize, srs as srs_mod
from zkos_tpu.protocol import contract, merkle, secrets
from zkos_tpu.srv import relayer as rl
from zkos_tpu.srv import tools

P = G.FR_MODULUS


def test_scalar_wire_format():
    x = 0x1234567890ABCDEF
    b = bindings.scalar_to_bytes(x)
    assert len(b) == 32 and b[0] == 0xEF  # little-endian
    assert bindings.scalar_from_bytes(b) == x
    with pytest.raises(AssertionError):
        bindings.scalar_from_bytes((P).to_bytes(32, "little"))


def test_poseidon_hash_bytes_surface():
    vals = [3, 5, 7]
    flat = b"".join(bindings.scalar_to_bytes(v) for v in vals)
    out = bindings.poseidon2_hash_bytes(flat)
    assert bindings.scalar_from_bytes(out) == hash_ints(vals)
    assert bindings.poseidon_hash([42]) == hash_ints([42])


def test_derive_id_and_action_secrets():
    id_bytes = bindings.derive_id("0xabcdef", 1, 0)
    id_ = bindings.scalar_from_bytes(id_bytes)
    from zkos_tpu.ops import grumpkin_golden as GR

    assert GR.lift_x(id_) is not None  # on-curve id
    s = bindings.get_action_secrets(id_bytes, 3)
    assert bindings.scalar_from_bytes(s["nullifier"]) == (
        secrets.derive_nullifier(id_, 3))


def test_vec_to_path_shape():
    t = merkle.MerkleTree(height=13)
    t.add_note(5)
    path = t.get_merkle_path(0)
    mat = bindings.vec_to_path(path)
    assert len(mat) == 13 and all(len(level) == 7 for level in mat)


def test_params_and_pk_marshalling_roundtrip():
    srs = srs_mod.synthetic_srs(k=5)
    blob = serialize.marshall_params(srs)
    srs2 = serialize.unmarshall_params(blob)
    assert (srs2.k, srs2.g1, srs2.g2, srs2.s_g2) == (srs.k, srs.g1, srs.g2,
                                                     srs.s_g2)

    # tiny circuit: keygen -> marshall -> unmarshall -> prove -> verify
    q = plonk.Fixed(0)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    cs = plonk.ConstraintSystem(k=5, num_fixed=1, num_advice=2)
    cs.gates.append(("sq", [q * (a * a - b)]))
    n = 1 << 5
    qv = [1] * 4 + [0] * (n - 4)
    pk, vk = plonk.keygen(cs, srs, [qv])
    pk2 = serialize.unmarshall_pk(serialize.marshall_pk(pk), cs, srs)
    assert pk2.vk.vk_digest == vk.vk_digest

    av = [0] * n
    bv = [0] * n
    for r in range(4):
        av[r] = r + 2
        bv[r] = (r + 2) ** 2
    proof = plonk.prove(pk2, [av, bv], [], rng=random.Random(1))
    assert plonk.verify(pk2.vk, proof, [])
    assert plonk.verify(vk, proof, [])


def test_tools_memo_scan_and_distribute():
    ok = lambda p, pub: True  # noqa: E731
    sim = contract.ShielderSim(verify_new_account=ok, verify_deposit=ok,
                               verify_withdraw=ok, ar_pubkey=GRUMPKIN_GEN,
                               tree_height=3)
    sim.new_account_native(
        expected_version=contract.CONTRACT_VERSION, caller=1, amount=1000,
        new_note=7, prenullifier=hash_ints([1]), sym_c1=(1, 1), sym_c2=(2, 2),
        mac_salt=1, mac_commitment=2, proof=b"x", memo=b"hello")
    sim.new_account_native(
        expected_version=contract.CONTRACT_VERSION, caller=1, amount=1000,
        new_note=8, prenullifier=hash_ints([2]), sym_c1=(1, 1), sym_c2=(2, 2),
        mac_salt=1, mac_commitment=2, proof=b"x")
    memos = tools.scan_memos(sim)
    assert len(memos) == 1 and memos[0]["memo"] == b"hello"

    balances = {100: 10_000}
    tools.distribute_funds(balances, 100, [1, 2, 3], 1000)
    assert balances[100] == 7_000 and balances[2] == 1000


def test_tools_stress_relayer():
    ok = lambda p, pub: True  # noqa: E731
    sim = contract.ShielderSim(verify_new_account=ok, verify_deposit=ok,
                               verify_withdraw=ok, ar_pubkey=GRUMPKIN_GEN,
                               tree_height=3)
    sim.new_account_native(
        expected_version=contract.CONTRACT_VERSION, caller=1, amount=100_000,
        new_note=7, prenullifier=hash_ints([1]), sym_c1=(1, 1), sym_c2=(2, 2),
        mac_salt=1, mac_commitment=2, proof=b"x")
    tm = rl.Taskmaster(sim, signer_keys=[0xC1, 0xC2])
    root = sim.get_merkle_path(0)[-1]
    reqs = [{
        "expected_version": contract.CONTRACT_VERSION, "amount": 500,
        "withdrawal_address": 2, "merkle_root": root,
        "old_nullifier_hash": hash_ints([100 + i]), "new_note": 200 + i,
        "proof": b"x", "relayer_address": 3, "relayer_fee": 5,
        "mac_salt": 1, "mac_commitment": 2} for i in range(10)]
    try:
        res = tools.stress_relayer(tm, reqs, concurrency=4)
        assert res.successes == 10 and res.failures == 0
        rep = res.report()
        assert rep["requests"] == 10 and rep["throughput_rps"] > 0
        assert rep["p50_ms"] <= rep["p90_ms"] <= rep["p99_ms"]
    finally:
        tm.shutdown()
