"""Full-system scenario: real proofs through the contract simulator.

The tooling-e2e-tests/full_scenario.sh + integration-tests analog: a user
creates a shielded account (REAL NewAccount proof, ElGamal included),
deposits, and withdraws via a relayer — every step proven with the real
PLONK prover and verified by the contract sim's wired-in verifiers;
balances and state recovery asserted at the end.

The default lifecycle runs NewAccount at its native k=10 against the real
ppot_0080_11 SRS and the transfers at k=9 / height-2 (structurally identical
to the height-13 production tree).  The full production shape — tree height
13, k=11, all three circuits — runs under ZKOS_SLOW_TESTS=1 below and on
the TPU in bench.py every round.
"""

import os
import random

import pytest

from zkos_tpu.models import shielder as sh
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.protocol import contract, merkle, notes, secrets
from zkos_tpu.proof import srs as srs_mod
from zkos_tpu.srv import client as cl

P = G.FR_MODULUS
K = 9
K_NA = 10  # NewAccount needs ~735 rows (ElGamal double-and-add chains)
HEIGHT = 2
VERSION = contract.CONTRACT_VERSION


@pytest.fixture(scope="module")
def srs_real():
    """The real perpetual-powers-of-tau SRS (k=11), parsed once."""
    try:
        return srs_mod.read(k=11, max_points=1 << K_NA)
    except FileNotFoundError:
        pytest.skip("ppot resources not available")


@pytest.fixture(scope="module")
def srs(srs_real):
    return srs_real.shrink(K)


def _na_knowledge(id_, balance, commitment, ar_pk, salt=0x5A17, mac_salt=5):
    return sh.NewAccountProverKnowledge(
        id=id_, nullifier=secrets.derive_nullifier(id_, 0),
        initial_deposit=balance, commitment=commitment, token_address=0,
        encryption_salt=salt, ar_pubkey=ar_pk, mac_salt=mac_salt)


def test_full_native_lifecycle(srs_real, srs):
    rng = random.Random(99)
    ar_sk, ar_pk = GR.generate_keys(rng.randrange(1, GR.SCALAR_ORDER))
    caller = 0xA11CE
    relayer = 0x4E1A
    withdrawal_addr = 0xFA57

    # --- circuit setups: all three relations with REAL provers ---
    id_ = secrets.generate_user_id(31415)
    amount0 = 50_000
    fee0 = contract.consts.protocol_fee_from_gross(amount0, 100)
    balance = amount0 - fee0
    commitment0 = contract.new_account_commitment(caller, fee0)
    na_pkn = _na_knowledge(id_, balance, commitment0, ar_pk)
    na_circ = sh.ShielderCircuit.setup(
        "new_account", K_NA, srs_real.shrink(K_NA),
        sh.build_new_account(K_NA, na_pkn))
    dep_example, _ = _deposit_builder(secrets.generate_user_id(1), 0, 0, rng)
    dep_circ = sh.ShielderCircuit.setup("deposit", K, srs, dep_example)
    wit_example, _ = _withdraw_builder(secrets.generate_user_id(2), 0, 0, rng)
    wit_circ = sh.ShielderCircuit.setup("withdraw", K, srs, wit_example)

    sim = contract.ShielderSim(
        verify_new_account=na_circ.verify,
        verify_deposit=dep_circ.verify,
        verify_withdraw=wit_circ.verify,
        ar_pubkey=ar_pk, tree_height=HEIGHT, deposit_fee_bps=100)

    # --- new account with a REAL proof (13 public inputs incl. ElGamal) ---
    na_pub = na_pkn.public_input()
    na_proof = na_circ.prove(sh.build_new_account(K_NA, na_pkn), na_pub,
                             seed=40)
    sim.new_account_native(
        expected_version=VERSION, caller=caller, amount=amount0,
        new_note=na_pub[0], prenullifier=na_pub[1],
        sym_c1=(na_pub[7], na_pub[8]), sym_c2=(na_pub[9], na_pub[10]),
        mac_salt=na_pub[11], mac_commitment=na_pub[12], proof=na_proof)

    # the AR operator can decrypt the viewing key from the chain data
    from zkos_tpu.protocol import ar as ar_mod

    vk_dec = ar_mod.decrypt_viewing_key((na_pub[7], na_pub[8]),
                                        (na_pub[9], na_pub[10]), ar_sk)
    assert vk_dec == id_

    # --- deposit with a real proof ---
    amount1 = 20_000
    fee1 = contract.consts.protocol_fee_from_gross(amount1, 100)
    value1 = amount1 - fee1
    path = merkle.path_to_matrix(sim.get_merkle_path(0))
    root = sim.get_merkle_path(0)[-1]
    pkn = sh.DepositProverKnowledge(
        id=id_, nullifier_old=secrets.derive_nullifier(id_, 0),
        account_old_balance=balance, token_address=0, path=path,
        value=value1,
        commitment=contract.deposit_commitment(caller, fee1),
        nullifier_new=secrets.derive_nullifier(id_, 1),
        mac_salt=7)
    pub = pkn.public_input(root)
    proof = dep_circ.prove(sh.build_deposit(K, pkn), pub, seed=41)
    sim.deposit_native(
        expected_version=VERSION, caller=caller, amount=amount1,
        old_nullifier_hash=pub[1], new_note=pub[2], merkle_root=root,
        mac_salt=7, mac_commitment=pub[7], proof=proof)
    balance += value1

    # --- withdraw via relayer with a real proof ---
    amount2 = 9_000
    relayer_fee = 120
    path = merkle.path_to_matrix(sim.get_merkle_path(1))
    root = sim.get_merkle_path(1)[-1]
    wkn = sh.WithdrawProverKnowledge(
        id=id_, nullifier_old=secrets.derive_nullifier(id_, 1),
        account_old_balance=balance, token_address=0, path=path,
        withdrawal_value=amount2,
        commitment=contract.withdraw_commitment(
            withdrawal_addr, relayer, relayer_fee, sim.chain_id, 0, 0),
        nullifier_new=secrets.derive_nullifier(id_, 2),
        mac_salt=8)
    wpub = wkn.public_input(root)
    wproof = wit_circ.prove(sh.build_withdraw(K, wkn), wpub, seed=42)
    sim.withdraw_native(
        expected_version=VERSION, amount=amount2,
        withdrawal_address=withdrawal_addr, merkle_root=root,
        old_nullifier_hash=wpub[1], new_note=wpub[2], proof=wproof,
        relayer_address=relayer, relayer_fee=relayer_fee,
        mac_salt=8, mac_commitment=wpub[7])
    balance -= amount2

    # --- assertions: balances, double-spend, recovery ---
    assert sim.balances[withdrawal_addr] == amount2 - relayer_fee
    assert sim.balances[relayer] == relayer_fee
    assert sim.balance == balance

    with pytest.raises(contract.ShielderError, match="DuplicatedNullifier"):
        sim.withdraw_native(
            expected_version=VERSION, amount=amount2,
            withdrawal_address=withdrawal_addr, merkle_root=root,
            old_nullifier_hash=wpub[1], new_note=wpub[2], proof=wproof,
            relayer_address=relayer, relayer_fee=relayer_fee,
            mac_salt=8, mac_commitment=wpub[7])

    # real-proof negatives: corrupted byte / wrong public input
    bad = bytearray(wproof)
    bad[100] ^= 1
    assert not wit_circ.verify(bytes(bad), wpub)
    assert not wit_circ.verify(wproof, wpub[:-1] + [(wpub[-1] + 1) % P])

    acc = cl.recover_state(id_, sim)
    assert acc.nonce == 3
    assert acc.shielded_amount == balance
    assert [a.kind for a in acc.history] == ["new_account", "deposit",
                                             "withdraw"]


@pytest.mark.skipif(os.environ.get("ZKOS_SLOW_TESTS") != "1",
                    reason="production shape (height 13, k=11) takes "
                           "minutes on the host engine; the TPU bench "
                           "proves it every round")
def test_production_shape_height13_k11():
    """Tree height 13, k=11, real ppot SRS: the reference's exact shape
    (ARITY=7/TREE_HEIGHT=13, shielder-setup/lib.rs:3-6; k=11 resources)."""
    try:
        srs11 = srs_mod.read(k=11)
    except FileNotFoundError:
        pytest.skip("ppot resources not available")
    rng = random.Random(7)
    id_ = secrets.generate_user_id(777)
    tree = merkle.MerkleTree(height=13)
    nul = secrets.derive_nullifier(id_, 0)
    note = notes.make_note(id_, nul, 1_000_000, 0)
    idx = tree.add_note(note)
    path = merkle.path_to_matrix(tree.get_merkle_path(idx))
    root = tree.get_merkle_path(idx)[-1]
    pkn = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=1_000_000,
        token_address=0, path=path, value=77,
        commitment=contract.deposit_commitment(0xAA, 0),
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    circ = sh.ShielderCircuit.setup("deposit", 11, srs11,
                                    sh.build_deposit(11, pkn))
    pub = pkn.public_input(root)
    proof = circ.prove(sh.build_deposit(11, pkn), pub, seed=77)
    assert circ.verify(proof, pub)
    assert not circ.verify(proof, [pub[0] ^ 1] + pub[1:])


def _note(id_, nonce, balance):
    """State note after the nonce-th action (nullifier = derive(id, nonce))."""
    return notes.make_note(id_, secrets.derive_nullifier(id_, nonce), balance)


def _deposit_builder(id_, seed, fill, rng):
    tree = merkle.MerkleTree(height=HEIGHT)
    nul = secrets.derive_nullifier(id_, 0)
    note = notes.make_note(id_, nul, 100, 0)
    idx = tree.add_note(note)
    flat = tree.get_merkle_path(idx)
    pkn = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=merkle.path_to_matrix(flat), value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    return sh.build_deposit(K, pkn), pkn


def _withdraw_builder(id_, seed, fill, rng):
    tree = merkle.MerkleTree(height=HEIGHT)
    nul = secrets.derive_nullifier(id_, 0)
    note = notes.make_note(id_, nul, 100, 0)
    idx = tree.add_note(note)
    flat = tree.get_merkle_path(idx)
    pkn = sh.WithdrawProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=merkle.path_to_matrix(flat), withdrawal_value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    return sh.build_withdraw(K, pkn), pkn
