"""Full-system scenario: real proofs through the contract simulator.

The tooling-e2e-tests/full_scenario.sh + integration-tests analog: a user
creates a shielded account, deposits, and withdraws via a relayer — every
step proven with the real PLONK prover and verified by the contract sim's
wired-in verifiers; balances and state recovery asserted at the end.
Tree height 2 / k=9 keeps proving minutes-fast; the shapes match the
height-13 production tree structurally.
"""

import random

import pytest

from zkos_tpu.models import shielder as sh
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.protocol import contract, merkle, secrets
from zkos_tpu.proof import srs as srs_mod
from zkos_tpu.srv import client as cl

P = G.FR_MODULUS
K = 9
HEIGHT = 2
VERSION = contract.CONTRACT_VERSION


@pytest.fixture(scope="module")
def srs():
    return srs_mod.synthetic_srs(k=K)


def test_full_native_lifecycle(srs):
    rng = random.Random(99)
    ar_sk, ar_pk = GR.generate_keys(rng.randrange(1, GR.SCALAR_ORDER))
    caller = 0xA11CE
    relayer = 0x4E1A
    withdrawal_addr = 0xFA57

    # --- circuit setups (deposit/withdraw only; NewAccount's ElGamal needs
    # k=10 — the sim accepts a stub for it here, its circuit has its own test)
    dep_example, _ = _deposit_builder(secrets.generate_user_id(1), 0, 0, rng)
    dep_circ = sh.ShielderCircuit.setup("deposit", K, srs, dep_example)
    wit_example, _ = _withdraw_builder(secrets.generate_user_id(2), 0, 0, rng)
    wit_circ = sh.ShielderCircuit.setup("withdraw", K, srs, wit_example)

    sim = contract.ShielderSim(
        verify_new_account=lambda proof, pub: proof == b"newacct-stub",
        verify_deposit=dep_circ.verify,
        verify_withdraw=wit_circ.verify,
        ar_pubkey=ar_pk, tree_height=HEIGHT, deposit_fee_bps=100)

    # --- new account (stub-verified entry; proven variants in
    # test_shielder_circuits) ---
    id_ = secrets.generate_user_id(31415)
    amount0 = 50_000
    fee0 = contract.consts.protocol_fee_from_gross(amount0, 100)
    balance = amount0 - fee0
    note0 = _note(id_, 0, balance)
    sim.new_account_native(
        expected_version=VERSION, caller=caller, amount=amount0,
        new_note=note0, prenullifier=cl.expected_nullifier_hash(id_, 0),
        sym_c1=(1, 1), sym_c2=(2, 2), mac_salt=5, mac_commitment=6,
        proof=b"newacct-stub")

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

    acc = cl.recover_state(id_, sim)
    assert acc.nonce == 3
    assert acc.shielded_amount == balance
    assert [a.kind for a in acc.history] == ["new_account", "deposit",
                                             "withdraw"]


def _note(id_, nonce, balance):
    """State note after the nonce-th action (nullifier = derive(id, nonce))."""
    from zkos_tpu.protocol import notes

    return notes.make_note(id_, secrets.derive_nullifier(id_, nonce), balance)


def _deposit_builder(id_, seed, fill, rng):
    tree = merkle.MerkleTree(height=HEIGHT)
    from zkos_tpu.protocol import notes

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
    from zkos_tpu.protocol import notes

    nul = secrets.derive_nullifier(id_, 0)
    note = notes.make_note(id_, nul, 100, 0)
    idx = tree.add_note(note)
    flat = tree.get_merkle_path(idx)
    pkn = sh.WithdrawProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=merkle.path_to_matrix(flat), withdrawal_value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    return sh.build_withdraw(K, pkn), pkn
