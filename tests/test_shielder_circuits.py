"""The three Shielder relations: prove + verify, cross-checked against the
protocol layer (notes, merkle, secrets, AR decryption)."""

import random

import pytest

from zkos_tpu.models import gadgets as gd
from zkos_tpu.models import shielder as sh
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.proof import plonk, srs as srs_mod
from zkos_tpu.protocol import merkle, notes, secrets

P = G.FR_MODULUS


@pytest.fixture(scope="module")
def srs10():
    return srs_mod.synthetic_srs(k=10)


@pytest.fixture(scope="module")
def srs9():
    return srs_mod.synthetic_srs(k=9)


def _deposit_pkn(height: int):
    rng = random.Random(21)
    id_ = secrets.generate_user_id(777)
    nullifier_old = secrets.derive_nullifier(id_, 0)
    balance_old = 10_000
    token = 0
    old_note = notes.make_note(id_, nullifier_old, balance_old, token)

    tree = merkle.MerkleTree(height=height)
    for filler in range(3):
        tree.add_note(rng.randrange(P))
    idx = tree.add_note(old_note)
    flat = tree.get_merkle_path(idx)
    path = merkle.path_to_matrix(flat)
    root = flat[-1]

    pkn = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nullifier_old, account_old_balance=balance_old,
        token_address=token, path=path, value=55,
        commitment=rng.randrange(P),
        nullifier_new=secrets.derive_nullifier(id_, 1),
        mac_salt=rng.randrange(P))
    return pkn, root


def test_deposit_roundtrip(srs9):
    pkn, root = _deposit_pkn(height=2)
    b = sh.build_deposit(9, pkn)
    pub = pkn.public_input(root)
    assert [b.advice[c][r] for c, r in b.instance_map] == pub
    circ = sh.ShielderCircuit.setup("deposit", 9, srs9, b)
    proof = circ.prove(b, pub, seed=31)
    assert circ.verify(proof, pub)
    # nullifier-hash tamper must fail
    bad = list(pub)
    bad[1] = (bad[1] + 1) % P
    assert not circ.verify(proof, bad)


def test_withdraw_roundtrip(srs9):
    rng = random.Random(22)
    id_ = secrets.generate_user_id(888)
    nullifier_old = secrets.derive_nullifier(id_, 3)
    balance_old = 5_000
    old_note = notes.make_note(id_, nullifier_old, balance_old, 0)
    tree = merkle.MerkleTree(height=2)
    idx = tree.add_note(old_note)
    flat = tree.get_merkle_path(idx)
    pkn = sh.WithdrawProverKnowledge(
        id=id_, nullifier_old=nullifier_old, account_old_balance=balance_old,
        token_address=0, path=merkle.path_to_matrix(flat),
        withdrawal_value=1_200, commitment=rng.randrange(P),
        nullifier_new=secrets.derive_nullifier(id_, 4),
        mac_salt=rng.randrange(P))
    pub = pkn.public_input(flat[-1])
    b = sh.build_withdraw(9, pkn)
    assert [b.advice[c][r] for c, r in b.instance_map] == pub
    circ = sh.ShielderCircuit.setup("withdraw", 9, srs9, b)
    proof = circ.prove(b, pub, seed=32)
    assert circ.verify(proof, pub)


def test_new_account_roundtrip(srs10):
    rng = random.Random(23)
    id_ = secrets.generate_user_id(999)
    ar_sk, ar_pk = GR.generate_keys(rng.randrange(1, GR.SCALAR_ORDER))
    pkn = sh.NewAccountProverKnowledge(
        id=id_,
        nullifier=secrets.derive_nullifier(id_, 0),
        initial_deposit=1_000,
        commitment=rng.randrange(P),
        token_address=0,
        encryption_salt=rng.randrange(1 << sh.SALT_BITS),
        ar_pubkey=ar_pk,
        mac_salt=rng.randrange(P))
    pub = pkn.public_input()
    b = sh.build_new_account(10, pkn)
    assert [b.advice[c][r] for c, r in b.instance_map] == pub
    circ = sh.ShielderCircuit.setup("new_account", 10, srs10, b)
    proof = circ.prove(b, pub, seed=33)
    assert circ.verify(proof, pub)

    # the AR operator can decrypt the viewing key from the public inputs
    c1 = (pub[7], pub[8])
    c2 = (pub[9], pub[10])
    from zkos_tpu.protocol import ar

    assert ar.decrypt_viewing_key(c1, c2, ar_sk) == id_
    # and link the account via the MAC
    assert ar.mac_matches(pub[11], id_, pub[12])
