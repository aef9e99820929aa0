"""Protocol layer: keccak secrets (pinned reference vectors), Merkle tree,
account state machine, conversions, fee math."""

import random

import pytest

from zkos_tpu.ops import poseidon2 as P2
from zkos_tpu.ops.keccak import keccak256
from zkos_tpu.protocol import account, consts, merkle, notes, secrets
from zkos_tpu.utils import conversions as conv


# -- keccak + secret derivation: the reference's own pinned vectors
#    (crates/shielder-account/src/secrets.rs:76-107) --

def test_derive_nullifier_reference_vector():
    # keccak(0x..0f || "nullifier" || 000000ff) =
    # 0x375a07a9503d15a291307e33ad0c297c9768fea4712947172ad09f2df34d8015, mod r
    expected_pre = 0x375A07A9503D15A291307E33AD0C297C9768FEA4712947172AD09F2DF34D8015
    got = secrets.derive_nullifier(15, 0x000000FF)
    assert got == expected_pre % secrets.FIELD_MODULUS
    assert got != expected_pre  # the vector is > r, reduction must kick in


def test_derive_id_reference_vector():
    expected_pre = 0xF4B3B097DFB3DA737872BDF8B59A3B3723345DC147A0B8229608DB69CFEF6499
    got = secrets.derive_id(16, 26, 45)
    assert got == expected_pre % secrets.FIELD_MODULUS
    assert got != expected_pre


def test_keccak_empty_vector():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")


# -- Merkle tree vs contract semantics --

def test_tree_bounds_height13():
    max_leaf, first_leaf = merkle.tree_bounds(13)
    size = sum(7 ** i for i in range(14))
    assert max_leaf == size
    assert first_leaf == size - 7 ** 13 + 1


def test_merkle_insert_and_path():
    t = merkle.MerkleTree(height=3)
    idx = [t.add_note(100 + i) for i in range(10)]
    assert idx == list(range(10))
    for i in range(10):
        path = t.get_merkle_path(i)
        assert len(path) == 3 * 7 + 1
        assert merkle.verify_path(100 + i, path)
    assert t.root_exists(t.root)
    with pytest.raises(IndexError):
        t.get_merkle_path(10)


def test_merkle_untouched_nodes_are_zero():
    t = merkle.MerkleTree(height=2)
    t.add_note(5)
    # level-1 path group beyond the first parent must be all zeros
    path = t.get_merkle_path(0)
    assert path[0] == 5 and all(x == 0 for x in path[1:7])
    assert path[7] == P2.hash_ints([5, 0, 0, 0, 0, 0, 0])


def test_batch_build_matches_incremental():
    random.seed(4)
    leaves = [random.randrange(secrets.FIELD_MODULUS) for _ in range(23)]
    t = merkle.MerkleTree(height=3)
    for x in leaves:
        t.add_note(x)
    root, _levels = merkle.batch_build_levels(leaves, height=3)
    assert root == t.root


# -- account state machine --

def test_account_nullifier_chain_and_note():
    acc = account.ShielderAccount.new(id_seed=1234)
    assert acc.note() is None
    assert acc.previous_nullifier() == acc.id  # prenullifier
    n0 = acc.next_nullifier()
    assert n0 == secrets.derive_nullifier(acc.id, 0)
    acc.register_action(account.ShielderAction(
        kind="new_account", amount=100, protocol_fee=3, note_index=0,
        token_address=consts.NATIVE_TOKEN_ADDRESS))
    assert acc.shielded_amount == 97
    assert acc.note() == notes.make_note(acc.id, n0, 97)
    acc.register_action(account.ShielderAction(
        kind="withdraw", amount=50, protocol_fee=0, note_index=1,
        token_address=consts.NATIVE_TOKEN_ADDRESS))
    assert acc.shielded_amount == 47
    assert acc.nonce == 2


# -- conversions + fees --

def test_conversions_roundtrip():
    x = 0xDEADBEEF << 100
    assert conv.le_bytes_to_field(conv.field_to_le_bytes(x)) == x
    assert conv.address_to_field("0x" + "ab" * 20) == int("ab" * 20, 16)
    assert conv.field_to_address(conv.address_to_field(42)) == 42
    with pytest.raises(AssertionError):
        conv.field_to_address(1 << 200)


def test_protocol_fee_reference_vectors():
    # shielder-setup/lib.rs tests: gross 100_000 @500bps -> 5000;
    # gross 99_997 @500bps -> 5000; net gross-up consistency
    assert consts.protocol_fee_from_gross(100_000, 500) == 5000
    assert consts.protocol_fee_from_gross(99_997, 500) == 5000
    assert consts.protocol_fee_from_net(95_000, 500) == 5000
    assert consts.protocol_fee_from_net(94_997, 500) == 5000
    assert consts.protocol_fee_from_gross(100_000, 0) == 0

    version = consts.contract_version()
    assert version.to_bytes3() == 0x000101
    assert version.note_version() == 0
