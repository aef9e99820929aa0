"""Committed-artifact round trips: pronto keys -> fresh proof -> twins.

The reference embeds build-time params.bin/pk.bin per circuit and its
verifier contracts are driven against freshly generated proofs
(integration-tests src/verifier.rs:61-151).  Here the committed
artifacts/ bundle is the same surface: {name}_pk.bin (pronto proving
key), {name}_verifier.py (executable verifier twin), {Name}Verifier.sol
(deployable twin, digest-linked).  These tests prove a REAL proof with
the committed key and drive it through the committed twin — no keygen,
so the default suite affords it.
"""

import importlib.util
import json
import os
import random
import sys

import pytest

from zkos_tpu.models import shielder as sh
from zkos_tpu.protocol import contract, merkle, notes, secrets
from zkos_tpu.proof import plonk, serialize, srs as srs_mod

ART = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def _load_twin(name: str):
    path = os.path.join(ART, f"{name}_verifier.py")
    spec = importlib.util.spec_from_file_location(f"{name}_twin", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _deposit_knowledge():
    id_ = secrets.generate_user_id(1)
    tree = merkle.MerkleTree(height=contract.consts.TREE_HEIGHT)
    nul = secrets.derive_nullifier(id_, 0)
    idx = tree.add_note(notes.make_note(id_, nul, 100, 0))
    path = merkle.path_to_matrix(tree.get_merkle_path(idx))
    pkn = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100,
        token_address=0, path=path, value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    root = tree.get_merkle_path(idx)[-1]
    return pkn, root


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "deposit_pk.bin")),
    reason="pronto key artifacts not generated (generate_pronto_keys.py)")
def test_deposit_pronto_key_proof_through_committed_twin():
    """new_pronto semantics: committed pk.bin -> real proof -> committed
    python twin verifies it; perturbed inputs rejected."""
    meta = json.load(open(os.path.join(ART, "deposit_meta.json")))
    k = meta["k"]
    srs = srs_mod.read(k=k)
    pkn, root = _deposit_knowledge()
    builder = sh.build_deposit(k, pkn)
    cs = sh._cs_with_copies(k, builder)
    pk = serialize.unmarshall_pk(
        open(os.path.join(ART, "deposit_pk.bin"), "rb").read(), cs, srs)
    assert pk.vk.vk_digest == meta["vk_digest"]

    pub = pkn.public_input(root)
    proof = plonk.prove(pk, builder.advice, pub,
                        rng=random.Random(3), engine="host")

    twin = _load_twin("deposit")
    assert twin.VK_DIGEST == meta["vk_digest"]
    assert twin.verify(proof, pub)
    # corrupted proof / perturbed public input are rejected
    bad = bytearray(proof)
    bad[7] ^= 1
    assert not twin.verify(bytes(bad), pub)
    assert not twin.verify(proof, [pub[0] ^ 1] + list(pub[1:]))


@pytest.mark.skipif(
    os.environ.get("ZKOS_SLOW_TESTS") != "1" or
    not os.path.exists(os.path.join(ART, "newaccount_pk.bin")),
    reason="slow: two more ~50s host proves (ZKOS_SLOW_TESTS=1)")
def test_newaccount_and_withdraw_pronto_round_trips():
    import zkos_tpu.ops.grumpkin_golden as GR

    rng = random.Random(1)
    _, ar_pk = GR.generate_keys(rng.randrange(1, GR.SCALAR_ORDER))
    id_ = secrets.generate_user_id(1)
    na = sh.NewAccountProverKnowledge(
        id=id_, nullifier=secrets.derive_nullifier(id_, 0),
        initial_deposit=100, commitment=1, token_address=0,
        encryption_salt=0x5A17, ar_pubkey=ar_pk, mac_salt=5)
    pkn_w, root = _deposit_knowledge()
    wit = sh.WithdrawProverKnowledge(
        id=pkn_w.id, nullifier_old=pkn_w.nullifier_old,
        account_old_balance=100, token_address=0, path=pkn_w.path,
        withdrawal_value=5, commitment=1,
        nullifier_new=pkn_w.nullifier_new, mac_salt=2)
    cases = [
        ("newaccount", lambda k: sh.build_new_account(k, na),
         lambda: na.public_input()),
        ("withdraw", lambda k: sh.build_withdraw(k, wit),
         lambda: wit.public_input(root)),
    ]
    srs11 = srs_mod.read(k=11)
    for name, build, pub_fn in cases:
        meta = json.load(open(os.path.join(ART, f"{name}_meta.json")))
        # only the k=11 ptau ships; shrink for smaller min-k relations
        srs = srs11.shrink(meta["k"]) if meta["k"] < 11 else srs11
        builder = build(meta["k"])
        cs = sh._cs_with_copies(meta["k"], builder)
        pk = serialize.unmarshall_pk(
            open(os.path.join(ART, f"{name}_pk.bin"), "rb").read(), cs, srs)
        pub = pub_fn()
        proof = plonk.prove(pk, builder.advice, pub,
                            rng=random.Random(5), engine="host")
        twin = _load_twin(name)
        assert twin.VK_DIGEST == meta["vk_digest"] == pk.vk.vk_digest
        assert twin.verify(proof, pub), name
