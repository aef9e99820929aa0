"""Deployment fixture: real verifier libraries behind the EVM harness."""

import os

import pytest

from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.protocol import contract
from zkos_tpu.srv import deploy, evm_runner as ev

VERSION = contract.CONTRACT_VERSION


def test_deploy_suite_links_real_libraries():
    d = deploy.deploy_suite(tree_height=3)
    r = d.runner
    # every library sits at its fixed address with code behind it
    for addr in list(d.verifier_addresses.values()) + \
            [d.poseidon2_address, d.shielder_address, ev.ARBSYS_ADDRESS]:
        assert addr in r.contracts
    # the hash library is callable on-chain and matches the off-chain hash
    res = r.call(d.poseidon2_address, "evaluate", [1, 2, 3, 4, 5, 6, 7])
    assert res.output == hash_ints([1, 2, 3, 4, 5, 6, 7])
    # reverting sentinel deployed (transfer-failure fault injection)
    with pytest.raises(ev.Revert, match="REVERTING_ADDRESS"):
        r.call(ev.REVERTING_ADDRESS, "anything")


def test_real_verifier_rejects_garbage_proof():
    """The linked verifier is the real committed twin: junk proof bytes
    revert with the verification error (verifier.rs corrupted-proof)."""
    d = deploy.deploy_suite(tree_height=3)
    with pytest.raises(ev.Revert, match="NewAccountVerificationFailed"):
        d.runner.call(
            d.shielder_address, "new_account_native",
            expected_version=VERSION, caller=0xAA, amount=10_000,
            new_note=1, prenullifier=2, sym_c1=(1, 1), sym_c2=(2, 2),
            mac_salt=1, mac_commitment=2, proof=b"junk")
    # empty proof too (verifier.rs:104-112 empty-proof case)
    with pytest.raises(ev.Revert, match="NewAccountVerificationFailed"):
        d.runner.call(
            d.shielder_address, "new_account_native",
            expected_version=VERSION, caller=0xAA, amount=10_000,
            new_note=1, prenullifier=2, sym_c1=(1, 1), sym_c2=(2, 2),
            mac_salt=1, mac_commitment=2, proof=b"")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(deploy.ART, "deposit_pk.bin")),
    reason="pronto key artifacts not generated (generate_pronto_keys.py)")
def test_real_proof_verifies_on_deployed_suite():
    """prove (pronto pk) -> call through EvmRunner -> real verifier
    accepts -> note lands in the tree (the reference's primary loop)."""
    import json
    import random

    from zkos_tpu.models import shielder as sh
    from zkos_tpu.protocol import merkle, notes, secrets
    from zkos_tpu.proof import plonk, serialize, srs as srs_mod

    meta = json.load(open(os.path.join(deploy.ART, "deposit_meta.json")))
    srs = srs_mod.read(k=meta["k"])
    id_ = secrets.generate_user_id(1)
    tree = merkle.MerkleTree(height=contract.consts.TREE_HEIGHT)
    nul = secrets.derive_nullifier(id_, 0)
    idx = tree.add_note(notes.make_note(id_, nul, 100, 0))
    path = merkle.path_to_matrix(tree.get_merkle_path(idx))
    pkn = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100,
        token_address=0, path=path, value=5,
        commitment=contract.deposit_commitment(0xAA, 0),
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    builder = sh.build_deposit(meta["k"], pkn)
    cs = sh._cs_with_copies(meta["k"], builder)
    pk = serialize.unmarshall_pk(
        open(os.path.join(deploy.ART, "deposit_pk.bin"), "rb").read(),
        cs, srs)
    root = tree.get_merkle_path(idx)[-1]
    pub = pkn.public_input(root)
    proof = plonk.prove(pk, builder.advice, pub,
                        rng=random.Random(3), engine="host")

    d = deploy.deploy_suite()
    # mirror the prover's tree on the contract side, then deposit
    d.shielder.tree = tree
    d.shielder.balance = 100
    res = d.runner.call(
        d.shielder_address, "deposit_native",
        expected_version=VERSION, caller=0xAA, amount=pub[3],
        old_nullifier_hash=pub[1], new_note=pub[2], merkle_root=pub[0],
        mac_salt=pub[6], mac_commitment=pub[7], proof=proof, value=pub[3])
    assert res.output == 1  # second leaf
    assert res.gas_used > contract.GAS_VERIFY["deposit"]
