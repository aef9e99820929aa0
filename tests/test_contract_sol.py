"""The contract behavior matrix against the EMITTED Solidity contracts.

tests/test_contract_matrix.py drives the Python state machine
(protocol/contract.py — the semantic oracle); this file drives the same
scenarios through the INTERPRETED artifacts/Shielder.sol +
artifacts/MerkleTree.sol executing on the EvmRunner (srv.sol_interp) —
the analog of running the reference's integration-tests against the real
contracts on revm (crates/integration-tests/src/shielder/calls/*.rs).

Every revert carries the same custom-error name as the reference
contract, the tree root must equal the host MerkleTree oracle, and the
final balances must agree with the ShielderSim oracle run side by side.
"""

import os

import pytest

from zkos_tpu.ops.grumpkin_golden import GEN as GRUMPKIN_GEN
from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.protocol import contract, merkle
from zkos_tpu.srv import deploy, evm_runner as ev

P = contract.P
VERSION = contract.CONTRACT_VERSION
CALLER = 0xAA
RELAYER = 0xCC
TO = 0xBB
FEE_RECV = 0xFEE


def _suite(**kw):
    d = deploy.deploy_suite_sol(ar_pubkey=GRUMPKIN_GEN, tree_height=3, **kw)
    d.token.mint(CALLER, 10**9)
    return d


def _na(d, variant="native", note=111, caller=CALLER, amount=10_000, **over):
    kw = dict(new_note=note, prenullifier=hash_ints([note]),
              c1x=1, c1y=1, c2x=2, c2y=2, mac_salt=1, mac_commitment=2,
              proof=b"ok", memo=b"", expected_version=VERSION)
    kw.update(over)
    if variant == "erc20":
        return d.runner.call(
            d.shielder_address, "newAccountERC20", kw["expected_version"],
            d.token_address, amount, kw["new_note"], kw["prenullifier"],
            kw["c1x"], kw["c1y"], kw["c2x"], kw["c2y"], kw["mac_salt"],
            kw["mac_commitment"], kw["proof"], kw["memo"], caller=caller)
    return d.runner.call(
        d.shielder_address, "newAccountNative", kw["expected_version"],
        kw["new_note"], kw["prenullifier"], kw["c1x"], kw["c1y"], kw["c2x"],
        kw["c2y"], kw["mac_salt"], kw["mac_commitment"], kw["proof"],
        kw["memo"], caller=caller, value=amount)


def _root(d):
    return d.runner.call(d.tree_address, "root").output


def _dep(d, variant="native", note=222, nul=333, amount=5_000, **over):
    kw = dict(old_nullifier_hash=hash_ints([nul]), new_note=note,
              merkle_root=_root(d), mac_salt=1, mac_commitment=2,
              proof=b"ok", memo=b"", expected_version=VERSION)
    kw.update(over)
    if variant == "erc20":
        return d.runner.call(
            d.shielder_address, "depositERC20", kw["expected_version"],
            d.token_address, amount, kw["old_nullifier_hash"],
            kw["new_note"], kw["merkle_root"], kw["mac_salt"],
            kw["mac_commitment"], kw["proof"], kw["memo"], caller=CALLER)
    return d.runner.call(
        d.shielder_address, "depositNative", kw["expected_version"],
        kw["old_nullifier_hash"], kw["new_note"], kw["merkle_root"],
        kw["mac_salt"], kw["mac_commitment"], kw["proof"], kw["memo"],
        caller=CALLER, value=amount)


def _wd(d, variant="native", note=444, nul=555, amount=3_000,
        relayer_fee=100, msg_value=0, **over):
    kw = dict(withdrawal_address=TO, merkle_root=_root(d),
              old_nullifier_hash=hash_ints([nul]), new_note=note,
              proof=b"ok", relayer_address=RELAYER, mac_salt=1,
              mac_commitment=2, memo=b"", expected_version=VERSION)
    kw.update(over)
    if variant == "erc20":
        return d.runner.call(
            d.shielder_address, "withdrawERC20", kw["expected_version"],
            d.token_address, amount, kw["withdrawal_address"],
            kw["merkle_root"], kw["old_nullifier_hash"], kw["new_note"],
            kw["proof"], kw["relayer_address"], relayer_fee, kw["mac_salt"],
            kw["mac_commitment"], kw["memo"], caller=RELAYER,
            value=msg_value)
    return d.runner.call(
        d.shielder_address, "withdrawNative", kw["expected_version"],
        amount, kw["withdrawal_address"], kw["merkle_root"],
        kw["old_nullifier_hash"], kw["new_note"], kw["proof"],
        kw["relayer_address"], relayer_fee, kw["mac_salt"],
        kw["mac_commitment"], kw["memo"], caller=RELAYER)


VARIANTS = ["native", "erc20"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_lifecycle_succeeds_and_matches_oracles(variant):
    d = _suite()
    _na(d, variant)
    # interpreted tree root == host MerkleTree oracle
    t = merkle.MerkleTree(height=3)
    t.add_note(111)
    assert _root(d) == t.root
    _dep(d, variant)
    _wd(d, variant)
    if variant == "native":
        assert d.runner.balances[TO] == 2_900
        assert d.runner.balances[RELAYER] == 100
    else:
        assert d.token.balanceOf(TO) == 2_900
        assert d.token.balanceOf(RELAYER) == 100
    assert [l[0] for l in d.shielder.logs] == \
        ["NewAccount", "Deposit", "Withdraw"]


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_wrong_version(action, variant):
    d = _suite()
    _na(d, variant)
    with pytest.raises(ev.Revert, match="WrongContractVersion"):
        action(d, variant, expected_version=0x000102)


@pytest.mark.parametrize("action", [_dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_zero_amount(action, variant):
    d = _suite()
    _na(d, variant)
    with pytest.raises(ev.Revert, match="ZeroAmount"):
        action(d, variant, amount=0)


@pytest.mark.parametrize("variant", VARIANTS)
def test_withdraw_amount_too_high(variant):
    d = _suite()
    _na(d, variant)
    err = "AmountTooHigh" if variant == "erc20" else "NativeTransferFailed"
    with pytest.raises(ev.Revert, match=err):
        _wd(d, variant, amount=contract.MAX_TRANSACTION_AMOUNT + 1)


@pytest.mark.parametrize("variant", VARIANTS)
def test_withdraw_fee_not_lower_than_amount(variant):
    d = _suite()
    _na(d, variant)
    with pytest.raises(ev.Revert, match="FeeHigherThanAmount"):
        _wd(d, variant, amount=100, relayer_fee=100)


@pytest.mark.parametrize("action", [_dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_nonexistent_merkle_root(action, variant):
    d = _suite()
    _na(d, variant)
    with pytest.raises(ev.Revert, match="MerkleRootDoesNotExist"):
        action(d, variant, merkle_root=0xDEAD)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_duplicated_nullifier(action, variant):
    d = _suite()
    _na(d, variant, note=111)
    if action is _na:
        with pytest.raises(ev.Revert, match="DuplicatedNullifier"):
            _na(d, variant, note=999, prenullifier=hash_ints([111]))
    else:
        action(d, variant, nul=777)
        with pytest.raises(ev.Revert, match="DuplicatedNullifier"):
            action(d, variant, note=998, nul=777)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_not_a_field_element(action, variant):
    d = _suite()
    _na(d, variant)
    with pytest.raises(ev.Revert, match="NotAFieldElement"):
        action(d, variant, new_note=P)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_verification_failure(action, variant):
    d = _suite()
    _na(d, variant)
    with pytest.raises(ev.Revert, match="VerificationFailed"):
        action(d, variant, note=987, proof=b"bogus")


@pytest.mark.parametrize("variant", VARIANTS)
def test_contract_balance_cap(variant):
    d = _suite()
    with pytest.raises(ev.Revert, match="ContractBalanceLimitReached"):
        _na(d, variant, amount=contract.MAX_CONTRACT_BALANCE + 1)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
def test_paused(action):
    d = _suite()
    _na(d)
    with pytest.raises(ev.Revert, match="OwnableUnauthorizedAccount"):
        d.runner.call(d.shielder_address, "pause", caller=0xDEAD)
    d.runner.call(d.shielder_address, "pause", caller=deploy.OWNER_ADDRESS)
    with pytest.raises(ev.Revert, match="EnforcedPause"):
        action(d)
    d.runner.call(d.shielder_address, "unpause", caller=deploy.OWNER_ADDRESS)
    action(d, note=4242, nul=4243)  # resumes with fresh ids


def test_erc20_transfer_failure_reverts_atomically():
    """Caller without token balance: SafeERC20 revert and the WHOLE
    transaction rolls back — no note, no nullifier, no logs."""
    d = _suite()
    with pytest.raises(ev.Revert, match="SafeERC20FailedOperation"):
        _na(d, "erc20", caller=0xDEAD)
    assert d.runner.call(d.tree_address, "leafCount").output == 0
    assert d.shielder.storage["nullifierBlocks"] == {}
    assert d.shielder.logs == []


def test_native_transfer_failure_to_reverting_recipient():
    """REVERTING_ADDRESS recipient: the send fails, tx rolls back
    (deploy.rs:62-65 fault injection)."""
    d = _suite()
    _na(d, amount=10_000)
    leaf_before = d.runner.call(d.tree_address, "leafCount").output
    with pytest.raises(ev.Revert, match="NativeTransferFailed"):
        _wd(d, amount=3_000, withdrawal_address=ev.REVERTING_ADDRESS)
    assert d.runner.call(d.tree_address, "leafCount").output == leaf_before
    assert d.runner.balances.get(ev.REVERTING_ADDRESS, 0) == 0


def test_withdraw_erc20_pocket_money():
    d = _suite()
    _na(d, "erc20")
    _wd(d, "erc20", msg_value=77)
    assert d.runner.balances[TO] == 77


def test_protocol_fees_accrue():
    d = _suite(deposit_fee_bps=100, withdraw_fee_bps=50)
    _na(d, amount=10_000)
    fee_na = contract.consts.protocol_fee_from_gross(10_000, 100)
    assert d.runner.balances[FEE_RECV] == fee_na
    _wd(d, amount=3_000)
    fee_wd = contract.consts.protocol_fee_from_gross(3_000, 50)
    assert d.runner.balances[FEE_RECV] == fee_na + fee_wd
    assert d.runner.balances[TO] == 3_000 - fee_wd - 100


def test_ar_pubkey_on_curve_gate():
    """AnonymityRevoker.sol:38-59: off-curve keys rejected at set-time."""
    with pytest.raises(ev.Revert, match="AnonymityRevokerPubkeyNotOnCurve"):
        deploy.deploy_suite_sol(ar_pubkey=(1, 2), tree_height=3)
    d = _suite()
    with pytest.raises(ev.Revert, match="AnonymityRevokerPubkeyNotOnCurve"):
        d.runner.call(d.shielder_address, "setAnonymityRevoker", 1, 2,
                      caller=deploy.OWNER_ADDRESS)
    with pytest.raises(ev.Revert, match="OwnableUnauthorizedAccount"):
        d.runner.call(d.shielder_address, "setAnonymityRevoker",
                      GRUMPKIN_GEN[0], GRUMPKIN_GEN[1], caller=0xDEAD)


def test_nullifier_registry_block_numbers():
    """Nullifiers.sol:48-58: registry stores arbBlockNumber()+1 so zero
    means unseen; dry-run leaves no trace."""
    d = _suite()
    h = hash_ints([111])
    assert d.runner.call(d.shielder_address, "nullifiers", h).output == 0
    d.runner.dry_run(d.shielder_address, "newAccountNative", VERSION, 111,
                     h, 1, 1, 2, 2, 1, 2, b"ok", b"",
                     caller=CALLER, value=100)
    assert d.runner.call(d.shielder_address, "nullifiers", h).output == 0
    _na(d, note=111)
    assert d.runner.call(d.shielder_address, "nullifiers", h).output > 0


def test_gas_in_reference_regime():
    """Stub verifiers meter the reference's verification gas, tree
    inserts meter per-level Poseidon2; totals must sit in the regime the
    reference's gas-consumption bin measures (not a 10% gate — the
    interpreter approximates overhead — but order-correct)."""
    d = _suite()
    g_na = _na(d).gas_used
    g_dep = _dep(d).gas_used
    g_wd = _wd(d).gas_used
    assert contract.GAS_VERIFY["new_account"] < g_na < 1_500_000
    assert contract.GAS_VERIFY["deposit"] < g_dep < 1_700_000
    assert contract.GAS_VERIFY["withdraw"] < g_wd < 1_900_000


def test_agrees_with_sim_oracle():
    """Interpreted contracts and the Python state machine agree on a
    mixed lifecycle: roots, balances, nullifier registry."""
    d = _suite()
    sim = contract.ShielderSim(
        verify_new_account=lambda p, _: p == b"ok",
        verify_deposit=lambda p, _: p == b"ok",
        verify_withdraw=lambda p, _: p == b"ok",
        ar_pubkey=GRUMPKIN_GEN, tree_height=3)
    _na(d, note=11)
    sim.new_account_native(expected_version=VERSION, caller=CALLER,
                           amount=10_000, new_note=11,
                           prenullifier=hash_ints([11]), sym_c1=(1, 1),
                           sym_c2=(2, 2), mac_salt=1, mac_commitment=2,
                           proof=b"ok")
    assert _root(d) == sim.tree.root
    _dep(d, note=22, nul=33, amount=4_000)
    sim.deposit_native(expected_version=VERSION, caller=CALLER, amount=4_000,
                       old_nullifier_hash=hash_ints([33]), new_note=22,
                       merkle_root=sim.get_merkle_path(0)[-1], mac_salt=1,
                       mac_commitment=2, proof=b"ok")
    assert _root(d) == sim.tree.root
    _wd(d, note=44, nul=55, amount=2_000, relayer_fee=70)
    sim.withdraw_native(expected_version=VERSION, amount=2_000,
                        withdrawal_address=TO,
                        merkle_root=sim.get_merkle_path(1)[-1],
                        old_nullifier_hash=hash_ints([55]), new_note=44,
                        proof=b"ok", relayer_address=RELAYER, relayer_fee=70,
                        mac_salt=1, mac_commitment=2)
    assert _root(d) == sim.tree.root
    assert d.runner.balances[TO] == sim.balances[TO]
    assert d.runner.balances[RELAYER] == sim.balances[RELAYER]


# --- committed artifacts + real proof through the interpreted stack ---------

def test_committed_contract_artifacts_match_emitter():
    """artifacts/Shielder.sol + MerkleTree.sol are exactly what the
    emitter renders (regeneration is deterministic)."""
    from zkos_tpu.proof import contracts_sol

    art = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")
    sh_path = os.path.join(art, "Shielder.sol")
    mt_path = os.path.join(art, "MerkleTree.sol")
    if not os.path.exists(sh_path):
        pytest.skip("contract artifacts not generated")
    assert open(sh_path).read() == contracts_sol.render_shielder()
    assert open(mt_path).read() == contracts_sol.render_merkle_tree()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(deploy.ART, "deposit_pk.bin")),
    reason="pronto key artifacts not generated")
def test_real_proof_through_interpreted_contract_stack():
    """The summit of the contract plane: a REAL deposit proof (committed
    pronto pk) verified by the INTERPRETED DepositVerifier.sol called
    from the INTERPRETED Shielder.sol on the runner — contract text and
    verifier text both executing, as in the reference's revm loop."""
    import json
    import random

    from zkos_tpu.models import shielder as sh
    from zkos_tpu.protocol import notes, secrets
    from zkos_tpu.proof import plonk, serialize, srs as srs_mod
    from zkos_tpu.srv import sol_interp

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
        commitment=contract.deposit_commitment(CALLER, 0),
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

    vsol = sol_interp.load(os.path.join(deploy.ART, "DepositVerifier.sol"))
    d = deploy.deploy_suite_sol(
        ar_pubkey=GRUMPKIN_GEN,
        verifiers={"newaccount": deploy.StubVerifier("new_account"),
                   "deposit": vsol,
                   "withdraw": deploy.StubVerifier("withdraw")})
    # mirror the prover's height-13 tree into the interpreted tree storage
    d.tree.storage["notes"] = dict(tree.notes)
    d.tree.storage["currentRoot"] = tree.root
    d.tree.storage["rootHistory"] = {tree.root: 1}
    d.tree.storage["nextFreeLeafId"] = tree.next_free_leaf_id
    d.runner.fund(d.shielder_address, 100)

    # (negative cases first: the nullifier must still be unspent)
    # corrupted proof byte -> the verifier library itself REVERTS on the
    # on-curve check and the revert bubbles up the tx, exactly like the
    # reference's library call (verifier.rs corrupted-proof case)
    bad = bytearray(proof)
    bad[9] ^= 1
    with pytest.raises(ev.Revert, match="verifyProof reverted"):
        d.runner.call(
            d.shielder_address, "depositNative", VERSION, pub[1],
            pub[2], pub[0], pub[6], pub[7], bytes(bad), b"",
            caller=CALLER, value=pub[3])
    # falsifying public input (wrong note) -> verifier runs to completion,
    # returns false -> DepositVerificationFailed custom error
    with pytest.raises(ev.Revert, match="DepositVerificationFailed"):
        d.runner.call(
            d.shielder_address, "depositNative", VERSION, pub[1],
            pub[2] ^ 1, pub[0], pub[6], pub[7], proof, b"",
            caller=CALLER, value=pub[3])

    res = d.runner.call(
        d.shielder_address, "depositNative", VERSION, pub[1], pub[2],
        pub[0], pub[6], pub[7], proof, b"",
        caller=CALLER, value=pub[3])
    assert res.output == 1  # second leaf
    assert res.gas_used > 800_000  # includes the interpreted verifier
