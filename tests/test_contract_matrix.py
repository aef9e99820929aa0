"""Contract behavior matrix: the integration-tests negative-case analog.

Mirrors the reference's ~36 rstest cases across
{newAccount, deposit, withdraw} x {Native, ERC20}
(crates/integration-tests/src/shielder/calls/*.rs): success, wrong version,
zero/too-high amounts, fee >= amount, nonexistent merkle root, double-spend
nullifier, non-field inputs, verification failure, balance caps, pause,
token transfer failure, pocket money, protocol fees, and gas regression.
Verifiers are stubbed (accept iff proof == b"ok") — these cases exercise
the contract checks, which all fire independently of proof validity; the
real-prover positive/negative paths live in test_integration.py.
"""

import pytest

from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.protocol import contract

P = contract.P
VERSION = contract.CONTRACT_VERSION
OK = lambda proof, pub: proof == b"ok"
TOKEN = 0x7C57
CALLER = 0xAA
RELAYER = 0xCC
TO = 0xBB


def _sim(**kw):
    sim = contract.ShielderSim(
        verify_new_account=OK, verify_deposit=OK, verify_withdraw=OK,
        ar_pubkey=(1, 2), tree_height=3, **kw)
    sim.erc20_mint(TOKEN, CALLER, 10**9)
    return sim


def _na(sim, variant="native", note=111, **over):
    kw = dict(expected_version=VERSION, caller=CALLER, amount=10_000,
              new_note=note, prenullifier=hash_ints([note]), sym_c1=(1, 1),
              sym_c2=(2, 2), mac_salt=1, mac_commitment=2, proof=b"ok")
    kw.update(over)
    if variant == "erc20":
        kw.setdefault("token_address", TOKEN)
        return sim.new_account_erc20(**kw)
    return sim.new_account_native(**kw)


def _dep(sim, variant="native", note=222, nul=333, **over):
    kw = dict(expected_version=VERSION, caller=CALLER, amount=5_000,
              old_nullifier_hash=hash_ints([nul]), new_note=note,
              merkle_root=sim.get_merkle_path(0)[-1], mac_salt=1,
              mac_commitment=2, proof=b"ok")
    kw.update(over)
    if variant == "erc20":
        kw.setdefault("token_address", TOKEN)
        return sim.deposit_erc20(**kw)
    return sim.deposit_native(**kw)


def _wd(sim, variant="native", note=444, nul=555, **over):
    kw = dict(expected_version=VERSION, amount=3_000, withdrawal_address=TO,
              merkle_root=sim.get_merkle_path(0)[-1],
              old_nullifier_hash=hash_ints([nul]), new_note=note,
              proof=b"ok", relayer_address=RELAYER, relayer_fee=100,
              mac_salt=1, mac_commitment=2)
    kw.update(over)
    if variant == "erc20":
        kw.setdefault("token_address", TOKEN)
        return sim.withdraw_erc20(**kw)
    return sim.withdraw_native(**kw)


VARIANTS = ["native", "erc20"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_lifecycle_succeeds(variant):
    sim = _sim()
    _na(sim, variant)
    _dep(sim, variant)
    _wd(sim, variant)
    if variant == "native":
        assert sim.balances[TO] == 2_900
    else:
        assert sim.erc20_balance_of(TOKEN, TO) == 2_900


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_wrong_version(action, variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="WrongContractVersion"):
        action(sim, variant, expected_version=0x000102)


@pytest.mark.parametrize("action", [_dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_zero_amount(action, variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="ZeroAmount"):
        action(sim, variant, amount=0)


@pytest.mark.parametrize("variant", VARIANTS)
def test_withdraw_amount_too_high(variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="AmountTooHigh"):
        _wd(sim, variant, amount=contract.MAX_TRANSACTION_AMOUNT + 1)


@pytest.mark.parametrize("variant", VARIANTS)
def test_withdraw_fee_not_lower_than_amount(variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="FeeHigherThanAmount"):
        _wd(sim, variant, amount=100, relayer_fee=100)


@pytest.mark.parametrize("action", [_dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_nonexistent_merkle_root(action, variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="MerkleRootDoesNotExist"):
        action(sim, variant, merkle_root=0xDEAD)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_duplicated_nullifier(action, variant):
    sim = _sim()
    _na(sim, variant, note=111)
    if action is _na:
        with pytest.raises(contract.ShielderError, match="DuplicatedNullifier"):
            _na(sim, variant, note=999, prenullifier=hash_ints([111]))
    else:
        action(sim, variant, nul=777)
        with pytest.raises(contract.ShielderError, match="DuplicatedNullifier"):
            action(sim, variant, note=998, nul=777)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_not_a_field_element(action, variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="NotAFieldElement"):
        action(sim, variant, new_note=P)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
@pytest.mark.parametrize("variant", VARIANTS)
def test_verification_failure(action, variant):
    sim = _sim()
    _na(sim, variant)
    with pytest.raises(contract.ShielderError, match="VerificationFailed"):
        action(sim, variant, note=987, proof=b"bogus")


@pytest.mark.parametrize("variant", VARIANTS)
def test_contract_balance_cap(variant):
    sim = _sim()
    with pytest.raises(contract.ShielderError,
                       match="ContractBalanceLimitReached"):
        _na(sim, variant, amount=contract.MAX_CONTRACT_BALANCE + 1)


@pytest.mark.parametrize("action", [_na, _dep, _wd])
def test_paused(action):
    sim = _sim()
    _na(sim)
    sim.paused = True
    with pytest.raises(contract.ShielderError, match="EnforcedPause"):
        action(sim)


def test_erc20_transfer_failure_reverts():
    """Caller without token balance: SafeERC20 revert, no state change."""
    sim = _sim()
    with pytest.raises(contract.ShielderError,
                       match="SafeERC20FailedOperation"):
        _na(sim, "erc20", caller=0xDEAD)  # 0xDEAD holds no tokens
    assert len(sim.tree) == 0 and not sim.nullifiers


def test_native_transfer_failure():
    """Withdrawing more than the contract holds reverts."""
    sim = _sim()
    _na(sim, amount=1_000)
    with pytest.raises(contract.ShielderError, match="NativeTransferFailed"):
        _wd(sim, amount=5_000)


def test_withdraw_erc20_pocket_money():
    sim = _sim()
    _na(sim, "erc20")
    _wd(sim, "erc20", msg_value=77)
    assert sim.balances[TO] == 77


def test_protocol_fees_accrue():
    sim = _sim(deposit_fee_bps=100, withdraw_fee_bps=50)
    _na(sim, amount=10_000)
    fee_na = contract.consts.protocol_fee_from_gross(10_000, 100)
    assert sim.balances[sim.protocol_fee_receiver] == fee_na
    _wd(sim, amount=3_000)
    fee_wd = contract.consts.protocol_fee_from_gross(3_000, 50)
    assert sim.balances[sim.protocol_fee_receiver] == fee_na + fee_wd
    assert sim.balances[TO] == 3_000 - fee_wd - 100


def test_gas_regression_matrix():
    """Per-action gas stays within 110% of the reference-anchored model
    (the CI gas-regression gate, _measure-gas-and-contract-size.yml)."""
    from zkos_tpu.srv.tools import gas_consumption_report

    def factory():
        return _sim()

    report = gas_consumption_report(factory, [
        ("new_account_native", "new_account_native", lambda s: dict(
            expected_version=VERSION, caller=CALLER, amount=10_000,
            new_note=111, prenullifier=hash_ints([111]), sym_c1=(1, 1),
            sym_c2=(2, 2), mac_salt=1, mac_commitment=2, proof=b"ok")),
        ("deposit_native", "deposit_native", lambda s: dict(
            expected_version=VERSION, caller=CALLER, amount=500,
            old_nullifier_hash=hash_ints([9]), new_note=112,
            merkle_root=s.get_merkle_path(0)[-1], mac_salt=1,
            mac_commitment=2, proof=b"ok")),
        ("withdraw_native", "withdraw_native", lambda s: dict(
            expected_version=VERSION, amount=300, withdrawal_address=TO,
            merkle_root=s.get_merkle_path(0)[-1],
            old_nullifier_hash=hash_ints([10]), new_note=113, proof=b"ok",
            relayer_address=RELAYER, relayer_fee=10, mac_salt=1,
            mac_commitment=2)),
    ])
    # ceilings: verification gas + tree/storage/transfer model, +10%
    ceilings = {"new_account_native": 740_000, "deposit_native": 950_000,
                "withdraw_native": 1_060_000}
    for label, gas in report.items():
        assert contract.GAS_VERIFY[label.rsplit("_", 1)[0]
                                   .replace("new_account", "new_account")] \
            < gas <= ceilings[label] * 1.1, (label, gas)
