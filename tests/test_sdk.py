"""SDK plane: storage schema, sync, callbacks (ts/shielder-sdk analog)."""

from zkos_tpu.ops.grumpkin_golden import GEN as GRUMPKIN_GEN
import json

import pytest

from zkos_tpu.protocol import consts, contract, secrets
from zkos_tpu.srv import sdk

OK = lambda proof, pub: proof == b"ok"  # noqa: E731
VERSION = contract.CONTRACT_VERSION
SK = 0xABCDEF


def _sim():
    return contract.ShielderSim(
        verify_new_account=OK, verify_deposit=OK, verify_withdraw=OK,
        ar_pubkey=GRUMPKIN_GEN, tree_height=3)


def _client(sim, storage=None, callbacks=None):
    return sdk.ShielderClient(sim, private_key=SK, storage=storage,
                              callbacks=callbacks)


def test_storage_schema_roundtrip_and_validation():
    st = sdk.StorageManager(sdk.InMemoryStorage())
    obj = st.load()
    assert obj["storage_schema_version"] == sdk.STORAGE_SCHEMA_VERSION
    obj["accounts"]["0"] = sdk.AccountObject(
        nonce=2, balance=5, id_hash=7, current_note=9,
        current_note_index=1, token_address=0)
    st.save(obj)
    loaded = st.load()
    assert loaded["accounts"]["0"] == obj["accounts"]["0"]
    # bigints persist as strings (the TS schema transform)
    raw = json.loads(st.storage.get_item(sdk.STORAGE_KEY))
    assert raw["accounts"]["0"]["balance"] == "5"
    # malformed account objects are rejected with a clear error
    raw["accounts"]["0"]["balance"] = "not-a-number"
    st.storage.set_item(sdk.STORAGE_KEY, json.dumps(raw))
    with pytest.raises(sdk.StorageError, match="invalid account"):
        st.load()


def test_storage_v1_migration():
    """v1 single-account layout migrates to the v2 accounts map."""
    inj = sdk.InMemoryStorage()
    inj.set_item(sdk.STORAGE_KEY, json.dumps({
        "storage_schema_version": 1,
        "account": {"nonce": "3", "balance": "100", "id_hash": "1",
                    "current_note": "2", "current_note_index": "0"}}))
    obj = sdk.StorageManager(inj).load()
    assert obj["storage_schema_version"] == 2
    acct = obj["accounts"]["0"]
    assert acct.nonce == 3 and acct.balance == 100
    assert acct.token_address == consts.NATIVE_TOKEN_ADDRESS
    # unknown versions are refused, not silently reinterpreted
    inj.set_item(sdk.STORAGE_KEY, json.dumps(
        {"storage_schema_version": 99, "accounts": {}}))
    with pytest.raises(sdk.StorageError, match="version"):
        sdk.StorageManager(inj).load()


def test_file_storage_backend(tmp_path):
    fs = sdk.FileStorage(str(tmp_path))
    assert fs.get_item("missing") is None
    fs.set_item("k", "v")
    assert fs.get_item("k") == "v"
    # a second manager over the same directory sees persisted state
    st = sdk.StorageManager(fs)
    obj = st.load()
    obj["accounts"]["0"] = sdk.AccountObject(1, 2, 3, 4, 5, 0)
    st.save(obj)
    assert sdk.StorageManager(sdk.FileStorage(str(tmp_path))).load()[
        "accounts"]["0"].balance == 2


def test_shield_routes_new_account_then_deposit_and_syncs():
    sim = _sim()
    events = []
    cbs = sdk.ShielderCallbacks(
        on_calldata_generated=lambda op, cd: events.append(("gen", op)),
        on_calldata_sent=lambda op, idx: events.append(("sent", op)),
        on_new_transaction=lambda tx: events.append(("tx", tx.kind)))
    c = _client(sim, callbacks=cbs)
    c.shield(10_000)
    c.shield(5_000)
    acct = c.account_state()
    assert acct.nonce == 2
    assert acct.balance == 15_000
    assert acct.current_note_index == 1
    assert events == [("gen", "new_account"), ("sent", "new_account"),
                      ("tx", "NewAccount"),
                      ("gen", "deposit"), ("sent", "deposit"),
                      ("tx", "Deposit")]


def test_withdraw_updates_balance_and_emits():
    sim = _sim()
    c = _client(sim)
    c.shield(10_000)
    c.withdraw(3_000, to=0xBB, relayer=0xCC, relayer_fee=50)
    acct = c.account_state()
    assert acct.nonce == 2 and acct.balance == 7_000
    assert sim.balances[0xBB] == 3_000 - 50


def test_sync_discovers_foreign_actions():
    """A fresh client (empty storage) reconstructs the account purely
    from chain events — the recovery path through the synchronizer."""
    sim = _sim()
    c1 = _client(sim)
    c1.shield(10_000)
    c1.shield(2_000)
    c1.withdraw(500, to=0xBB, relayer=0xCC, relayer_fee=5)

    seen = []
    cbs = sdk.ShielderCallbacks(
        on_new_transaction=lambda tx: seen.append(tx.kind))
    c2 = _client(sim, callbacks=cbs)  # same key, fresh storage
    txs = c2.sync_shielder()
    assert [t.kind for t in txs] == ["NewAccount", "Deposit", "Withdraw"]
    assert seen == ["NewAccount", "Deposit", "Withdraw"]
    assert c2.account_state().balance == 11_500
    assert c2.account_state().nonce == 3
    # a second sync finds nothing new (no duplicate emission)
    assert c2.sync_shielder() == []


def test_on_error_callback_fires_and_reraises():
    sim = _sim()
    errors = []
    cbs = sdk.ShielderCallbacks(
        on_error=lambda e, stage, op: errors.append((stage, op)))
    c = _client(sim, callbacks=cbs)
    c.shield(10_000)
    with pytest.raises(contract.ShielderError):
        c.withdraw(10**18, to=0xBB, relayer=0xCC, relayer_fee=5)  # too much
    assert errors == [("generation", "withdraw")]


def test_token_account_finder():
    sim = _sim()
    c = _client(sim)
    finder = sdk.TokenAccountFinder(sim, sdk.IdManager(SK, sim.chain_id))
    assert finder.find_token_by_account_index(0) is None
    c.shield(1_000)
    assert finder.find_token_by_account_index(0) == \
        consts.NATIVE_TOKEN_ADDRESS
    assert finder.find_token_by_account_index(1) is None
