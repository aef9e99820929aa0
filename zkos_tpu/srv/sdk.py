"""High-level client SDK: storage schema, state sync, callbacks.

The reference's TS SDK (ts/shielder-sdk) adds a client plane above the
CLI wallet: pluggable storage with a versioned schema
(storage/storageSchema.ts, schema version 2 at src/constants.ts:9),
account discovery + state synchronization from chain events
(state/sync/{synchronizer,tokenAccountFinder,chainStateTransition}.ts),
and per-action callbacks (ShielderCallbacks: calldata generated/sent,
new transaction synced, stage-tagged errors).  This module is that
plane over this repo's primitives: ``ShielderSim`` is the chain,
``protocol.secrets`` derives ids, and the nullifier-block index makes
sync O(actions) exactly like the reference
(shielder-contract/src/recovery.rs:20-58).
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field as dc_field
from typing import Callable

from ..ops.poseidon2 import hash_ints
from ..protocol import consts, contract, notes, secrets
from . import client as cl

STORAGE_SCHEMA_VERSION = 2  # ts/shielder-sdk/src/constants.ts:9
STORAGE_KEY = "__shielder_storage__"
FIRST_ACCOUNT_INDEX = 0


class StorageError(Exception):
    """Malformed or unmigratable stored state."""


# ---------------------------------------------------------------------------
# storage backends (InjectedStorageInterface analog)
# ---------------------------------------------------------------------------

class InMemoryStorage:
    def __init__(self):
        self._d: dict[str, str] = {}

    def get_item(self, key: str) -> str | None:
        return self._d.get(key)

    def set_item(self, key: str, value: str) -> None:
        self._d[key] = value


class FileStorage:
    """One JSON file per key under a directory."""

    def __init__(self, directory: str):
        import os

        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, key: str) -> str:
        import os

        return os.path.join(self.dir, key + ".json")

    def get_item(self, key: str) -> str | None:
        try:
            with open(self._path(key)) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def set_item(self, key: str, value: str) -> None:
        with open(self._path(key), "w") as f:
            f.write(value)


# ---------------------------------------------------------------------------
# schema (storageSchema.ts analog)
# ---------------------------------------------------------------------------

@dataclass
class AccountObject:
    """Per-account stored state (accountObjectSchema)."""

    nonce: int
    balance: int
    id_hash: int
    current_note: int
    current_note_index: int
    token_address: int

    def to_json(self) -> dict:
        # bigints as strings, like the TS schema's bigint transform
        return {k: str(v) for k, v in vars(self).items()}

    @classmethod
    def from_json(cls, obj: dict) -> "AccountObject":
        try:
            return cls(**{k: int(obj[k]) for k in
                          ("nonce", "balance", "id_hash", "current_note",
                           "current_note_index", "token_address")})
        except (KeyError, ValueError) as e:
            raise StorageError(f"invalid account object: {e}") from e


class StorageManager:
    """Versioned storage object: accounts map + next index + version."""

    def __init__(self, injected):
        self.storage = injected

    def load(self) -> dict:
        raw = self.storage.get_item(STORAGE_KEY)
        if raw is None:
            return {"accounts": {}, "next_account_index":
                    FIRST_ACCOUNT_INDEX,
                    "storage_schema_version": STORAGE_SCHEMA_VERSION}
        try:
            obj = json.loads(raw)
        except json.JSONDecodeError as e:
            raise StorageError(f"corrupt storage: {e}") from e
        obj = self._migrate(obj)
        obj["accounts"] = {k: AccountObject.from_json(v) if
                           isinstance(v, dict) else v
                           for k, v in obj["accounts"].items()}
        return obj

    def save(self, obj: dict) -> None:
        out = {
            "accounts": {k: (v.to_json() if isinstance(v, AccountObject)
                             else v) for k, v in obj["accounts"].items()},
            "next_account_index": obj["next_account_index"],
            "storage_schema_version": STORAGE_SCHEMA_VERSION,
        }
        self.storage.set_item(STORAGE_KEY, json.dumps(out))

    @staticmethod
    def _migrate(obj: dict) -> dict:
        """v1 -> v2: v1 stored a single native account un-keyed by token
        (the reference bumped the schema when multi-token landed)."""
        version = obj.get("storage_schema_version")
        if version == STORAGE_SCHEMA_VERSION:
            return obj
        if version == 1:
            acct = obj.get("account")
            accounts = {}
            if acct is not None:
                acct = dict(acct)
                acct.setdefault("token_address",
                                str(consts.NATIVE_TOKEN_ADDRESS))
                accounts["0"] = acct
            return {"accounts": accounts,
                    "next_account_index": len(accounts),
                    "storage_schema_version": STORAGE_SCHEMA_VERSION}
        raise StorageError(f"unknown storage schema version {version!r}")


# ---------------------------------------------------------------------------
# callbacks (ShielderCallbacks analog)
# ---------------------------------------------------------------------------

@dataclass
class ShielderCallbacks:
    on_calldata_generated: Callable | None = None
    on_calldata_sent: Callable | None = None
    on_new_transaction: Callable | None = None
    on_error: Callable | None = None  # (error, stage, operation)

    def emit(self, name: str, *args) -> None:
        fn = getattr(self, name)
        if fn is not None:
            fn(*args)


# ---------------------------------------------------------------------------
# id management + account discovery (idManager.ts, tokenAccountFinder.ts)
# ---------------------------------------------------------------------------

class IdManager:
    """Derives the account id for each account index from the user key
    (idManager.ts; secrets.rs derive_id(pk, chain_id, nonce))."""

    def __init__(self, private_key: int, chain_id: int):
        self.private_key = private_key
        self.chain_id = chain_id

    def get_id(self, account_index: int) -> int:
        return secrets.derive_id(self.private_key, self.chain_id,
                                 account_index)


class TokenAccountFinder:
    """Discover whether account #index exists on-chain and its token:
    prenullifier = hash(id); its nullifier-block reveals the NewAccount
    event (tokenAccountFinder.ts:17-40)."""

    def __init__(self, sim: contract.ShielderSim, id_manager: IdManager):
        self.sim = sim
        self.ids = id_manager

    def find_token_by_account_index(self, account_index: int) -> int | None:
        pren = hash_ints([self.ids.get_id(account_index)])
        block = self.sim.nullifier_block(pren)
        if block == 0:
            return None
        event = cl._find_event(self.sim, block)
        return event.get("token", consts.NATIVE_TOKEN_ADDRESS)


# ---------------------------------------------------------------------------
# synchronizer (state/sync/synchronizer.ts)
# ---------------------------------------------------------------------------

@dataclass
class ShielderTransaction:
    """The synced-transaction shape emitted to callbacks."""

    kind: str
    amount: int
    token_address: int
    note_index: int
    block: int
    protocol_fee: int = 0


class StateSynchronizer:
    """Walks the nullifier chain per account and folds new events into
    stored AccountObjects, emitting each new transaction once."""

    def __init__(self, sim: contract.ShielderSim, storage: StorageManager,
                 id_manager: IdManager,
                 callbacks: ShielderCallbacks | None = None):
        self.sim = sim
        self.storage = storage
        self.ids = id_manager
        self.finder = TokenAccountFinder(sim, id_manager)
        self.callbacks = callbacks or ShielderCallbacks()
        self._lock = threading.Lock()  # single-flight, like the Mutex

    def sync_all_accounts(self) -> list[ShielderTransaction]:
        """Discover + sync accounts from FIRST_ACCOUNT_INDEX upward until
        one does not exist on-chain (synchronizer.ts:29-44)."""
        out = []
        idx = FIRST_ACCOUNT_INDEX
        while True:
            obj = self.storage.load()
            known = obj["accounts"].get(str(idx))
            if known is None and \
                    self.finder.find_token_by_account_index(idx) is None:
                break
            out.extend(self.sync_single_account(idx))
            idx += 1
        return out

    def sync_single_account(self, account_index: int) \
            -> list[ShielderTransaction]:
        with self._lock:
            return self._sync_locked(account_index)

    def _sync_locked(self, account_index: int) -> list[ShielderTransaction]:
        obj = self.storage.load()
        id_ = self.ids.get_id(account_index)
        key = str(account_index)
        acct = obj["accounts"].get(key)
        if acct is None:
            acct = AccountObject(
                nonce=0, balance=0, id_hash=hash_ints([id_]),
                current_note=0, current_note_index=-1,
                token_address=consts.NATIVE_TOKEN_ADDRESS)
        new_txs: list[ShielderTransaction] = []
        while True:
            h = cl.expected_nullifier_hash(id_, acct.nonce)
            block = self.sim.nullifier_block(h)
            if block == 0:
                break
            event = cl._find_event(self.sim, block)
            tx = ShielderTransaction(
                kind=event["kind"], amount=event["amount"],
                token_address=event.get("token",
                                        consts.NATIVE_TOKEN_ADDRESS),
                note_index=event["index"], block=block,
                protocol_fee=event.get("protocol_fee", 0))
            # chain state transition (chainStateTransition.ts): balances
            # move by the event amount net of fees
            if tx.kind.startswith("Withdraw"):
                acct.balance -= tx.amount
            else:
                acct.balance += tx.amount - tx.protocol_fee
            acct.nonce += 1
            acct.current_note = event["note"]
            acct.current_note_index = event["index"]
            acct.token_address = tx.token_address
            new_txs.append(tx)
            self.callbacks.emit("on_new_transaction", tx)
        obj["accounts"][key] = acct
        obj["next_account_index"] = max(obj["next_account_index"],
                                        account_index + 1)
        self.storage.save(obj)
        return new_txs


# ---------------------------------------------------------------------------
# client facade (client/client.ts)
# ---------------------------------------------------------------------------

class ShielderClient:
    """shield / withdraw / sync with callbacks and stored state.

    Calldata generation is injected (the CryptoClient boundary,
    ts/shielder-sdk-crypto cryptoClient.ts:68-76): ``prove_new_account``
    / ``prove_deposit`` / ``prove_withdraw`` return the proof bytes the
    contract verifies.  Tests inject stubs; production wires
    ``zkos_tpu.bindings`` Circuits here.
    """

    def __init__(self, sim: contract.ShielderSim, private_key: int,
                 storage=None, callbacks: ShielderCallbacks | None = None,
                 prove_new_account=None, prove_deposit=None,
                 prove_withdraw=None, caller: int = 0xCA11):
        self.sim = sim
        self.caller = caller
        self.callbacks = callbacks or ShielderCallbacks()
        self.storage = StorageManager(storage or InMemoryStorage())
        self.ids = IdManager(private_key, sim.chain_id)
        self.sync_ = StateSynchronizer(sim, self.storage, self.ids,
                                       self.callbacks)
        self._prove = {"new_account": prove_new_account or
                       (lambda **kw: b"ok"),
                       "deposit": prove_deposit or (lambda **kw: b"ok"),
                       "withdraw": prove_withdraw or (lambda **kw: b"ok")}

    # -- actions --

    def shield(self, amount: int, account_index: int = 0,
               memo: bytes = b"") -> int:
        """newAccount when the account has no on-chain note yet, deposit
        otherwise (client.ts shield routing)."""
        acct = self.storage.load()["accounts"].get(str(account_index))
        id_ = self.ids.get_id(account_index)
        try:
            if acct is None or acct.nonce == 0:
                # real note semantics (protocol.notes; account lib.rs:95-107)
                note = notes.make_note(
                    id_, secrets.derive_nullifier(id_, 0), amount)
                calldata = dict(
                    expected_version=contract.CONTRACT_VERSION,
                    caller=self.caller, amount=amount, new_note=note,
                    prenullifier=hash_ints([id_]), sym_c1=(1, 1),
                    sym_c2=(2, 2), mac_salt=1, mac_commitment=2, memo=memo,
                    proof=self._prove["new_account"](id=id_, amount=amount))
                self.callbacks.emit("on_calldata_generated", "new_account",
                                    calldata)
                idx = self.sim.new_account_native(**calldata)
                self.callbacks.emit("on_calldata_sent", "new_account", idx)
            else:
                nul = secrets.derive_nullifier(id_, acct.nonce - 1)
                note = notes.make_note(
                    id_, secrets.derive_nullifier(id_, acct.nonce),
                    acct.balance + amount)
                calldata = dict(
                    expected_version=contract.CONTRACT_VERSION,
                    caller=self.caller, amount=amount,
                    old_nullifier_hash=hash_ints([nul]), new_note=note,
                    merkle_root=self.sim.get_merkle_path(
                        acct.current_note_index)[-1],
                    mac_salt=1, mac_commitment=2, memo=memo,
                    proof=self._prove["deposit"](id=id_, amount=amount))
                self.callbacks.emit("on_calldata_generated", "deposit",
                                    calldata)
                idx = self.sim.deposit_native(**calldata)
                self.callbacks.emit("on_calldata_sent", "deposit", idx)
        except Exception as e:
            self.callbacks.emit("on_error", e, "generation", "shield")
            raise
        self.sync_.sync_single_account(account_index)
        return idx

    def withdraw(self, amount: int, to: int, relayer: int,
                 relayer_fee: int, account_index: int = 0,
                 memo: bytes = b"") -> int:
        acct = self.storage.load()["accounts"][str(account_index)]
        id_ = self.ids.get_id(account_index)
        try:
            nul = secrets.derive_nullifier(id_, acct.nonce - 1)
            note = notes.make_note(
                id_, secrets.derive_nullifier(id_, acct.nonce),
                acct.balance - amount)
            calldata = dict(
                expected_version=contract.CONTRACT_VERSION, amount=amount,
                withdrawal_address=to,
                merkle_root=self.sim.get_merkle_path(
                    acct.current_note_index)[-1],
                old_nullifier_hash=hash_ints([nul]), new_note=note,
                relayer_address=relayer, relayer_fee=relayer_fee,
                mac_salt=1, mac_commitment=2, memo=memo,
                proof=self._prove["withdraw"](id=id_, amount=amount))
            self.callbacks.emit("on_calldata_generated", "withdraw",
                                calldata)
            idx = self.sim.withdraw_native(**calldata)
            self.callbacks.emit("on_calldata_sent", "withdraw", idx)
        except Exception as e:
            self.callbacks.emit("on_error", e, "generation", "withdraw")
            raise
        self.sync_.sync_single_account(account_index)
        return idx

    def sync_shielder(self) -> list[ShielderTransaction]:
        try:
            return self.sync_.sync_all_accounts()
        except Exception as e:
            self.callbacks.emit("on_error", e, "syncing", "sync")
            raise

    def account_state(self, account_index: int = 0) -> AccountObject | None:
        return self.storage.load()["accounts"].get(str(account_index))
