"""Client wallet: account ops + encrypted state file + chain recovery.

Mirrors crates/shielder-cli: encrypted state persistence
(state_file.rs via content-encryption), new-account/deposit/withdraw
drivers (shielder_ops/*), and state recovery by walking the nullifier chain
against the contract's registry (recovery.rs:10-38 — for each nonce, the
expected nullifier hash is Poseidon2 hash::<1>(derive_nullifier(id, nonce));
a hit means the action landed on-chain, O(actions) total).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ..ops.poseidon2 import hash_ints
from ..protocol import consts, contract, secrets
from ..protocol.account import ShielderAccount, ShielderAction
from . import content_encryption as ce


@dataclass
class ClientState:
    account: ShielderAccount

    def to_json(self) -> bytes:
        return json.dumps({
            "id": self.account.id,
            "token_address": self.account.token_address,
            "nonce": self.account.nonce,
            "shielded_amount": self.account.shielded_amount,
            "history": [vars(a) | {"tx_hash": a.tx_hash.hex()}
                        for a in self.account.history],
        }).encode()

    @classmethod
    def from_json(cls, data: bytes) -> "ClientState":
        obj = json.loads(data)
        acc = ShielderAccount(
            id=obj["id"], token_address=obj["token_address"],
            nonce=obj["nonce"], shielded_amount=obj["shielded_amount"])
        for a in obj["history"]:
            acc.history.append(ShielderAction(
                kind=a["kind"], amount=a["amount"],
                protocol_fee=a["protocol_fee"], note_index=a["note_index"],
                token_address=a["token_address"],
                tx_hash=bytes.fromhex(a["tx_hash"]), block=a["block"]))
        return cls(account=acc)

    def save(self, path: str, password: bytes):
        with open(path, "wb") as f:
            f.write(ce.encrypt(self.to_json(), password))

    @classmethod
    def load(cls, path: str, password: bytes) -> "ClientState":
        with open(path, "rb") as f:
            return cls.from_json(ce.decrypt(f.read(), password))


def expected_nullifier_hash(id_: int, nonce: int) -> int:
    """hash::<1> of the nonce-th nullifier (recovery.rs:31; prenullifier =
    the id itself for nonce 0, shielder-account lib.rs:110-121)."""
    if nonce == 0:
        return hash_ints([id_])
    return hash_ints([secrets.derive_nullifier(id_, nonce - 1)])


def recover_state(id_: int, sim: contract.ShielderSim,
                  token_address: int = consts.NATIVE_TOKEN_ADDRESS,
                  max_actions: int = 10_000) -> ShielderAccount:
    """Rebuild an account from the chain alone (recovery.rs:10-38).

    Walks nonces until the expected nullifier hash is unregistered; each hit
    is matched to the corresponding event for amounts (the reference decodes
    the registering tx, shielder-contract recovery.rs:90-145 — the sim keeps
    an event log instead).
    """
    acc = ShielderAccount(id=id_, token_address=token_address)
    for nonce in range(max_actions):
        h = expected_nullifier_hash(id_, nonce + 1 - 1)  # action at this nonce
        block = sim.nullifier_block(h)
        if block == 0:
            break
        event = _find_event(sim, block)
        acc.register_action(ShielderAction(
            kind={"NewAccount": "new_account", "Deposit": "deposit",
                  "Withdraw": "withdraw", "NewAccountERC20": "new_account",
                  "DepositERC20": "deposit",
                  "WithdrawERC20": "withdraw"}[event["kind"]],
            amount=event["amount"], protocol_fee=event["protocol_fee"],
            note_index=event["index"], token_address=token_address,
            block=block))
    return acc


def _find_event(sim: contract.ShielderSim, block: int):
    # nullifier registered at action k stores block k+1 in order; events
    # append in the same order
    return sim.events[block - 2]
