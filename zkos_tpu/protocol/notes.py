"""Notes: the commitment scheme binding an account state to a tree leaf.

``Note{version, id, nullifier, account_balance, token_address}`` hashed with
Poseidon2 — reference shape at crates/shielder-account/src/lib.rs:95-107
(note() builds the struct; ``note_hash`` itself lives in the non-vendored
shielder-circuits crate, SURVEY.md §2.1).  This framework defines
``note_hash`` as Poseidon2 ``hash::<5>`` over the fields in struct order — a
reconstructed (not bit-pinned) choice, consistent with the on-chain contract
which treats hNote as an opaque field element (contracts/Shielder.sol:346).

Nullifier hash (recovery + on-chain registry key) IS pinned:
``hash::<1>([nullifier])`` (crates/shielder-cli/src/recovery.rs:31).
MAC for anonymity revocation: ``hash::<2>([mac_salt, viewing_key])``
(crates/ar-cli/src/revoke.rs:33).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ops.poseidon2 import hash_ints
from . import consts


@dataclass(frozen=True)
class Note:
    version: int
    id: int
    nullifier: int
    account_balance: int
    token_address: int


def note_hash(note: Note) -> int:
    return hash_ints([note.version, note.id, note.nullifier,
                      note.account_balance, note.token_address])


def nullifier_hash(nullifier: int) -> int:
    """hash::<1>([nullifier]) — the on-chain Nullifiers registry key."""
    return hash_ints([nullifier])


def mac(mac_salt: int, viewing_key: int) -> int:
    """MAC commitment hash::<2>([mac_salt, viewing_key]) (ar-cli/revoke.rs:33)."""
    return hash_ints([mac_salt, viewing_key])


def make_note(id_: int, nullifier: int, balance: int,
              token_address: int = consts.NATIVE_TOKEN_ADDRESS) -> int:
    return note_hash(Note(
        version=consts.contract_version().note_version(),
        id=id_, nullifier=nullifier, account_balance=balance,
        token_address=token_address))
