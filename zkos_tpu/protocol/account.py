"""Client-side account state machine (id -> nullifier chain -> notes).

Mirrors ``ShielderAccount`` (crates/shielder-account/src/lib.rs:19-127):
the account id seeds a keccak nullifier chain; each action consumes the
previous nullifier and commits a new note over the running shielded balance;
the prenullifier of the very first action is the id itself (lib.rs:110-113).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from . import consts, notes, secrets


@dataclass
class ShielderAction:
    kind: str  # "new_account" | "deposit" | "withdraw"
    amount: int
    protocol_fee: int
    note_index: int
    token_address: int
    tx_hash: bytes = b""
    block: int = 0


@dataclass
class ShielderAccount:
    id: int
    token_address: int = consts.NATIVE_TOKEN_ADDRESS
    nonce: int = 0
    shielded_amount: int = 0
    history: list[ShielderAction] = dc_field(default_factory=list)

    @classmethod
    def new(cls, id_seed: int, token_address: int = consts.NATIVE_TOKEN_ADDRESS):
        """From a derive_id seed (lib.rs:50-61; id = generate_user_id(seed))."""
        return cls(id=secrets.generate_user_id(id_seed), token_address=token_address)

    # -- nullifier chain (lib.rs:110-126) --

    def prenullifier(self) -> int:
        return self.id

    def next_nullifier(self) -> int:
        return secrets.derive_nullifier(self.id, self.nonce)

    def previous_nullifier(self) -> int:
        if self.nonce == 0:
            return self.prenullifier()
        return secrets.derive_nullifier(self.id, self.nonce - 1)

    # -- notes (lib.rs:95-107) --

    def note(self) -> int | None:
        """Commitment to the current state; None before the first action."""
        if self.nonce == 0:
            return None
        return notes.make_note(self.id, self.previous_nullifier(),
                               self.shielded_amount, self.token_address)

    def current_leaf_index(self) -> int | None:
        return self.history[-1].note_index if self.history else None

    # -- state transitions (lib.rs:64-87) --

    def register_action(self, action: ShielderAction) -> None:
        assert action.token_address == self.token_address, "token mismatch"
        if action.kind in ("new_account", "deposit"):
            self.shielded_amount += action.amount - action.protocol_fee
        elif action.kind == "withdraw":
            assert self.shielded_amount >= action.amount, "underflow"
            self.shielded_amount -= action.amount
        else:
            raise ValueError(action.kind)
        self.nonce += 1
        self.history.append(action)
