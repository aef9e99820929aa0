"""Shielder protocol model: secrets, notes, accounts, the note Merkle tree.

Host-side protocol bookkeeping (keccak secret derivation, account state
machine) plus the device-batched Merkle tree builder.  Mirrors the reference's
L4 layer (crates/shielder-account, crates/shielder-setup,
contracts/MerkleTree.sol) — see SURVEY.md §2.0.
"""

from . import account, consts, merkle, notes, secrets  # noqa: F401
