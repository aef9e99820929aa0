"""Keccak-based secret derivation (bit-exact with the reference).

Mirrors crates/shielder-account/src/secrets.rs:
- ``derive_nullifier(id, nonce)`` = keccak256(id_be32 || b"nullifier" ||
  nonce_be4) reduced mod r (secrets.rs:39-46);
- ``derive_id(private_key, chain_id, account_nonce)`` = keccak256(pk_be32 ||
  b"id" || chain_be8 || nonce_be4) mod r (secrets.rs:49-57).

The reference pins both with external keccak vectors (secrets.rs:76-107);
those same vectors are reproduced in tests/test_protocol.py.
"""

from __future__ import annotations

from ..ops import field_golden as G
from ..ops.keccak import keccak256

FIELD_MODULUS = G.FR_MODULUS


def _finalize(data: bytes) -> int:
    return int.from_bytes(keccak256(data), "big") % FIELD_MODULUS


def derive_nullifier(id_: int, nonce: int) -> int:
    """Pseudorandom field element from (id, nonce)."""
    return _finalize(
        id_.to_bytes(32, "big") + b"nullifier" + nonce.to_bytes(4, "big"))


def derive_id(private_key: int, chain_id: int, account_nonce: int) -> int:
    """Per-chain & per-nonce private ID seed from a signing key."""
    return _finalize(
        private_key.to_bytes(32, "big") + b"id"
        + chain_id.to_bytes(8, "big") + account_nonce.to_bytes(4, "big"))


def generate_user_id(id_seed: int) -> int:
    """Map an id seed to the account id — an "on-curve id".

    The reference's ``shielder_circuits::generate_user_id`` lives in the
    external non-vendored crate; its in-repo usage calls it the "on curve
    id" (shielder_bindings/src/secrets.rs:39), i.e. an x-coordinate with a
    point on Grumpkin, so the account's viewing-key point ``lift_x(id)``
    exists for ElGamal encryption (SURVEY.md A.4).  This framework defines
    it as try-and-increment from Poseidon2 hash::<1>([seed]) — a documented
    reconstruction (not bit-pinned to the external crate).
    """
    from ..ops import grumpkin_golden as GR
    from ..ops.poseidon2 import hash_ints

    x = hash_ints([id_seed % FIELD_MODULUS])
    while GR.lift_x(x) is None:
        x = (x + 1) % FIELD_MODULUS
    return x
