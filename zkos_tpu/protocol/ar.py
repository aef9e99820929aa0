"""Anonymity-revoker operations (the ar-cli plane of the reference).

- operator keypair over Grumpkin (crates/ar-cli/src/common.rs:57-68; the
  reference seeds ChaCha12 from a BIP-39 mnemonic — here the seed-to-scalar
  step is a documented keccak-based derivation, since the RNG consumption
  pattern of the non-vendored ``generate_keys`` is not reconstructable);
- pubkey (de)serialization as 64 BE bytes with the y^2 = x^3 - 17 on-curve
  check (common.rs:11-31, mirrored on-chain at AnonymityRevoker.sol:38-59);
- viewing-key collection: ElGamal-decrypt the (C1, C2) public inputs of
  newAccount calls, viewing key = x-coordinate (collect_viewing_keys.rs:130-158);
- revocation: account linkage iff mac_commitment == Poseidon2
  hash([mac_salt, viewing_key]) (crates/ar-cli/src/revoke.rs:17-49).
"""

from __future__ import annotations

from ..ops import field_golden as G
from ..ops import grumpkin_golden as GR
from ..ops.keccak import keccak256
from ..ops.poseidon2 import hash_ints


def keygen_from_seed(seed: bytes):
    """(sk, PK): scalar from keccak(seed || counter), rejection-sampled."""
    ctr = 0
    while True:
        h = int.from_bytes(keccak256(seed + ctr.to_bytes(4, "big")), "big")
        sk = h % GR.SCALAR_ORDER
        if sk != 0:
            return GR.generate_keys(sk)
        ctr += 1


def serialize_pub_key(pk) -> bytes:
    """x || y, each 32-byte big-endian (common.rs:11-19)."""
    x, y = pk
    return x.to_bytes(32, "big") + y.to_bytes(32, "big")


def deserialize_pub_key(data: bytes):
    assert len(data) == 64, "pubkey must be 64 bytes"
    x = int.from_bytes(data[:32], "big")
    y = int.from_bytes(data[32:], "big")
    assert x < G.FR_MODULUS and y < G.FR_MODULUS, "coordinate out of field"
    pt = (x, y)
    assert GR.is_on_curve(pt), "pubkey not on curve"
    return pt


def decrypt_viewing_key(c1, c2, sk: int) -> int:
    """x-coordinate of the ElGamal-decrypted symmetric-key point."""
    m = GR.decrypt(c1, c2, sk)
    assert m is not None, "decryption yielded the identity"
    return m[0]


def mac_matches(mac_salt: int, viewing_key: int, mac_commitment: int) -> bool:
    """revoke.rs:30-40 linkage check."""
    return hash_ints([mac_salt, viewing_key]) == mac_commitment
