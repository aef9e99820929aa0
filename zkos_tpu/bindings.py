"""Host bindings facade — the shielder_bindings / CryptoClient surface.

One flat module mirroring what the reference exposes to WASM/uniffi clients
(crates/shielder_bindings) and the TS SDK's platform-neutral ``CryptoClient``
interface (ts/shielder-sdk-crypto/src/cryptoClient.ts:13-76): circuit
prove/verify wrappers, variable-length Poseidon hashing, secret derivation,
Merkle-path decoding, and the LE 32-byte scalar wire format.
"""

from __future__ import annotations

from .ops import field_golden as G
from .ops.poseidon2 import hash_ints
from .protocol import consts, secrets
from .protocol.merkle import path_to_matrix
from .utils import conversions as conv

P = G.FR_MODULUS


# -- Scalar wire format (ts/shielder-sdk-crypto/src/scalar.ts:22-62) --

def scalar_to_bytes(x: int) -> bytes:
    return conv.field_to_le_bytes(x)


def scalar_from_bytes(b: bytes) -> int:
    return conv.le_bytes_to_field(b)


# -- hashing (shielder_bindings/src/hash.rs:15-26, utils.rs:14-30) --

POSEIDON_RATE = consts.POSEIDON_RATE


def poseidon_hash(inputs: list[int]) -> int:
    """Variable-length Poseidon2 hash, arity 1..=7."""
    assert 1 <= len(inputs) <= POSEIDON_RATE, "tuple length must be in 1..=7"
    return hash_ints(inputs)


def poseidon2_hash_bytes(flat: bytes) -> bytes:
    """Byte-vector variant (WASM surface): 32-byte LE chunks in/out."""
    assert len(flat) % 32 == 0
    vals = [scalar_from_bytes(flat[i : i + 32]) for i in range(0, len(flat), 32)]
    return scalar_to_bytes(poseidon_hash(vals))


# -- secrets (shielder_bindings/src/secrets.rs:20-41) --

def derive_id(private_key_hex: str, chain_id: int, account_nonce: int) -> bytes:
    seed = secrets.derive_id(conv.hex_to_u256(private_key_hex), chain_id,
                             account_nonce)
    return scalar_to_bytes(secrets.generate_user_id(seed))


def get_action_secrets(id_bytes: bytes, nonce: int) -> dict:
    id_ = scalar_from_bytes(id_bytes)
    return {"nullifier": scalar_to_bytes(secrets.derive_nullifier(id_, nonce))}


# -- merkle path decoding (shielder_bindings/src/utils.rs:36-60) --

def vec_to_path(flat: list[int]) -> list[list[int]]:
    """13*7+1 flat getMerklePath output -> [[7] x 13] (drops the root)."""
    assert len(flat) == consts.TREE_HEIGHT * consts.ARITY + 1
    return path_to_matrix(flat)


# -- circuits (shielder_bindings/src/circuits/mod.rs:54-125 shape) --

class Circuit:
    """Generic prove/verify wrapper around a ShielderCircuit.

    ``new`` runs keygen from an SRS; ``new_pronto`` loads pre-marshalled
    artifacts (mod.rs:89-101).
    """

    def __init__(self, shielder_circuit):
        self._c = shielder_circuit

    @classmethod
    def new(cls, kind: str, k: int, srs, example_builder):
        from .models.shielder import ShielderCircuit

        return cls(ShielderCircuit.setup(kind, k, srs, example_builder))

    @classmethod
    def new_pronto(cls, kind: str, params_bytes: bytes, pk_bytes: bytes,
                   constraint_system):
        from .models.shielder import ShielderCircuit
        from .proof import serialize

        srs = serialize.unmarshall_params(params_bytes)
        pk = serialize.unmarshall_pk(pk_bytes, constraint_system, srs)
        return cls(ShielderCircuit(kind=kind, k=constraint_system.k, pk=pk,
                                   vk=pk.vk))

    def prove(self, builder, public_input: list[int], seed: int = 0) -> bytes:
        return self._c.prove(builder, public_input, seed=seed)

    def verify(self, proof: bytes, public_input: list[int]) -> bool:
        return self._c.verify(proof, public_input)
