"""Protocol constants & versioning.

Mirrors crates/shielder-setup/src/lib.rs: ARITY=7 / TREE_HEIGHT=13 (lib.rs:3-6),
native-token constants (lib.rs:8-14), ContractVersion 0.1.1 <-> bytes3
0x000101 (lib.rs:43-82), protocol-fee ceil-div math (lib.rs:84-108), and the
dev RNG seed convention (lib.rs:16-41).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

ARITY = 7
TREE_HEIGHT = 13
POSEIDON_RATE = 7
MAX_K = 13  # largest SRS k shipped by the reference (resources/ppot_0080_13)

NATIVE_TOKEN_ADDRESS = 0  # address(0) stands for the native token
MAX_TRANSACTION_AMOUNT = (1 << 112) - 1  # contracts/Shielder.sol:47

BPS_DENOMINATOR = 10_000


@dataclass(frozen=True)
class ContractVersion:
    major: int = 0
    minor: int = 1
    patch: int = 1

    def to_bytes3(self) -> int:
        """0x000101 encoding (shielder-setup/lib.rs:60-66)."""
        return (self.major << 16) | (self.minor << 8) | self.patch

    def note_version(self) -> int:
        """Note version inside circuits (=0; shielder-setup/lib.rs:74-77)."""
        return 0


def contract_version() -> ContractVersion:
    return ContractVersion()


def rng_seed() -> int:
    """Dev-only deterministic seed (SHIELDER_RNG_SEED, default 42)."""
    return int(os.environ.get("SHIELDER_RNG_SEED", "42"))


def blinding_rng(seed: int = 0):
    """The prover's blinding randomness source.

    Mirrors the reference split between dev determinism and production
    entropy: tests/dev flows pass an explicit seed (or inherit
    SHIELDER_RNG_SEED, shielder-setup/lib.rs:16-41), while
    SHIELDER_RNG_SEED=os — or seed=-1 — selects os-entropy blinding
    (random.SystemRandom), the analog of the bindings' OsRng proving path
    (crates/shielder_bindings/src/circuits/mod.rs:103-111).
    """
    import random

    if seed == -1 or (not seed
                      and os.environ.get("SHIELDER_RNG_SEED") == "os"):
        return random.SystemRandom()
    return random.Random(seed or rng_seed())


def protocol_fee_from_gross(amount: int, fee_bps: int) -> int:
    """Fee charged on a gross amount: ceil(amount * bps / 10000)."""
    return -(-amount * fee_bps // BPS_DENOMINATOR)


def protocol_fee_from_net(net: int, fee_bps: int) -> int:
    """Gross-up: smallest fee f with net + f s.t. fee(net+f) <= f.

    Mirrors compute_protocol_fee_from_net_amount (shielder-setup/lib.rs:100-107):
    fee = ceil(net * bps / (10000 - bps)).
    """
    return -(-net * fee_bps // (BPS_DENOMINATOR - fee_bps))
