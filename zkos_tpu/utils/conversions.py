"""Canonical type conversions: field <-> U256 <-> LE bytes <-> hex <-> address.

Reimplements the semantics of crates/type-conversions (the crate that defines
the **little-endian 32-byte Fr wire format** used everywhere in the reference:
lib.rs:35-118).  Addresses embed as ``uint256(uint160(addr))``
(lib.rs:96-114).
"""

from __future__ import annotations

from ..ops import field_golden as G

U256_MAX = (1 << 256) - 1


def u256_to_field(x: int, modulus: int = G.FR_MODULUS) -> int:
    """U256 -> field element (value taken mod p; lib.rs:35-37 via limbs)."""
    assert 0 <= x <= U256_MAX
    return x % modulus


def field_to_u256(x: int) -> int:
    """Field element (already canonical) -> U256."""
    assert 0 <= x <= U256_MAX
    return x


def field_to_le_bytes(x: int) -> bytes:
    """Canonical LE 32-byte encoding (the Shielder wire format)."""
    return int(x).to_bytes(32, "little")


def le_bytes_to_field(b: bytes, modulus: int = G.FR_MODULUS) -> int:
    v = int.from_bytes(b, "little")
    assert v < modulus, "not a canonical field element"
    return v


def address_to_field(addr: int | str, modulus: int = G.FR_MODULUS) -> int:
    """EVM address -> field element, as ``uint256(uint160(addr))``."""
    if isinstance(addr, str):
        addr = int(addr, 16)
    assert 0 <= addr < (1 << 160)
    return addr % modulus


def field_to_address(x: int) -> int:
    """Field element -> address; must fit in 160 bits (lib.rs:96-114)."""
    assert 0 <= x < (1 << 160), "field element does not fit an address"
    return x


def hex_to_u256(h: str) -> int:
    return int(h.removeprefix("0x"), 16)
