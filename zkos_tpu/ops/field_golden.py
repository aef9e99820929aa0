"""Golden (pure-Python-int) model of BN254 field arithmetic.

This is the correctness oracle for the JAX/TPU limb kernels in
``zkos_tpu.ops.field``.  Everything here is arbitrary-precision integer math —
slow, obviously correct, and usable from tests without any accelerator.

Reference semantics:
- moduli: halo2curves bn256 ``Fr``/``Fq``; the Fr modulus limbs are pinned in
  the reference at crates/shielder-account/src/secrets.rs:20-25.
- canonical wire format: little-endian 32 bytes (crates/type-conversions/lib.rs:40-75).

The limb radix (15 bits x 18 limbs, Montgomery R = 2^270) mirrors the TPU
kernels' lazy-reduction representation, chosen so that products of two
"dirty" (<= 16-bit) limbs always fit a uint32 lane.
"""

from __future__ import annotations

# BN254 (alt_bn128) scalar field modulus r  (order of G1/G2)
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# BN254 base field modulus q (coordinates of G1; also the scalar field of Grumpkin)
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# Fr multiplicative generator and 2-adicity (halo2curves bn256::Fr: GENERATOR=7, S=28)
FR_GENERATOR = 7
FR_TWO_ADICITY = 28

LIMB_BITS = 15
N_LIMBS = 18
LIMB_MASK = (1 << LIMB_BITS) - 1
R = 1 << (LIMB_BITS * N_LIMBS)  # Montgomery radix 2^270


def to_limbs(x: int, n: int = N_LIMBS, bits: int = LIMB_BITS) -> list[int]:
    """Split a non-negative int into little-endian fixed-width limbs."""
    assert 0 <= x < (1 << (n * bits)), "value does not fit"
    mask = (1 << bits) - 1
    return [(x >> (bits * i)) & mask for i in range(n)]


def from_limbs(limbs, bits: int = LIMB_BITS) -> int:
    """Recombine little-endian limbs into an int."""
    return sum(int(l) << (bits * i) for i, l in enumerate(limbs))


def le_bytes(x: int, length: int = 32) -> bytes:
    """Canonical little-endian byte encoding (the Shielder Fr wire format)."""
    return int(x).to_bytes(length, "little")


def from_le_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little")


class GoldenField:
    """Arbitrary-precision model of a prime field with Montgomery helpers."""

    def __init__(self, modulus: int):
        self.p = modulus
        self.r = R % modulus
        self.r2 = (R * R) % modulus
        self.r_inv = pow(R, modulus - 2, modulus)
        # -p^{-1} mod 2^LIMB_BITS (Montgomery word inverse)
        self.np0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def inv(self, a: int) -> int:
        return pow(a, self.p - 2, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def to_mont(self, a: int) -> int:
        return (a * self.r) % self.p

    def from_mont(self, a: int) -> int:
        return (a * self.r_inv) % self.p

    def mont_mul(self, a: int, b: int) -> int:
        """Montgomery product a*b*R^-1 mod p (operands in Montgomery form)."""
        return (a * b * self.r_inv) % self.p


FR = GoldenField(FR_MODULUS)
FQ = GoldenField(FQ_MODULUS)


def fr_root_of_unity() -> int:
    """Primitive 2^28-th root of unity in Fr, matching halo2curves bn256::Fr.

    halo2curves defines ROOT_OF_UNITY = GENERATOR^((r-1) / 2^S) with
    GENERATOR = 7, S = 28.  The per-circuit omega embedded in the generated
    Solidity verifiers (crates/halo2-verifier/src/lib/codegen.rs:164-171) is
    this value squared down to the circuit's domain size.
    """
    return pow(FR_GENERATOR, (FR_MODULUS - 1) >> FR_TWO_ADICITY, FR_MODULUS)
