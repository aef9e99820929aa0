"""Keccak256 Fiat–Shamir transcript — byte-exact with the generated verifier.

Reproduces the EVM-word transcript of crates/halo2-verifier
(templates/Halo2Verifier.sol):

- state is a byte buffer seeded with the 32-byte vk digest; scalars are
  absorbed as 32-byte big-endian uint256 words (checked < r, :249-263),
  EC points as x || y 32-byte BE words with an on-curve check
  (read_ec_point, :90-102);
- ``squeeze_challenge`` = keccak256(buffer); challenge = hash mod r; the
  buffer restarts with the raw 32-byte hash (:104-112);
- ``squeeze_challenge_cont`` = keccak256(prev_hash || 0x01) for extra
  same-phase challenges (:114-124).

The proof wire format is the verifier calldata layout: uncompressed points
(x||y BE), evaluations as BE words — matching
``verifier_contract::encode_calldata`` (src/lib/verifier_contract.rs:14-20).
"""

from __future__ import annotations

from ..ops import curve_golden as cg
from ..ops import field_golden as G
from ..ops.keccak import keccak256

R = G.FR_MODULUS
Q = G.FQ_MODULUS


def _be(x: int) -> bytes:
    return int(x).to_bytes(32, "big")


class Transcript:
    """Prover-side transcript; also drives proof byte serialization."""

    def __init__(self, vk_digest: int = 0):
        self._buf = bytearray(_be(vk_digest))
        self.proof = bytearray()

    # -- absorption --

    def common_scalar(self, x: int) -> None:
        """Absorb a scalar without writing it to the proof (e.g. instances)."""
        assert 0 <= x < R, "scalar out of field"
        self._buf += _be(x)

    def write_scalar(self, x: int) -> None:
        """Absorb a scalar and append it to the proof (evaluations)."""
        self.common_scalar(x)
        self.proof += _be(x)

    def common_point(self, pt) -> None:
        """Absorb an affine G1 point.

        The identity is rejected, matching the reference stack end to end:
        halo2's transcript errors with "cannot write points at infinity"
        at prove time and the generated verifier rejects (0,0) on its
        on-curve check (`templates/Halo2Verifier.sol:90-102`).  KZG
        commitments are unblinded (ParamsKZG::commit ignores the Blind),
        so a degenerate circuit whose quotient piece is identically zero
        cannot be proven for the EVM — by the reference or by us.
        """
        if pt is None:
            raise ValueError(
                "cannot write points at infinity to the transcript "
                "(degenerate circuit: an all-zero polynomial was committed; "
                "halo2 create_proof fails identically)")
        x, y = pt
        assert 0 <= x < Q and 0 <= y < Q
        assert (y * y - x * x * x - 3) % Q == 0, "point not on curve"
        self._buf += _be(x) + _be(y)

    def write_point(self, pt) -> None:
        """Absorb a point and append x||y to the proof (commitments)."""
        self.common_point(pt)
        self.proof += _be(pt[0]) + _be(pt[1])

    # -- squeezing --

    def squeeze_challenge(self) -> int:
        h = keccak256(bytes(self._buf))
        self._buf = bytearray(h)
        return int.from_bytes(h, "big") % R

    def squeeze_challenge_cont(self) -> int:
        """Extra same-phase challenge: keccak(prev_hash || 0x01)."""
        assert len(self._buf) == 32, "cont-squeeze only directly after a squeeze"
        h = keccak256(bytes(self._buf) + b"\x01")
        self._buf = bytearray(h)
        return int.from_bytes(h, "big") % R


class TranscriptRead:
    """Verifier-side transcript: replays the proof byte stream."""

    def __init__(self, proof: bytes, vk_digest: int = 0):
        self._buf = bytearray(_be(vk_digest))
        self._proof = proof
        self._off = 0

    def common_scalar(self, x: int) -> None:
        assert 0 <= x < R
        self._buf += _be(x)

    def read_scalar(self) -> int:
        x = int.from_bytes(self._proof[self._off : self._off + 32], "big")
        self._off += 32
        assert x < R, "proof scalar out of field"
        self._buf += _be(x)
        return x

    def read_point(self):
        x = int.from_bytes(self._proof[self._off : self._off + 32], "big")
        y = int.from_bytes(self._proof[self._off + 32 : self._off + 64], "big")
        self._off += 64
        assert x < Q and y < Q, "coordinate out of field"
        assert (y * y - x * x * x - 3) % Q == 0, "point not on curve"
        self._buf += _be(x) + _be(y)
        return (x, y)

    def squeeze_challenge(self) -> int:
        h = keccak256(bytes(self._buf))
        self._buf = bytearray(h)
        return int.from_bytes(h, "big") % R

    def squeeze_challenge_cont(self) -> int:
        assert len(self._buf) == 32
        h = keccak256(bytes(self._buf) + b"\x01")
        self._buf = bytearray(h)
        return int.from_bytes(h, "big") % R

    def done(self) -> bool:
        return self._off == len(self._proof)
