"""KZG structured reference string: .ptau reading + device-resident tables.

Reads Perpetual-Powers-of-Tau files in the snarkjs layout, matching
crates/powers-of-tau/src/lib.rs bit-for-bit:

- header size u64 LE at offset 16; k u32 LE at ``24 + header_size - 8``
  (lib.rs:25-26, 80-89);
- G1 section at ``24 + header_size + 12`` holding ``2*2^k - 1`` points of
  (x, y) 32-byte LE coordinates **in Montgomery form** (R = 2^256); each is
  de-Montgomery-ized by multiplying with R^-1 (lib.rs:92-109, 190-231);
- G2 section 12 bytes after the G1 payload: [g2, s_g2] with Fq2 coords
  (c0 || c1 each 32-byte LE Montgomery) (lib.rs:111-188).

The device tables put the first n = 2^k powers in Montgomery projective
limb-major layout for the MSM kernels.  ``commit_lagrange`` is implemented
as iNTT + commit (mathematically identical to halo2's Lagrange-basis point
table; the TPU-first choice avoids an elliptic-curve FFT entirely).
Oracles: commit == commit_lagrange∘NTT round trip and raw==perpetual
equality tests (lib.rs:233-282).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import curve_golden as cg
from ..ops import field as F
from ..ops import field_golden as G

HEADER_SIZE_OFFSET = 16
HEADER_OFFSET = HEADER_SIZE_OFFSET + 8
R256 = 1 << 256  # ptau files store coordinates in Montgomery form w.r.t. 2^256
R256_INV = pow(R256 % G.FQ_MODULUS, G.FQ_MODULUS - 2, G.FQ_MODULUS)


@dataclass
class Srs:
    """BN254 KZG SRS: G1 powers of tau + the two G2 points for verification."""

    k: int
    g1: list  # [(x, y)] * n_points, affine python ints; g1[i] = tau^i * G
    g2: tuple  # ((x0,x1), (y0,y1)) Fq2 affine
    s_g2: tuple  # tau * g2

    @property
    def n(self) -> int:
        return 1 << self.k

    def shrink(self, k: int) -> "Srs":
        """SRS for a smaller domain (generate_keys_with_min_k semantics)."""
        assert k <= self.k
        return Srs(k=k, g1=self.g1[: (1 << k)], g2=self.g2, s_g2=self.s_g2)


def default_ptau_path(k: int) -> str:
    base = os.environ.get("PTAU_RESOURCES_DIR", "/root/reference/resources")
    return os.path.join(base, f"ppot_0080_{k}.ptau")


def _read_fq_mont(buf: bytes, off: int) -> int:
    v = int.from_bytes(buf[off : off + 32], "little")
    return (v * R256_INV) % G.FQ_MODULUS


def read_ptau(path: str, max_points: int | None = None) -> Srs:
    """Parse a .ptau file (snarkjs/perpetual-powers-of-tau layout)."""
    with open(path, "rb") as f:
        data = f.read()
    header_size = struct.unpack_from("<Q", data, HEADER_SIZE_OFFSET)[0]
    k = struct.unpack_from("<I", data, HEADER_OFFSET + header_size - 8)[0]
    n = 1 << k
    n_g1 = 2 * n - 1
    g1_off = HEADER_OFFSET + header_size + 12
    want = n if max_points is None else min(max_points, n_g1)
    g1 = []
    for i in range(want):
        x = _read_fq_mont(data, g1_off + 64 * i)
        y = _read_fq_mont(data, g1_off + 64 * i + 32)
        pt = None if x == 0 and y == 0 else (x, y)
        assert cg.is_on_curve(pt), f"ptau G1[{i}] off-curve"
        g1.append(pt)
    g2_off = g1_off + 64 * n_g1 + 12
    g2_pts = []
    for i in range(2):
        base = g2_off + 128 * i
        x = (_read_fq_mont(data, base), _read_fq_mont(data, base + 32))
        y = (_read_fq_mont(data, base + 64), _read_fq_mont(data, base + 96))
        g2_pts.append((x, y))
    return Srs(k=k, g1=g1, g2=g2_pts[0], s_g2=g2_pts[1])


def read_raw(path: str, max_points: int | None = None) -> Srs:
    """Parse the halo2 RawBytes params dump (``ppot_0080_{k}_raw``).

    Layout (halo2 ParamsKZG::write_custom(SerdeFormat::RawBytes)): u32 LE k,
    then n G1 monomial powers and n G1 Lagrange points of (x, y) 32-byte LE
    Montgomery coordinates, then g2 and s_g2 as four Fq2 halves each.  The
    Lagrange table is skipped — this framework derives Lagrange commits via
    iNTT (see commit_lagrange).  Oracle: raw_equals_perpetual
    (powers-of-tau lib.rs:267-281).
    """
    with open(path, "rb") as f:
        data = f.read()
    k = struct.unpack_from("<I", data, 0)[0]
    n = 1 << k
    want = n if max_points is None else min(max_points, n)
    g1 = []
    for i in range(want):
        x = _read_fq_mont(data, 4 + 64 * i)
        y = _read_fq_mont(data, 4 + 64 * i + 32)
        pt = None if x == 0 and y == 0 else (x, y)
        assert cg.is_on_curve(pt), f"raw G1[{i}] off-curve"
        g1.append(pt)
    g2_off = 4 + 64 * 2 * n
    g2_pts = []
    for i in range(2):
        base = g2_off + 128 * i
        x = (_read_fq_mont(data, base), _read_fq_mont(data, base + 32))
        y = (_read_fq_mont(data, base + 64), _read_fq_mont(data, base + 96))
        g2_pts.append((x, y))
    return Srs(k=k, g1=g1, g2=g2_pts[0], s_g2=g2_pts[1])


def default_raw_path(k: int) -> str:
    base = os.environ.get("PTAU_RESOURCES_DIR", "/root/reference/resources")
    return os.path.join(base, f"ppot_0080_{k}_raw")


def read(k: int | None = None, path: str | None = None, fmt: str = "ptau",
         max_points: int | None = None) -> Srs:
    """Entry point mirroring powers_of_tau::read (lib.rs:61-74)."""
    if path is None:
        assert k is not None
        path = default_ptau_path(k) if fmt == "ptau" else default_raw_path(k)
    if fmt == "raw":
        return read_raw(path, max_points=max_points)
    return read_ptau(path, max_points=max_points)


def device_g1_table(srs: Srs, n: int | None = None) -> jax.Array:
    """(3, 18, n) Montgomery projective table of the first n G1 powers."""
    pts = srs.g1 if n is None else srs.g1[:n]
    return jnp.asarray(C.point_from_affine_ints(pts))


def synthetic_srs(k: int, tau: int | None = None, with_extra: bool = False) -> Srs:
    """A dev/test SRS from a known tau (seeded; NOT for production).

    Mirrors the reference's dev-mode ``generate_setup_params(k, rng)``
    (SURVEY.md §2.1); tau defaults to a fixed test value.

    Default-tau results are cached on disk (artifacts/synthetic_srs_k*.bin):
    2^k python scalar muls cost minutes at MAX_K=13, and the k=13 domain
    test (generator.rs:20-24 keygen headroom) must be affordable per run.
    """
    default_tau = tau is None
    tau = 0x1F2E3D4C5B6A79880102030405060708090A0B0C0D0E0F10 if tau is None else tau
    tau %= G.FR_MODULUS
    n = 1 << k
    count = 2 * n - 1 if with_extra else n

    cache = None
    if default_tau:
        art = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "artifacts")
        cache = os.path.join(art, f"synthetic_srs_k{k}"
                                  f"{'x' if with_extra else ''}.bin")
        if os.path.exists(cache):
            return _load_synthetic(cache, k, count)

    g1 = []
    acc = 1
    for _ in range(count):
        g1.append(cg.scalar_mul(acc, cg.GEN))
        acc = (acc * tau) % G.FR_MODULUS
    from ..ops import pairing_golden as PG

    g2 = PG.G2_GEN
    # s_g2 = tau * G2 — needs G2 scalar mul over Fq2; do it via the Fq12 embed
    s_g2 = _g2_scalar_mul(tau, g2)
    srs = Srs(k=k, g1=g1, g2=g2, s_g2=s_g2)
    if cache is not None:
        try:
            _store_synthetic(cache, srs, count)
        except OSError:
            pass
    return srs


def _store_synthetic(path: str, srs: Srs, count: int) -> None:
    blob = bytearray()
    for x, y in srs.g1:
        blob += x.to_bytes(32, "little") + y.to_bytes(32, "little")
    for v in (*srs.s_g2[0], *srs.s_g2[1]):
        blob += v.to_bytes(32, "little")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(blob))
    os.replace(tmp, path)


def _load_synthetic(path: str, k: int, count: int) -> Srs:
    from ..ops import pairing_golden as PG

    data = open(path, "rb").read()
    assert len(data) == 64 * count + 128, "synthetic SRS cache size mismatch"
    g1 = [(int.from_bytes(data[64 * i : 64 * i + 32], "little"),
           int.from_bytes(data[64 * i + 32 : 64 * i + 64], "little"))
          for i in range(count)]
    off = 64 * count
    vals = [int.from_bytes(data[off + 32 * j : off + 32 * (j + 1)], "little")
            for j in range(4)]
    s_g2 = ((vals[0], vals[1]), (vals[2], vals[3]))
    return Srs(k=k, g1=g1, g2=PG.G2_GEN, s_g2=s_g2)


def _g2_scalar_mul(s: int, q_pt):
    """tau*G2 over Fq2 via the golden Fq12 embedding (slow; test-only)."""
    from ..ops import pairing_golden as PG

    acc = None
    add_pt = PG.twist_to_f12(q_pt)
    s %= G.FR_MODULUS
    while s:
        if s & 1:
            acc = PG._ec_add(acc, add_pt)
        add_pt = PG._ec_add(add_pt, add_pt)
        s >>= 1
    assert acc is not None
    # un-embed: x = c*w^2 with c in Fq2 -> read coefficients at w^2 and w^8
    x12, y12 = acc
    x1 = x12[8] % G.FQ_MODULUS
    x0 = (x12[2] + 9 * x1) % G.FQ_MODULUS
    y1 = y12[9] % G.FQ_MODULUS
    y0 = (y12[3] + 9 * y1) % G.FQ_MODULUS
    return ((x0, x1), (y0, y1))
