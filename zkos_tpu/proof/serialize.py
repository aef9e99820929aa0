"""(De)serialization of proving artifacts — params.bin / pk.bin analogs.

Mirrors the marshall_params / marshall_pk / unmarshall_* surface of the
external shielder-circuits crate as consumed by shielder_bindings
(src/circuits/mod.rs:38-44; build.rs pre-generates the artifacts so clients
can "new_pronto" without keygen).  Format: framework-defined tagged binary
(magic + version + little-endian lengths + 32-byte BE field words).
"""

from __future__ import annotations

import struct

from ..ops import field_golden as G
from . import domain as dom
from . import plonk, srs as srs_mod

_MAGIC = b"ZKTP"
_VERSION = 1


class _W:
    def __init__(self):
        self.buf = bytearray(_MAGIC + bytes([_VERSION]))

    def u32(self, x):
        self.buf += struct.pack("<I", x)

    def field(self, x):
        self.buf += int(x).to_bytes(32, "big")

    def point(self, pt):
        if pt is None:
            self.field(0), self.field(0)
        else:
            self.field(pt[0]), self.field(pt[1])

    def fields(self, xs):
        self.u32(len(xs))
        for x in xs:
            self.field(x)

    def points(self, pts):
        self.u32(len(pts))
        for p in pts:
            self.point(p)


class _R:
    def __init__(self, data: bytes):
        assert data[:4] == _MAGIC and data[4] == _VERSION, "bad artifact"
        self.data = data
        self.off = 5

    def u32(self):
        (x,) = struct.unpack_from("<I", self.data, self.off)
        self.off += 4
        return x

    def field(self):
        x = int.from_bytes(self.data[self.off : self.off + 32], "big")
        self.off += 32
        return x

    def point(self):
        x, y = self.field(), self.field()
        return None if x == 0 and y == 0 else (x, y)

    def fields(self):
        return [self.field() for _ in range(self.u32())]

    def points(self):
        return [self.point() for _ in range(self.u32())]


def marshall_params(srs: srs_mod.Srs) -> bytes:
    """SRS -> bytes (params.bin)."""
    w = _W()
    w.u32(srs.k)
    w.points(srs.g1)
    for c in (*srs.g2[0], *srs.g2[1], *srs.s_g2[0], *srs.s_g2[1]):
        w.field(c)
    return bytes(w.buf)


def unmarshall_params(data: bytes) -> srs_mod.Srs:
    r = _R(data)
    k = r.u32()
    g1 = r.points()
    c = [r.field() for _ in range(8)]
    return srs_mod.Srs(k=k, g1=g1, g2=((c[0], c[1]), (c[2], c[3])),
                       s_g2=((c[4], c[5]), (c[6], c[7])))


def marshall_pk(pk: plonk.ProvingKey) -> bytes:
    """ProvingKey (incl. embedded vk commitments) -> bytes (pk.bin).

    The constraint system itself is code (circuit builders are
    deterministic), so only the numeric tables are serialized — same split
    as the reference, where the circuit shape lives in shielder-circuits and
    pk.bin carries the tables.
    """
    w = _W()
    vk = pk.vk
    w.u32(vk.cs.k)
    w.field(vk.vk_digest)
    w.points(vk.fixed_comms)
    w.points(vk.permutation_comms)
    w.u32(len(pk.fixed_values))
    for col in pk.fixed_values:
        w.fields(col)
    w.u32(len(pk.sigma_values))
    for col in pk.sigma_values:
        w.fields(col)
    return bytes(w.buf)


def unmarshall_pk(data: bytes, cs: plonk.ConstraintSystem,
                  srs: srs_mod.Srs) -> plonk.ProvingKey:
    """Rebuild a ProvingKey against its (code-defined) constraint system."""
    r = _R(data)
    k = r.u32()
    assert k == cs.k, "artifact k mismatch"
    vk_digest = r.field()
    fixed_comms = r.points()
    permutation_comms = r.points()
    fixed_values = [r.fields() for _ in range(r.u32())]
    sigma_values = [r.fields() for _ in range(r.u32())]
    domain = dom.Domain(cs.k, quotient_degree=cs.degree())
    fixed_polys = [domain.lagrange_to_coeff(v) for v in fixed_values]
    sigma_polys = [domain.lagrange_to_coeff(v) for v in sigma_values]
    vk = plonk.VerifyingKey(
        cs=cs, domain=domain, fixed_comms=fixed_comms,
        permutation_comms=permutation_comms, fixed_polys=fixed_polys,
        vk_digest=vk_digest, g2=srs.g2, s_g2=srs.s_g2)
    return plonk.ProvingKey(vk=vk, srs=srs, fixed_values=fixed_values,
                            sigma_values=sigma_values, sigma_polys=sigma_polys)
