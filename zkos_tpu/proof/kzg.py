"""KZG polynomial commitments over BN254: commit / open / verify.

Prover side runs on device (Pippenger MSM over the SRS G1 table, NTT for
basis conversion); verification is the exact pairing equation enforced by the
reference's generated Solidity verifier — which embeds only ``g2`` and
``-s*g2`` as constants, so the check is arranged to need G1 arithmetic only
(crates/halo2-verifier/src/lib/codegen.rs:164-226, pairing at
templates/Halo2Verifier.sol:204-224):

    p(X) - y = q(X) (X - z)
    =>  C - y*G + z*W  =  tau * W          (at the trapdoor tau)
    =>  e(C - y*G + z*W, G2) * e(-W, s*G2) == 1

Batched/multi-point opening (BDFG21) lives with the PLONK driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import curve_golden as cg
from ..ops import field as F
from ..ops import field_golden as G
from ..ops import msm as M
from ..ops import ntt as NTT
from ..ops import pairing_golden as PG
from . import srs as srs_mod

P = G.FR_MODULUS


# ---------------------------------------------------------------------------
# host golden engine (python ints)
# ---------------------------------------------------------------------------

def poly_eval(coeffs: list[int], z: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % P
    return acc


def poly_divide_linear(coeffs: list[int], z: int) -> list[int]:
    """(p(X) - p(z)) / (X - z) by synthetic (Horner) division; exact."""
    q = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % P
        q[i - 1] = acc
    return q


def commit_ints(srs: srs_mod.Srs, coeffs: list[int]):
    assert len(coeffs) <= len(srs.g1)
    return cg.msm(coeffs, srs.g1[: len(coeffs)])


def open_ints(srs: srs_mod.Srs, coeffs: list[int], z: int):
    """Golden open: returns (W affine, y)."""
    y = poly_eval(coeffs, z)
    q = poly_divide_linear(coeffs, z)
    w = commit_ints(srs, q) if q else None
    return w, y


def verify(srs: srs_mod.Srs, commitment, z: int, y: int, w) -> bool:
    """Pairing check e(C - yG + zW, G2) * e(-W, sG2) == 1 (host, golden)."""
    lhs = cg.add(commitment, cg.neg(cg.scalar_mul(y, cg.GEN)))
    lhs = cg.add(lhs, cg.scalar_mul(z, w))
    return PG.pairing_check([(lhs, srs.g2), (cg.neg(w), srs.s_g2)])


# ---------------------------------------------------------------------------
# device engine
# ---------------------------------------------------------------------------

@dataclass
class DeviceSrs:
    """SRS with the G1 powers resident on device, ready for MSM."""

    srs: srs_mod.Srs
    g1_table: jax.Array  # (3, 18, n) Montgomery projective

    @classmethod
    def build(cls, srs: srs_mod.Srs, n: int | None = None) -> "DeviceSrs":
        return cls(srs=srs, g1_table=srs_mod.device_g1_table(srs, n))

    @property
    def n(self) -> int:
        return int(self.g1_table.shape[-1])


def commit(dsrs: DeviceSrs, coeff_limbs: jax.Array, c: int = 8) -> jax.Array:
    """Device commit: MSM(SRS_powers, coeffs).  coeff_limbs (18, m) canonical."""
    m = coeff_limbs.shape[1]
    assert m <= dsrs.n
    return M.msm_mont(dsrs.g1_table[:, :, :m], coeff_limbs, c=c)


def commit_lagrange(dsrs: DeviceSrs, eval_limbs: jax.Array, c: int = 8) -> jax.Array:
    """Device commit of evaluation-form values: iNTT then commit.

    Equal to halo2's commit_lagrange against the Lagrange point table
    (oracle: powers-of-tau lib.rs:248-263 round-trip test).
    """
    coeffs = NTT.ntt(eval_limbs, inverse=True)
    return commit(dsrs, coeffs, c=c)


@jax.jit
def eval_poly_device(coeff_limbs: jax.Array, z_limbs: jax.Array) -> jax.Array:
    """Horner evaluation on device: (18, m) canonical, z (18,) -> (18,) canonical."""
    zm = F.to_mont(F.FR, z_limbs)
    cm = F.to_mont(F.FR, coeff_limbs)

    def body(acc, coef):
        return F.mont_mul(F.FR, acc, zm) + coef, None

    acc, _ = jax.lax.scan(body, F.zero(F.FR), jnp.moveaxis(cm, 1, 0)[::-1])
    return F.from_mont(F.FR, F.reduce2p(F.FR, acc))


@jax.jit
def divide_linear_device(coeff_limbs: jax.Array, z_limbs: jax.Array) -> jax.Array:
    """Synthetic division on device: quotient of (p - p(z))/(X - z), (18, m-1)."""
    zm = F.to_mont(F.FR, z_limbs)
    cm = F.to_mont(F.FR, coeff_limbs)

    def body(acc, coef):
        acc = F.reduce2p(F.FR, F.mont_mul(F.FR, acc, zm) + coef)
        return acc, acc

    _, qs = jax.lax.scan(body, F.zero(F.FR), jnp.moveaxis(cm, 1, 0)[::-1])
    # qs[i] = Horner partials from the top; quotient coeffs are qs[:-1] reversed
    q = jnp.moveaxis(qs[:-1][::-1], 0, 1)
    return F.from_mont(F.FR, q)


def open_device(dsrs: DeviceSrs, coeff_limbs: jax.Array, z: int, c: int = 8):
    """Device open: returns (W (3,18) projective device point, y int)."""
    z_limbs = jnp.asarray(F.to_limbs(z % P), dtype=jnp.uint32)
    y = F.from_limbs(np.asarray(eval_poly_device(coeff_limbs, z_limbs)))
    q = divide_linear_device(coeff_limbs, z_limbs)
    w = M.msm_mont(dsrs.g1_table[:, :, : q.shape[1]], q, c=c)
    return w, y
