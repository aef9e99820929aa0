"""Golden (pure-Python-int) model of BN254 G1 — oracle for the JAX kernels.

Affine arithmetic with explicit branches; G1: y^2 = x^3 + 3 over Fq,
generator (1, 2), identity represented as None.  Matches halo2curves bn256
G1Affine semantics (used by the SRS in crates/powers-of-tau and all
commitments).
"""

from __future__ import annotations

from . import field_golden as G

Q = G.FQ_MODULUS
B_COEFF = 3
GEN = (1, 2)

Point = "tuple[int, int] | None"  # affine, None = identity


def is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B_COEFF) % Q == 0


def neg(pt):
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % Q)


def add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        # doubling
        lam = (3 * x1 * x1) * pow(2 * y1, Q - 2, Q) % Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, Q - 2, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def scalar_mul(k: int, pt):
    k %= G.FR_MODULUS
    acc = None
    while k:
        if k & 1:
            acc = add(acc, pt)
        pt = add(pt, pt)
        k >>= 1
    return acc


def msm(scalars: list[int], points: list) -> "Point":
    acc = None
    for s, p in zip(scalars, points):
        acc = add(acc, scalar_mul(s, p))
    return acc


def random_points(rng, n: int) -> list:
    """n distinct multiples of the generator (deterministic from rng)."""
    return [scalar_mul(int(rng.integers(1, 2**62)) * int(rng.integers(1, 2**62)) + 1, GEN)
            for _ in range(n)]
