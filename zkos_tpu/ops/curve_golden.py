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


def _jac_add(p1, p2):
    """Jacobian addition (X, Y, Z), identity = None; python ints."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = z1 * z1 % Q
    z2z2 = z2 * z2 % Q
    u1 = x1 * z2z2 % Q
    u2 = x2 * z1z1 % Q
    s1 = y1 * z2 * z2z2 % Q
    s2 = y2 * z1 * z1z1 % Q
    if u1 == u2:
        if s1 != s2:
            return None
        return _jac_double(p1)
    h = (u2 - u1) % Q
    i = 4 * h * h % Q
    j = h * i % Q
    r = 2 * (s2 - s1) % Q
    v = u1 * i % Q
    x3 = (r * r - j - 2 * v) % Q
    y3 = (r * (v - x3) - 2 * s1 * j) % Q
    z3 = ((z1 + z2) ** 2 - z1z1 - z2z2) % Q * h % Q
    return (x3, y3, z3)


def _jac_double(p):
    if p is None:
        return None
    x1, y1, z1 = p
    if y1 == 0:
        return None
    a = x1 * x1 % Q
    b = y1 * y1 % Q
    c = b * b % Q
    d = 2 * ((x1 + b) ** 2 - a - c) % Q
    e = 3 * a % Q
    f = e * e % Q
    x3 = (f - 2 * d) % Q
    y3 = (e * (d - x3) - 8 * c) % Q
    z3 = 2 * y1 * z1 % Q
    return (x3, y3, z3)


def _jac_to_affine(p):
    if p is None or p[2] == 0:
        return None
    zi = pow(p[2], Q - 2, Q)
    zi2 = zi * zi % Q
    return (p[0] * zi2 % Q, p[1] * zi2 * zi % Q)


def msm_fast(scalars: list[int], points: list) -> "Point":
    """Host Pippenger with Jacobian adds — the fast CPU commit engine.

    ~12 bigint muls per add, no per-add inversion; used by the PLONK prover
    for commitments when the device path isn't warranted (small circuits,
    no compiled-kernel reuse).
    """
    n = len(scalars)
    if n == 0:
        return None
    c = max(4, min(13, n.bit_length()))
    nbits = 256
    w_count = -(-nbits // c)
    jac_pts = [None if p is None else (p[0], p[1], 1) for p in points]
    acc = None
    for w in range(w_count - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = _jac_double(acc)
        buckets = [None] * (1 << c)
        shift = c * w
        mask = (1 << c) - 1
        for s, p in zip(scalars, jac_pts):
            d = (s >> shift) & mask
            if d and p is not None:
                buckets[d] = _jac_add(buckets[d], p)
        running = None
        total = None
        for b in range(len(buckets) - 1, 0, -1):
            running = _jac_add(running, buckets[b])
            total = _jac_add(total, running)
        acc = _jac_add(acc, total)
    return _jac_to_affine(acc)


def random_points(rng, n: int) -> list:
    """n distinct multiples of the generator (deterministic from rng)."""
    return [scalar_mul(int(rng.integers(1, 2**62)) * int(rng.integers(1, 2**62)) + 1, GEN)
            for _ in range(n)]
