"""Grumpkin curve + ElGamal: the anonymity-revoker crypto plane.

Grumpkin: y^2 = x^3 - 17 over BN254-Fr (the 2-cycle partner of BN254: its
base field is Fr, its scalar field is Fq) — curve equation pinned by the
reference's on-curve checks (crates/ar-cli/src/common.rs:28,
contracts/AnonymityRevoker.sol:38-59).  Because coordinates live in Fr,
Grumpkin arithmetic is *native* inside BN254 circuits — which is exactly why
the reference uses it for in-circuit viewing-key encryption.

ElGamal over Grumpkin (SURVEY.md A.4): encrypt point M to pubkey PK with
ephemeral scalar k: (C1, C2) = (k*G, M + k*PK); decrypt M = C2 - sk*C1
(crates/ar-cli/src/collect_viewing_keys.rs:130-158); the viewing key is the
x-coordinate of M.

Pure python-int golden engine; the in-circuit gadget (zkos_tpu.models)
constrains the same equations over Fr advice values.
"""

from __future__ import annotations

from . import field_golden as G

P = G.FR_MODULUS  # Grumpkin base field
SCALAR_ORDER = G.FQ_MODULUS  # Grumpkin group order (= BN254 Fq)
B = -17 % P


def is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - (x * x * x + B)) % P == 0


def sqrt_fr(a: int) -> int | None:
    """Square root in Fr (Tonelli–Shanks; S=28 two-adicity)."""
    a %= P
    if a == 0:
        return 0
    if pow(a, (P - 1) // 2, P) != 1:
        return None
    s = G.FR_TWO_ADICITY
    q = (P - 1) >> s
    z = pow(G.FR_GENERATOR, q, P)  # generator of the 2-Sylow subgroup
    m = s
    c = z
    t = pow(a, q, P)
    r = pow(a, (q + 1) // 2, P)
    while t != 1:
        i = 0
        t2 = t
        while t2 != 1:
            t2 = t2 * t2 % P
            i += 1
        b = pow(c, 1 << (m - i - 1), P)
        m = i
        c = b * b % P
        t = t * c % P
        r = r * b % P
    return r


def _gen_y() -> int:
    y = sqrt_fr(1 + B)
    assert y is not None
    return min(y, P - y)


GEN = (1, _gen_y())  # x=1 is on the curve; canonical (smaller-y) root


def neg(pt):
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % P)


def add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def scalar_mul(k: int, pt):
    k %= SCALAR_ORDER
    acc = None
    while k:
        if k & 1:
            acc = add(acc, pt)
        pt = add(pt, pt)
        k >>= 1
    return acc


def lift_x(x: int):
    """(x, y) on the curve for the given x, or None; canonical smaller y."""
    y = sqrt_fr((x * x * x + B) % P)
    if y is None:
        return None
    return (x, min(y, P - y))


# ---------------------------------------------------------------------------
# ElGamal
# ---------------------------------------------------------------------------

def generate_keys(seed_scalar: int):
    """(sk, PK = sk*G).  sk is a grumpkin scalar (mod Fq order)."""
    sk = seed_scalar % SCALAR_ORDER
    assert sk != 0
    return sk, scalar_mul(sk, GEN)


def encrypt(message_pt, pubkey, ephemeral_k: int):
    """(C1, C2) = (k*G, M + k*PK)."""
    c1 = scalar_mul(ephemeral_k, GEN)
    c2 = add(message_pt, scalar_mul(ephemeral_k, pubkey))
    return c1, c2


def decrypt(c1, c2, sk: int):
    """M = C2 - sk*C1 (ar-cli/src/collect_viewing_keys.rs:130-158)."""
    return add(c2, neg(scalar_mul(sk, c1)))
