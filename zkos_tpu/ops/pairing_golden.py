"""Golden BN254 (alt_bn128) pairing — the host-side KZG verification oracle.

Pure python-int implementation built on the polynomial-basis extension
Fq12 = Fq[w]/(w^12 - 18 w^6 + 82), in which i = w^6 - 9 generates
Fq2 = Fq[i]/(i^2 + 1) and the sextic twist untwists via x -> x*w^2,
y -> y*w^3.  The pairing is the optimal ate pairing: Miller loop over
6u+2 (u = 4965661367192848881) with the two Frobenius correction steps,
then final exponentiation by (q^12 - 1)/r.

Used to verify device-produced KZG commitments/opens against the
verification equation of the generated Solidity verifier
(e(LHS, G2) * e(RHS, -s*G2) == 1; reference semantics at
crates/halo2-verifier/templates/Halo2Verifier.sol:204-224 — the EVM
ecPairing precompile over the same curve).  Slow (seconds/pairing) and
obviously correct; never on the hot path.
"""

from __future__ import annotations

from . import field_golden as G

Q = G.FQ_MODULUS
R_ORDER = G.FR_MODULUS

# BN parameter u: q(u) = 36u^4+36u^3+24u^2+6u+1, r(u) = 36u^4+36u^3+18u^2+6u+1
BN_U = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_U + 2

# Fq12 modulus polynomial w^12 - 18 w^6 + 82  (monic; stored as low coeffs)
_POLY_DEG = 12
_MOD_COEFFS = {0: 82, 6: -18}  # w^12 = 18 w^6 - 82


# ---------------------------------------------------------------------------
# Fq12 arithmetic (coefficient lists of length 12 over Fq)
# ---------------------------------------------------------------------------

def f12(*coeffs) -> list[int]:
    c = list(coeffs) + [0] * (_POLY_DEG - len(coeffs))
    return [x % Q for x in c]


F12_ZERO = f12()
F12_ONE = f12(1)


def f12_add(a, b):
    return [(x + y) % Q for x, y in zip(a, b)]


def f12_sub(a, b):
    return [(x - y) % Q for x, y in zip(a, b)]


def f12_scale(a, k: int):
    return [(x * k) % Q for x in a]


def f12_mul(a, b):
    t = [0] * (2 * _POLY_DEG - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                t[i + j] += x * y
    # reduce degrees 22..12 using w^12 = 18 w^6 - 82
    for d in range(2 * _POLY_DEG - 2, _POLY_DEG - 1, -1):
        c = t[d]
        if c:
            t[d] = 0
            t[d - 6] += 18 * c
            t[d - 12] -= 82 * c
    return [x % Q for x in t[:_POLY_DEG]]


def f12_neg(a):
    return [(-x) % Q for x in a]


def f12_inv(a):
    """Inverse via extended Euclid on polynomials over Fq."""
    mod = [82, 0, 0, 0, 0, 0, -18 % Q, 0, 0, 0, 0, 0, 1]  # degree 12, monic

    def deg(p):
        for i in range(len(p) - 1, -1, -1):
            if p[i] % Q:
                return i
        return -1

    def poly_divmod(num, den):
        num = [x % Q for x in num]
        dd = deg(den)
        inv_lead = pow(den[dd], Q - 2, Q)
        quot = [0] * (len(num))
        while deg(num) >= dd:
            dn = deg(num)
            c = (num[dn] * inv_lead) % Q
            quot[dn - dd] = c
            for i in range(dd + 1):
                num[dn - dd + i] = (num[dn - dd + i] - c * den[i]) % Q
        return quot, num

    # extended gcd: find s with s*a = 1 mod (modpoly)
    r0, r1 = mod[:], list(a) + [0]
    s0, s1 = [0], [1]
    while deg(r1) > 0:
        q_poly, rem = poly_divmod(r0, r1)
        r0, r1 = r1, rem
        s2 = [0] * max(len(s0), len(s1) + len(q_poly))
        for i, x in enumerate(s0):
            s2[i] = x
        for i, qq in enumerate(q_poly):
            if qq:
                for j, y in enumerate(s1):
                    s2[i + j] = (s2[i + j] - qq * y) % Q
        s0, s1 = s1, s2
    lead = r1[deg(r1)] if deg(r1) >= 0 else None
    assert lead is not None, "not invertible"
    inv_lead = pow(lead, Q - 2, Q)
    out = [(x * inv_lead) % Q for x in s1[:_POLY_DEG]]
    return out + [0] * (_POLY_DEG - len(out))


def f12_pow(a, e: int):
    out = F12_ONE
    base = a
    while e:
        if e & 1:
            out = f12_mul(out, base)
        base = f12_mul(base, base)
        e >>= 1
    return out


# ---------------------------------------------------------------------------
# Fq2 helpers (c0 + c1*i) and the twist embedding into Fq12
# ---------------------------------------------------------------------------

def fq2_embed(c0: int, c1: int) -> list[int]:
    """c0 + c1*i with i = w^6 - 9: coefficients at w^0 and w^6."""
    out = [0] * _POLY_DEG
    out[0] = (c0 - 9 * c1) % Q
    out[6] = c1 % Q
    return out


def fq2_mul(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    (a0, a1), (b0, b1) = a, b
    return ((a0 * b0 - a1 * b1) % Q, (a0 * b1 + a1 * b0) % Q)


def fq2_inv(a: tuple[int, int]) -> tuple[int, int]:
    a0, a1 = a
    d = pow(a0 * a0 + a1 * a1, Q - 2, Q)
    return ((a0 * d) % Q, (-a1 * d) % Q)


# G2 generator on the twist y^2 = x^3 + 3/(9+i) (halo2curves bn256 G2).
G2_GEN = (
    (10857046999023057135944570762232829481370756359578518086990519993285655852781,
     11559732032986387107991004021392285783925812861821192530917403151452391805634),
    (8495653923123431417604973247489272438418190587263600148770280649306958101930,
     4082367875863433681332203403145435568316851327593401208105741076214120093531),
)

G1_GEN = (1, 2)


def twist_to_f12(pt):
    """Affine G2 point over Fq2 -> affine point over Fq12 on y^2 = x^3 + 3."""
    if pt is None:
        return None
    (x0, x1), (y0, y1) = pt
    x = f12_mul(fq2_embed(x0, x1), f12(0, 0, 1))          # * w^2
    y = f12_mul(fq2_embed(y0, y1), f12(0, 0, 0, 1))       # * w^3
    return (x, y)


def g1_to_f12(pt):
    if pt is None:
        return None
    return (f12(pt[0]), f12(pt[1]))


# ---------------------------------------------------------------------------
# curve ops over Fq12 (affine, branchy — golden code)
# ---------------------------------------------------------------------------

def _ec_double(pt):
    x, y = pt
    lam = f12_mul(f12_scale(f12_mul(x, x), 3), f12_inv(f12_scale(y, 2)))
    x3 = f12_sub(f12_mul(lam, lam), f12_scale(x, 2))
    y3 = f12_sub(f12_mul(lam, f12_sub(x, x3)), y)
    return (x3, y3)


def _ec_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if f12_add(y1, y2) == F12_ZERO:
            return None
        return _ec_double(p1)
    lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    x3 = f12_sub(f12_sub(f12_mul(lam, lam), x1), x2)
    y3 = f12_sub(f12_mul(lam, f12_sub(x1, x3)), y1)
    return (x3, y3)


# ---------------------------------------------------------------------------
# Miller loop (optimal ate)
# ---------------------------------------------------------------------------

def _line(p1, p2, t):
    """Evaluate the line through p1,p2 (or tangent at p1 if equal) at t."""
    x1, y1 = p1
    xt, yt = t
    if p2 is None or p1 is None:
        raise ValueError
    x2, y2 = p2
    if x1 != x2:
        lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    elif y1 == y2:
        lam = f12_mul(f12_scale(f12_mul(x1, x1), 3), f12_inv(f12_scale(y1, 2)))
    else:  # vertical line
        return f12_sub(xt, x1)
    return f12_sub(f12_sub(yt, y1), f12_mul(lam, f12_sub(xt, x1)))


def _frob_fq2(c: tuple[int, int]) -> tuple[int, int]:
    return (c[0], (-c[1]) % Q)


def _g2_frobenius(pt):
    """q-power Frobenius on the twist: conjugate coords, multiply by twist consts."""
    (x0, x1), (y0, y1) = pt
    # gamma constants: (9+i)^((q-1)/3), (9+i)^((q-1)/2)
    xi = (9, 1)
    gx = _fq2_pow(xi, (Q - 1) // 3)
    gy = _fq2_pow(xi, (Q - 1) // 2)
    x = fq2_mul(_frob_fq2((x0, x1)), gx)
    y = fq2_mul(_frob_fq2((y0, y1)), gy)
    return (x, y)


def _fq2_pow(a: tuple[int, int], e: int) -> tuple[int, int]:
    out = (1, 0)
    base = a
    while e:
        if e & 1:
            out = fq2_mul(out, base)
        base = fq2_mul(base, base)
        e >>= 1
    return out


def miller_loop(q_pt, p_pt) -> list[int]:
    """Optimal ate Miller loop f_{6u+2,Q}(P) with Frobenius corrections.

    q_pt: G2 affine over Fq2 ((x0,x1),(y0,y1)); p_pt: G1 affine (x, y).
    Returns an Fq12 element (before final exponentiation).
    """
    if q_pt is None or p_pt is None:
        return F12_ONE
    qq = twist_to_f12(q_pt)
    pp = g1_to_f12(p_pt)
    r_acc = qq
    f = F12_ONE
    for bit in bin(ATE_LOOP_COUNT)[3:]:
        f = f12_mul(f12_mul(f, f), _line(r_acc, r_acc, pp))
        r_acc = _ec_double(r_acc)
        if bit == "1":
            f = f12_mul(f, _line(r_acc, qq, pp))
            r_acc = _ec_add(r_acc, qq)
    # Frobenius corrections: Q1 = pi(Q), Q2 = -pi^2(Q)
    q1 = _g2_frobenius(q_pt)
    q2 = _g2_frobenius(q1)
    nq2 = (q2[0], ((-q2[1][0]) % Q, (-q2[1][1]) % Q))
    q1_12 = twist_to_f12(q1)
    nq2_12 = twist_to_f12(nq2)
    f = f12_mul(f, _line(r_acc, q1_12, pp))
    r_acc = _ec_add(r_acc, q1_12)
    f = f12_mul(f, _line(r_acc, nq2_12, pp))
    return f


def final_exponentiation(f: list[int]) -> list[int]:
    return f12_pow(f, (Q ** 12 - 1) // R_ORDER)


def pairing(q_pt, p_pt) -> list[int]:
    """e(P, Q) for P in G1, Q in G2 (either None -> 1)."""
    return final_exponentiation(miller_loop(q_pt, p_pt))


def pairing_check(pairs: list[tuple]) -> bool:
    """prod e(P_i, Q_i) == 1 — the ecPairing precompile semantics.

    pairs: list of (g1_affine_or_None, g2_affine_or_None).
    One shared final exponentiation over the Miller-loop product.
    """
    acc = F12_ONE
    for p_pt, q_pt in pairs:
        if p_pt is None or q_pt is None:
            continue
        acc = f12_mul(acc, miller_loop(q_pt, p_pt))
    return final_exponentiation(acc) == F12_ONE


def g2_neg(pt):
    if pt is None:
        return None
    (x, (y0, y1)) = pt
    return (x, ((-y0) % Q, (-y1) % Q))
