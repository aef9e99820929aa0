"""Evaluation domains over Fr: host-golden polynomial engine for the prover.

The 2^k multiplicative subgroup domain with the canonical omega (halo2curves
bn256::Fr GENERATOR=7, S=28 — the same omega constants the generated
verifiers embed, crates/halo2-verifier/src/lib/codegen.rs:164-171), plus the
extended coset domain used for quotient construction.

Pure python-int engine (correct, O(n log n)); the device NTT
(zkos_tpu.ops.ntt) computes the same transforms for large domains.
"""

from __future__ import annotations

from functools import lru_cache

from ..ops import field_golden as G
from ..ops import ntt as NTT

P = G.FR_MODULUS
GENERATOR = G.FR_GENERATOR  # 7
S = G.FR_TWO_ADICITY  # 28

# halo2curves bn256::Fr::DELTA = GENERATOR^(2^S): generator of the order
# (r-1)/2^S subgroup, used to tag permutation columns with distinct cosets.
DELTA = pow(GENERATOR, 1 << S, P)


def root_of_unity(n: int, inverse: bool = False) -> int:
    return NTT.root_of_unity(n, inverse=inverse)


def ntt_ints(values: list[int], inverse: bool = False) -> list[int]:
    """Iterative radix-2 NTT on python ints, natural order in/out."""
    n = len(values)
    assert n & (n - 1) == 0
    if n == 1:
        return list(values)
    a = [v % P for v in values]
    # bit-reverse
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    w_n = root_of_unity(n, inverse=inverse)
    length = 2
    while length <= n:
        w_step = pow(w_n, n // length, P)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for i in range(start, start + half):
                u, v = a[i], a[i + half] * w % P
                a[i] = (u + v) % P
                a[i + half] = (u - v) % P
                w = w * w_step % P
        length <<= 1
    if inverse:
        n_inv = pow(n, P - 2, P)
        a = [x * n_inv % P for x in a]
    return a


class Domain:
    """2^k subgroup domain + 2^(k+j) extended coset for quotient work."""

    def __init__(self, k: int, quotient_degree: int = 2):
        """quotient_degree = cs.degree() - 1 (max gate degree - 1 pieces)."""
        self.k = k
        self.n = 1 << k
        self.omega = root_of_unity(self.n)
        self.omega_inv = pow(self.omega, P - 2, P)
        # numerator degree <= d(n-1) -> d*n extended points always suffice
        j = max(1, (quotient_degree - 1).bit_length())
        self.extended_k = k + j
        self.extended_n = 1 << self.extended_k
        self.extended_omega = root_of_unity(self.extended_n)
        self.coset = GENERATOR  # zeta for the extended coset (not in subgroup)

    # -- basis conversions (lists of ints) --

    def lagrange_to_coeff(self, evals: list[int]) -> list[int]:
        assert len(evals) == self.n
        return ntt_ints(evals, inverse=True)

    def coeff_to_lagrange(self, coeffs: list[int]) -> list[int]:
        assert len(coeffs) <= self.n
        c = list(coeffs) + [0] * (self.n - len(coeffs))
        return ntt_ints(c)

    def coeff_to_extended_coset(self, coeffs: list[int]) -> list[int]:
        """Evaluate on {coset * extended_omega^i}."""
        assert len(coeffs) <= self.extended_n
        scaled = [c * pow(self.coset, i, P) % P for i, c in enumerate(coeffs)]
        scaled += [0] * (self.extended_n - len(scaled))
        return ntt_ints(scaled)

    def extended_coset_to_coeff(self, evals: list[int]) -> list[int]:
        coeffs = ntt_ints(evals, inverse=True)
        coset_inv = pow(self.coset, P - 2, P)
        return [c * pow(coset_inv, i, P) % P for i, c in enumerate(coeffs)]

    # -- point evaluation helpers --

    def vanishing_eval(self, x: int) -> int:
        """Z_H(x) = x^n - 1."""
        return (pow(x, self.n, P) - 1) % P

    def rotated_point(self, x: int, rot: int) -> int:
        """x * omega^rot (negative rotations use omega_inv)."""
        w = self.omega if rot >= 0 else self.omega_inv
        return x * pow(w, abs(rot), P) % P

    def lagrange_evals_at(self, x: int, indices: list[int]) -> dict[int, int]:
        """L_i(x) = omega^i (x^n - 1) / (n (x - omega^i)) for each i (mod n)."""
        zh = self.vanishing_eval(x)
        n_inv = pow(self.n, P - 2, P)
        out = {}
        for i in indices:
            wi = pow(self.omega, i % self.n, P)
            denom = (x - wi) % P
            out[i] = zh * wi % P * n_inv % P * pow(denom, P - 2, P) % P
        return out


def poly_eval(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def poly_mul(a: list[int], b: list[int]) -> list[int]:
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % P
    return out


def poly_divide_linear(coeffs: list[int], z: int) -> list[int]:
    """(p(X) - p(z)) / (X - z), exact synthetic division."""
    q = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % P
        q[i - 1] = acc
    return q


def lagrange_interpolate(points: list[int], values: list[int]) -> list[int]:
    """Coefficients of the unique degree-<len interpolating polynomial."""
    assert len(points) == len(values)
    out = [0] * len(points)
    for i, (xi, yi) in enumerate(zip(points, values)):
        num = [1]
        denom = 1
        for j, xj in enumerate(points):
            if i == j:
                continue
            num = poly_mul(num, [(-xj) % P, 1])
            denom = denom * (xi - xj) % P
        scale = yi * pow(denom, P - 2, P) % P
        for d, c in enumerate(num):
            out[d] = (out[d] + c * scale) % P
    return out
