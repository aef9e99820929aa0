"""Device polynomial engine: the TPU-resident half of the PLONK prover.

All hot polynomial work — basis conversions (NTT), extended-coset quotient
evaluation, grand products, batched inversions, point evaluations, linear
divisions and every commitment MSM — runs on device as wide limb-vector
kernels; the host keeps only the Keccak transcript, challenge derivation and
the tiny BDFG21 set bookkeeping.  The Fiat–Shamir structure forces exactly
six device->host synchronisation points per proof (one per commitment
phase); each phase is a single jitted graph.

Value representation: Montgomery-form lazy limb arrays ``(18, n[, batch])``
(see zkos_tpu.ops.field).  ``MVal`` wraps an array with its value bound
``alpha`` (value < alpha * p) so the generic expression evaluator can insert
the provably-minimal number of reductions: products auto-reduce an operand
only when alpha_a * alpha_b would exceed mont_mul's 2^16 contract, and
small-integer scalings are single vector multiplies instead of full
Montgomery products.

Reference semantics: halo2 create_proof's polynomial pipeline
(SURVEY.md §2.2/§3.1); the transcript byte flow is produced by
zkos_tpu.proof.plonk and is unchanged (host and device engines emit
byte-identical proofs for the same blinding stream).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import field_golden as G
from ..ops import msm as M
from ..ops import ntt as NTT

P = G.FR_MODULUS
FR = F.FR


# ---------------------------------------------------------------------------
# host <-> device conversions
# ---------------------------------------------------------------------------

def ints_to_device(vals, ncols: int | None = None) -> jax.Array:
    """list[int] -> (18, n) canonical limbs; list[list] -> (18, n, cols)."""
    if vals and isinstance(vals[0], (list, tuple)):
        arr = np.stack([_ints_to_np(col) for col in vals], axis=-1)
    else:
        arr = _ints_to_np(vals)
    return jnp.asarray(arr)


def _ints_to_np(col) -> np.ndarray:
    """list[int] -> (18, n) canonical limb array (bytes-vectorized)."""
    raw = b"".join((v % P).to_bytes(36, "little") for v in col)
    by = np.frombuffer(raw, dtype=np.uint8).reshape(len(col), 36)
    out = np.empty((F.N_LIMBS, len(col)), dtype=np.uint32)
    for i in range(F.N_LIMBS):
        bit0 = 15 * i
        b0 = bit0 // 8
        sh = bit0 % 8
        word = (by[:, b0].astype(np.uint32)
                | (by[:, b0 + 1].astype(np.uint32) << 8)
                | (by[:, b0 + 2].astype(np.uint32) << 16))
        out[i] = (word >> sh) & 0x7FFF
    return out


def device_to_ints(arr) -> list:
    """(18, n) canonical limbs -> list[int] (column-major for (18, n, b))."""
    a = np.asarray(arr).astype(object)
    weights = np.array([1 << (15 * i) for i in range(F.N_LIMBS)], dtype=object)
    return list(np.tensordot(weights, a, axes=(0, 0)))


# ---------------------------------------------------------------------------
# lazy-bound value wrapper
# ---------------------------------------------------------------------------

@dataclass
class MVal:
    """A Montgomery-form device value with a tracked bound value < alpha*p."""

    arr: jax.Array
    alpha: int = 2

    def _reduced(self, limit: int) -> "MVal":
        if self.alpha <= limit:
            return self
        return MVal(F.reduce2p(FR, self.arr), 2)

    def __add__(self, o: "MVal") -> "MVal":
        a, b = self, o
        if a.alpha + b.alpha > 1 << 15:
            a = a._reduced(4)
            b = b._reduced(1 << 14)
        x, y = F.align(a.arr, b.arr)
        return MVal(x + y, a.alpha + b.alpha)

    def __mul__(self, o: "MVal") -> "MVal":
        a, b = self, o
        if a.alpha * b.alpha > 1 << 16:
            if a.alpha >= b.alpha:
                a = a._reduced(max(2, (1 << 16) // b.alpha))
            if a.alpha * b.alpha > 1 << 16:
                b = b._reduced(max(2, (1 << 16) // a.alpha))
        return MVal(F.mont_mul(FR, a.arr, b.arr), 2)

    def __sub__(self, o: "MVal") -> "MVal":
        return self + o.neg()

    def neg(self) -> "MVal":
        v = self._reduced(1 << 14)
        k = 1 << max(1, (v.alpha - 1).bit_length())
        return MVal(F.neg(FR, F.carry_once(v.arr), k=k), k)

    def scale_small(self, k: int) -> "MVal":
        """Multiply by a small non-negative integer (k < 2^15)."""
        assert 0 <= k < (1 << 15)
        if k == 0:
            return MVal(jnp.zeros_like(self.arr), 1)
        if k == 1:
            return self
        v = self._reduced(max(2, (1 << 15) // k))
        return MVal(F.carry_once(F.carry_once(v.arr) * np.uint32(k)),
                    v.alpha * k)


def mval_const(value: int, ndim: int = 2) -> MVal:
    """Host int -> broadcastable Montgomery constant."""
    return MVal(F.const(F.to_limbs(G.FR.to_mont(value % P)), ndim), 1)


# ---------------------------------------------------------------------------
# wide helpers (all operate on Montgomery (18, n[, b]) arrays)
# ---------------------------------------------------------------------------

def prefix_product(a: jax.Array, exclusive: bool = False) -> jax.Array:
    """Prefix products along axis 1 via Hillis–Steele (log n wide sweeps).

    a: (18, n[, b]) Montgomery < 2p.  Returns running products < 2p.
    """
    n = a.shape[1]
    one = F.one_mont(FR, a.shape[1:])
    idx = jnp.arange(n)
    cur = a
    if exclusive:
        cur = jnp.where((idx >= 1)[None, :, None] if a.ndim == 3
                        else (idx >= 1)[None, :],
                        jnp.roll(cur, 1, axis=1), one)
    shift = 1
    while shift < n:
        mask = (idx >= shift)
        mask = mask[None, :, None] if a.ndim == 3 else mask[None, :]
        moved = jnp.where(mask, jnp.roll(cur, shift, axis=1), one)
        cur = F.mont_mul(FR, cur, moved)
        shift *= 2
    return cur


def tree_total(a: jax.Array, op) -> jax.Array:
    """Pairwise-fold reduction along axis 1 (n a power of two)."""
    n = a.shape[1]
    while n > 1:
        half = n // 2
        a = op(a[:, :half], a[:, half : 2 * half])
        n = half
    return a[:, 0]


def batch_inverse(a: jax.Array) -> jax.Array:
    """Elementwise inverse of Montgomery values along axis 1.

    One Fermat inversion of the total product (254 tiny sequential muls)
    plus two Hillis–Steele scans: inv_i = prefix_excl_i * suffix_excl_i *
    total_inv.  a: (18, n[, b]) < 2p, all nonzero; result < 2p.
    """
    assert _is_pow2(a.shape[1])
    mul = lambda x, y: F.mont_mul(FR, x, y)
    pre = prefix_product(a, exclusive=True)
    rev = jnp.flip(a, axis=1)
    suf = jnp.flip(prefix_product(rev, exclusive=True), axis=1)
    total = tree_total(a, mul)  # (18[, b])
    tinv = F.mont_inv(FR, F.reduce2p(FR, total))
    tinv = tinv[:, None, :] if a.ndim == 3 else tinv[:, None]
    return mul(mul(pre, suf), tinv)


def _is_pow2(n: int) -> bool:
    return n & (n - 1) == 0


def pow_vector(x: int, n: int, ndim_tail: int = 0) -> jax.Array:
    """[x^0 .. x^{n-1}] as (18, n[, 1]*tail) Montgomery device constants."""
    xm = jnp.asarray(F.to_limbs(G.FR.to_mont(x % P)), dtype=jnp.uint32)
    tab = NTT.pow_table_mont(FR, xm, n)  # (18, n)
    return tab.reshape(tab.shape + (1,) * ndim_tail)


def eval_at(coeffs: jax.Array, x: int) -> jax.Array:
    """Evaluate coefficient-form polys at a host point.

    coeffs: (18, n[, b]) Montgomery; returns (18[, b]) Montgomery < 2p.
    Powers-table dot + pairwise tree sum (log-depth; value bound grows one
    doubling per level, reduced midway to stay inside the lazy domain).
    """
    n = coeffs.shape[1]
    tab = pow_vector(x, n, coeffs.ndim - 2)
    terms = F.mont_mul(FR, coeffs, tab)
    level = 0
    while terms.shape[1] > 1:
        m = terms.shape[1]
        half = m // 2
        rest = terms[:, 2 * half :]
        summed = terms[:, :half] + terms[:, half : 2 * half]
        terms = jnp.concatenate([summed, rest], axis=1) if rest.shape[1] \
            else summed
        level += 1
        if level % 10 == 0:
            terms = F.reduce2p(FR, terms)
    return F.reduce2p(FR, terms[:, 0])


def divide_linear(coeffs: jax.Array, z: int) -> jax.Array:
    """(p(X) - p(z)) / (X - z) for coefficient-form polys, wide.

    q_i = z^{-(i+1)} * sum_{j>i} c_j z^j  — computed as a powers-table
    scale, a log-depth suffix-sum sweep, and an inverse-powers scale.
    coeffs: (18, n[, b]) Montgomery; returns (18, n-1[, b]) < 2p.
    """
    n = coeffs.shape[1]
    tail = coeffs.ndim - 2
    zpow = pow_vector(z, n, tail)
    g = F.mont_mul(FR, coeffs, zpow)  # (18, n[, b])
    # suffix sums S_i = sum_{j >= i} g_j via Hillis-Steele on reversed axis
    idx = jnp.arange(n)
    zero = jnp.zeros_like(g)
    cur = g
    shift = 1
    sweeps = 0
    while shift < n:
        mask = (idx + shift < n)
        mask = mask.reshape((1, n) + (1,) * tail)
        cur = cur + jnp.where(mask, jnp.roll(cur, -shift, axis=1), zero)
        shift *= 2
        sweeps += 1
        if sweeps % 10 == 0:
            cur = F.reduce2p(FR, cur)
    s_next = jnp.roll(cur, -1, axis=1)  # S_{i+1} = sum_{j > i}
    s_next = jnp.where((idx < n - 1).reshape((1, n) + (1,) * tail),
                       s_next, zero)
    zinv = pow(pow(z % P, P - 2, P), 1, P)
    zinv_pows = pow_vector(zinv, n + 1, tail)[:, 1:]  # z^{-(i+1)}
    q = F.mont_mul(FR, F.reduce2p(FR, s_next), zinv_pows)
    return q[:, : n - 1]
