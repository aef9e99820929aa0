"""BN254 field arithmetic as vectorized JAX kernels (TPU VPU friendly).

Representation — lazy-reduction limbed Montgomery arithmetic, limb-major
---------------------------------------------------------------------------
A field element batch is an array of shape ``(18, *batch)`` with dtype
``uint32``: axis 0 holds 18 little-endian limbs of radix 2^15 (Montgomery
R = 2^270).  **Limbs live on the majormost axis** so the batch dimensions map
onto the TPU's 128-wide vector lanes (measured 6x faster than limb-minor on
v5e) and per-limb indexing is cheap major-axis slicing.

The radix is chosen so the kernels never need 64-bit arithmetic:

- *clean* limbs are < 2^15; *dirty* limbs may reach ~2^16 (one uncarried add
  layer); products of two dirty limbs still fit exactly in a uint32 lane;
- values are kept in a *lazy* domain: any representative ``v = x (mod p)``
  with ``v < 2^16 * p`` is legal between operations.  ``mont_mul`` accepts
  operand value bounds ``alpha*p``/``beta*p`` whenever ``alpha*beta <= 2^16``
  and always returns a value ``< 2p`` — no conditional subtractions anywhere
  on the hot path;
- full normalization to ``[0, p)`` happens only at API boundaries
  (``canon`` / ``from_mont`` / ``normalize``).

Sequential limb loops (product scan, Montgomery reduction) are
``lax.fori_loop``s over the major axis: a traced ``mont_mul`` is ~50 HLO ops
regardless of limb count — cheap to compile — and the loop-carried
dynamic slices touch whole vector tiles.  Higher layers wrap repeated calls
in ``lax.scan``.

Reference semantics reproduced (not translated): halo2curves bn256 Fr/Fq as
used throughout /root/reference (modulus limbs pinned at
crates/shielder-account/src/secrets.rs:20-25; LE wire format at
crates/type-conversions/lib.rs:40-75; Montgomery R logic visible at
crates/powers-of-tau/lib.rs:92-109).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import field_golden as golden

LIMB_BITS = golden.LIMB_BITS  # 15
N_LIMBS = golden.N_LIMBS  # 18
LIMB_MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32


def _np_limbs(x: int, n: int = N_LIMBS) -> np.ndarray:
    return np.array(golden.to_limbs(x, n=n), dtype=np.uint32)


@dataclass(frozen=True)
class FieldSpec:
    """Static per-modulus constants (host numpy; closed over by jitted fns)."""

    name: str
    p: int
    p_limbs: np.ndarray  # (18,) uint32, clean
    np0: int  # -p^{-1} mod 2^15
    r_mod_p: int  # R mod p  (Montgomery form of 1)
    r2_limbs: np.ndarray  # (18,) uint32, R^2 mod p
    one_mont: np.ndarray  # (18,) uint32, R mod p
    p_minus_2_bits: np.ndarray  # (255,) uint8, LSB first — for Fermat inversion

    @staticmethod
    def make(name: str, p: int) -> "FieldSpec":
        g = golden.GoldenField(p)
        nbits = p.bit_length() + 1
        bits = np.array([(p - 2) >> i & 1 for i in range(nbits)], dtype=np.uint8)
        return FieldSpec(
            name=name,
            p=p,
            p_limbs=_np_limbs(p),
            np0=g.np0,
            r_mod_p=g.r,
            r2_limbs=_np_limbs(g.r2),
            one_mont=_np_limbs(g.r),
            p_minus_2_bits=bits,
        )


FR = FieldSpec.make("Fr", golden.FR_MODULUS)
FQ = FieldSpec.make("Fq", golden.FQ_MODULUS)


# ---------------------------------------------------------------------------
# conversions (host side)
# ---------------------------------------------------------------------------

def to_limbs(x) -> np.ndarray:
    """Host: python int -> (18,) limbs; list of n ints -> (18, n) limbs."""
    if isinstance(x, (int, np.integer)):
        return _np_limbs(int(x))
    return np.stack([to_limbs(v) for v in x], axis=-1)


def from_limbs(a):
    """Host: (18,) -> int; (18, n) -> list of n ints (inverse of to_limbs)."""
    a = np.asarray(a)
    if a.ndim == 1:
        return golden.from_limbs(a)
    return [from_limbs(a[:, i]) for i in range(a.shape[1])]


# Pallas kernels cannot capture array constants (they become jaxpr
# constvars, which pallas_call rejects).  Kernels therefore pass the needed
# field constants in as an input ref and install a lookup here, keyed by
# the constant's canonical (18,)-limb bytes; ``const`` then returns slices
# of that ref instead of fresh NumPy literals.  See ops.msm's prefix-scan
# kernel for the pattern.
_CONST_HOOK: dict | None = None


def set_const_hook(hook: dict | None):
    global _CONST_HOOK
    _CONST_HOOK = hook


def const_key(value_or_arr) -> bytes:
    arr = (value_or_arr if isinstance(value_or_arr, np.ndarray)
           else _np_limbs(int(value_or_arr)))
    return arr.astype(np.uint32).tobytes()


def const(spec_or_int, ndim: int = 1):
    """A host int (or (18,) array) as a (18, 1, 1, ...) broadcastable array.

    Returns a NumPy array (an inline literal for jnp ops) unless a Pallas
    const hook is installed, in which case the matching input-ref slice is
    returned reshaped.
    """
    arr = spec_or_int if isinstance(spec_or_int, np.ndarray) else _np_limbs(int(spec_or_int))
    arr = arr.astype(np.uint32)
    if _CONST_HOOK is not None:
        got = _CONST_HOOK.get(arr.tobytes())
        if got is not None:
            return got.reshape((N_LIMBS,) + (1,) * (ndim - 1))
    return arr.reshape((N_LIMBS,) + (1,) * (ndim - 1))


def _pad0(x: jax.Array, before: int, after: int) -> jax.Array:
    """Pad along axis 0 only."""
    return jnp.pad(x, [(before, after)] + [(0, 0)] * (x.ndim - 1))


# ---------------------------------------------------------------------------
# limb helpers (traced); all arrays are (L, *batch)
# ---------------------------------------------------------------------------

def carry_once(t: jax.Array) -> jax.Array:
    """One vectorized carry pass: limbs become <= 2^15 + (max>>15).

    Valid for column values < 2^29; value preserved as long as it fits the
    array width (callers guarantee value < 2^(15*L)).
    """
    lo = t & LIMB_MASK
    hi = t >> LIMB_BITS
    return lo + _pad0(hi[:-1], 1, 0)


def carry_prop(t: jax.Array) -> jax.Array:
    """Full normalization of limbs to < 2^15 (sequential ripple)."""
    k = t.shape[0]
    for i in range(k - 1):
        c = t[i] >> LIMB_BITS
        t = t.at[i].set(t[i] & LIMB_MASK)
        t = t.at[i + 1].add(c)
    return t.at[k - 1].set(t[k - 1] & LIMB_MASK)


def _borrow_sub(a: jax.Array, b: jax.Array):
    """a - b limb-wise with borrow chain; a limbs clean-ish, b limbs <= ~2^16.4.

    Returns (diff (L,*batch), borrow_out (*batch,)); borrow_out == 0 iff a >= b.
    """
    k = a.shape[0]
    borrow = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), dtype=U32)
    outs = []
    for i in range(k):
        d = a[i] + (4 << LIMB_BITS) - b[i] - borrow
        outs.append(d & LIMB_MASK)
        borrow = 4 - (d >> LIMB_BITS)
    return jnp.stack(outs, axis=0), borrow


# ---------------------------------------------------------------------------
# lazy-domain operations
# ---------------------------------------------------------------------------

def align(a: jax.Array, b: jax.Array):
    """Broadcast two limb-major arrays: new batch axes insert AFTER axis 0.

    (Plain numpy broadcasting would align limbs against batch dims — always
    use this, or matching ndims, when combining field arrays.)
    """
    if a.ndim < b.ndim:
        a = a.reshape((N_LIMBS,) + (1,) * (b.ndim - a.ndim) + a.shape[1:])
    elif b.ndim < a.ndim:
        b = b.reshape((N_LIMBS,) + (1,) * (a.ndim - b.ndim) + b.shape[1:])
    return jnp.broadcast_arrays(a, b)


def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Lazy modular add: plain limb addition, no reduction (bounds add up)."""
    a, b = align(a, b)
    return a + b


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array, k: int = 4) -> jax.Array:
    """Lazy modular subtraction: a + (k*p - b), valid for value(b) < k*p.

    b's limbs must be <= ~2^16 (one dirty layer).  Output < value(a) + k*p.
    """
    a, b = align(a, b)
    kp = const(_np_limbs(k * spec.p), b.ndim)
    diff, _ = _borrow_sub(jnp.broadcast_to(kp, (N_LIMBS,) + b.shape[1:]), b)
    return a + diff


def neg(spec: FieldSpec, b: jax.Array, k: int = 4) -> jax.Array:
    """Lazy negation: k*p - b (maps any representative of 0 to a rep of 0)."""
    kp = const(_np_limbs(k * spec.p), b.ndim)
    diff, _ = _borrow_sub(jnp.broadcast_to(kp, (N_LIMBS,) + b.shape[1:]), b)
    return diff


# ---------------------------------------------------------------------------
# Montgomery multiplication (the workhorse)
# ---------------------------------------------------------------------------

import os as _os

# Kernel form selection: the statically-unrolled CIOS is fastest at runtime
# (no per-step dynamic-slice round-trips) but linear-in-ops to compile; the
# fori_loop form compiles ~20x faster.  On the 2-core CPU test environment
# XLA/LLVM compile time dominates everything, so default to the loop form
# there and the unrolled form on real accelerators.  Override with
# ZKOS_MONT_UNROLL=0/1.
_UNROLL_ENV = _os.environ.get("ZKOS_MONT_UNROLL")


def _use_unrolled() -> bool:
    if _UNROLL_ENV is not None:
        return _UNROLL_ENV == "1"
    return jax.default_backend() != "cpu"


def mont_mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a * b * R^{-1} mod p in the lazy domain.

    See ``_mont_mul_unrolled`` (runtime-optimal) and ``_mont_mul_loop``
    (compile-time-optimal); both compute the same function with identical
    limb bounds.

    Preconditions: value(a) = alpha*p, value(b) = beta*p with
    alpha*beta <= 2^16, limb columns < 2^29 (carry_once applied internally).
    Postcondition: value(out) < 2p, limbs < 2^15 + 2^9.  Shapes broadcast
    over batch axes (axis 0 is limbs).
    """
    a, b = align(a, b)
    a = carry_once(a)
    b = carry_once(b)
    n = N_LIMBS
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (n,) + batch)
    b = jnp.broadcast_to(b, (n,) + batch)
    if _use_unrolled():
        return _mont_mul_unrolled(spec, a, b)
    return _mont_mul_loop(spec, a, b)


def _mont_mul_loop(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """fori_loop CIOS: tiny HLO (one body per phase), dynamic slices.

    Same column math and bounds as ``_mont_mul_unrolled``.
    """
    n = N_LIMBS
    np0 = np.uint32(spec.np0)
    batch = a.shape[1:]
    p_col = const(spec.p_limbs, 1 + len(batch))
    pad_tail = [(0, 1)] + [(0, 0)] * len(batch)
    pad_head = [(1, 0)] + [(0, 0)] * len(batch)

    def prod_step(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=True)
        prod = ai * b  # (n, *batch)
        seg = jax.lax.dynamic_slice_in_dim(t, i, n + 1, 0)
        seg = seg + jnp.pad(prod & LIMB_MASK, pad_tail) \
                  + jnp.pad(prod >> LIMB_BITS, pad_head)
        return jax.lax.dynamic_update_slice_in_dim(t, seg, i, 0)

    t = jnp.zeros((2 * n + 1,) + batch, dtype=U32)
    t = jax.lax.fori_loop(0, n, prod_step, t)

    def red_step(i, t):
        ti = jax.lax.dynamic_index_in_dim(t, i, 0, keepdims=False)
        m = ((ti & LIMB_MASK) * np0) & LIMB_MASK
        prod = m[None] * p_col
        seg = jax.lax.dynamic_slice_in_dim(t, i, n + 1, 0)
        seg = seg + jnp.pad(prod & LIMB_MASK, pad_tail) \
                  + jnp.pad(prod >> LIMB_BITS, pad_head)
        seg = seg.at[1].add(seg[0] >> LIMB_BITS)
        return jax.lax.dynamic_update_slice_in_dim(t, seg, i, 0)

    t = jax.lax.fori_loop(0, n, red_step, t)
    return carry_once(t[n : 2 * n])


def _mont_mul_unrolled(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Limb-axis-vectorized CIOS, statically unrolled.

    Each of the 18 outer steps does whole-row vector ops on ``(18, *batch)``
    tiles with *static* slice offsets — no fori_loop / dynamic slices (their
    per-step round-trips dominated an earlier loop form on v5e), and ~8x
    fewer HLO ops than a fully scalar-unrolled schoolbook expansion (which
    made XLA-CPU compiles of composite kernels like ec_add take tens of
    minutes and multi-GB of compiler RSS).

    Column-overflow accounting (all values exact in uint32):
    - product of two carried (< 2^15.6) limbs < 2^31.2 -> split lo/hi at 15;
    - a product column then holds <= 18 los (< 2^15) + 18 his (< 2^16.2)
      < 2^21.5; reduction adds the same again plus ripple carries -> < 2^23;
    - m = (t_i & mask) * np0 masked to 15 bits is exact (operand < 2^30).

    Inputs arrive carried (< 2^15.6) and broadcast to (18, *batch).
    """
    n = N_LIMBS
    np0 = np.uint32(spec.np0)
    batch = a.shape[1:]
    p_col = const(spec.p_limbs, 1 + len(batch))  # (18, 1...)

    t = jnp.zeros((2 * n + 1,) + batch, dtype=U32)
    # product phase: row i contributes a[i] * b into columns i..i+n
    for i in range(n):
        prod = a[i][None] * b  # (18, *batch)
        t = t.at[i : i + n].add(prod & LIMB_MASK)
        t = t.at[i + 1 : i + n + 1].add(prod >> LIMB_BITS)

    # reduction phase: zero column i with m*p, ripple carry into i+1
    for i in range(n):
        m = ((t[i] & LIMB_MASK) * np0) & LIMB_MASK  # (*batch,)
        prod = m[None] * p_col  # (18, *batch)
        t = t.at[i : i + n].add(prod & LIMB_MASK)
        t = t.at[i + 1 : i + n + 1].add(prod >> LIMB_BITS)
        t = t.at[i + 1].add(t[i] >> LIMB_BITS)

    # columns 2n-1 and 2n are provably zero-carry (result < 2p < 2^255 and
    # p's top limb is zero), so the result is exactly columns n..2n-1
    return carry_once(t[n : 2 * n])


def mont_sqr(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mont_mul(spec, a, a)


def reduce2p(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Reduce a lazy value (alpha <= 2^16) to < 2p: one Montgomery mul by R."""
    return mont_mul(spec, a, const(spec.one_mont, a.ndim))


def to_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Canonical/lazy -> Montgomery domain: a * R mod p (result < 2p)."""
    return mont_mul(spec, a, const(spec.r2_limbs, a.ndim))


def normalize(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Map a value < 2p with dirty limbs to canonical [0, p) clean limbs."""
    a = carry_prop(a)
    p = jnp.broadcast_to(const(spec.p_limbs, a.ndim), a.shape)
    diff, borrow = _borrow_sub(a, p)
    return jnp.where((borrow == 0)[None], diff, a)


def from_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Montgomery -> canonical domain in [0, p): a * R^{-1} mod p."""
    one = jnp.zeros_like(a).at[0].set(1)
    return normalize(spec, mont_mul(spec, a, one))


def canon(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Fully reduce any lazy-domain value (alpha <= 2^16) to canonical [0, p)."""
    return from_mont(spec, to_mont(spec, a))


def one_mont(spec: FieldSpec, batch_shape=()) -> jax.Array:
    return jnp.broadcast_to(
        const(spec.one_mont, 1 + len(tuple(batch_shape))),
        (N_LIMBS,) + tuple(batch_shape))


def zero(spec: FieldSpec, batch_shape=()) -> jax.Array:
    return jnp.zeros((N_LIMBS,) + tuple(batch_shape), dtype=U32)


def is_zero(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Zero test for lazy values (exact; normalizes internally)."""
    return jnp.all(canon(spec, a) == 0, axis=0)


def eq(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(canon(spec, a) == canon(spec, b), axis=0)


# ---------------------------------------------------------------------------
# exponentiation / inversion (Montgomery domain, scan-based)
# ---------------------------------------------------------------------------

def mont_pow_bits(spec: FieldSpec, a: jax.Array, exp_bits: np.ndarray) -> jax.Array:
    """a^e in the Montgomery domain; e as an LSB-first uint8 bit array."""
    bits = jnp.asarray(np.asarray(exp_bits)[::-1].copy(), dtype=U32)  # MSB first
    init = one_mont(spec, a.shape[1:])

    def scan_body(acc, bit):
        acc = mont_sqr(spec, acc)
        mult = mont_mul(spec, acc, a)
        acc = jnp.where(bit == 1, mult, acc)
        return acc, None

    out, _ = jax.lax.scan(scan_body, init, bits)
    return out


def mont_inv(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Batched inversion via Fermat (a^(p-2)); maps 0 -> 0. Result < 2p."""
    return mont_pow_bits(spec, a, spec.p_minus_2_bits)
