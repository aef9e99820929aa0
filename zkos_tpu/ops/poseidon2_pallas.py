"""Poseidon2 t=8 permutation as a Pallas TPU kernel.

The XLA path (``poseidon2.permute``) wraps the 56 rounds in ``lax.scan``,
which spills the (18, 8, B) state to HBM between rounds.  This kernel tiles
the batch axis onto the grid and keeps the whole round chain — state,
Montgomery-multiply temporaries, round constants — resident in VMEM, so HBM
traffic is exactly one read of the inputs and one write of the digests.

Semantics are identical to ``poseidon2.permute`` / ``hash_n`` (spec:
poseidon2-solidity/generate_t8.py; SURVEY.md §A.5), and the same
lazy-Montgomery bound sketch applies (post-mix lanes < 96p, partial-round
lane sums reduced with one Montgomery multiply per round).

Mosaic restrictions shape the implementation: no captured array constants
(the modulus limbs enter as python-int scalars), no scatter-add (the CIOS
column updates use zero-pad concatenation instead of ``.at[slice].add``),
and full/partial round loops are ``fori_loop``s indexing a VMEM-resident
round-constant table so the kernel stays a few thousand ops.

Batch tiles are (18, 8, TILE_B) uint32; TILE_B=256 keeps peak VMEM use
(state + mont-mul temporaries) around 3 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from . import poseidon2 as P2

TILE_B = 256
_ME = P2._M_E_U32  # (8, 8) small ints
_NP0 = np.uint32(F.FR.np0)
_N = F.N_LIMBS
_MASK = np.uint32(F.LIMB_MASK)
_BITS = F.LIMB_BITS
_P_INTS = [int(x) for x in F.FR.p_limbs]  # scalars: legal kernel constants
_ONE_INTS = [int(x) for x in F.FR.one_mont]




def _carry_once(t):
    lo = t & _MASK
    hi = t >> _BITS
    return lo + jnp.concatenate(
        [jnp.zeros((1,) + t.shape[1:], jnp.uint32), hi[:-1]], axis=0)


def _mont_mul(a, b_or_scalars, p_scalars=_P_INTS, np0=_NP0):
    """Rolling interleaved CIOS Montgomery product, Mosaic-safe.

    ``a`` is (18, *batch) lazy Montgomery.  ``b_or_scalars`` is either a
    matching array or a list of 18 python ints (constant operand); pass
    ``p_scalars``/``np0`` of the right modulus (defaults: Fr).

    Unlike the two-phase form (product scan then reduction over a
    (2N+1)-row accumulator — every column update padded to full width), the
    interleaved CIOS reduces column 0 each outer step and *rolls* the
    (N+1)-row accumulator down one limb, so each step's adds touch N+1 rows
    instead of 2N+1 — measured ~1.7x on the v5e prefix-scan kernel.
    Bit-exact vs the two-phase form: column i's value at its reduction step
    is identical in both schedules (products a[j]*b with j<=i and
    reductions m_j*p with j<=i are all that can land there), so every m_i
    matches.

    Column bounds (exact in uint32): per step a row gains
    lo_a + hi_a + lo_mp + hi_mp < 2^15 + 2^15.1 + 2^15 + 2^15 < 2^17.1;
    a row lives N+1 = 19 steps -> < 19 * 2^17.1 < 2^21.4.  m is computed
    from t[0] & MASK (exact, t[0] < 2^21.4 fits u32), and the rolled-out
    column-0 value is ~0 mod 2^15 so ``t[0] >> 15`` captures it exactly.
    """
    a = _carry_once(a)
    const_b = isinstance(b_or_scalars, (list, tuple))
    if const_b:
        batch = a.shape[1:]
        bv = [np.uint32(x) for x in b_or_scalars]
    else:
        b = _carry_once(b_or_scalars)
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (_N,) + batch)
        b = jnp.broadcast_to(b, (_N,) + batch)

    zero_row = jnp.zeros((1,) + tuple(batch), dtype=jnp.uint32)
    t = jnp.zeros((_N + 1,) + tuple(batch), dtype=jnp.uint32)
    for i in range(_N):
        if const_b:
            prod = jnp.stack([a[i] * bv[j] for j in range(_N)], axis=0)
        else:
            prod = a[i][None] * b
        t = (t + jnp.concatenate([prod & _MASK, zero_row], axis=0)
               + jnp.concatenate([zero_row, prod >> _BITS], axis=0))
        m = ((t[0] & _MASK) * np0) & _MASK
        mp = jnp.stack([m * np.uint32(pj) for pj in p_scalars], axis=0)
        t = (t + jnp.concatenate([mp & _MASK, zero_row], axis=0)
               + jnp.concatenate([zero_row, mp >> _BITS], axis=0))
        # roll: column 0 is fully reduced (value ≡ 0 mod 2^15); divide by
        # the radix by dropping it, carrying its high bits into column 1
        t = jnp.concatenate(
            [(t[1] + (t[0] >> _BITS))[None], t[2:], zero_row], axis=0)
    return _carry_once(t[:_N])


def _pow7(x):
    x2 = _mont_mul(x, x)
    x4 = _mont_mul(x2, x2)
    return _mont_mul(_mont_mul(x4, x2), x)


def _mix(state: jax.Array) -> jax.Array:
    """M_E across the lane axis of (18, 8, TB): row sums <= 48, lazy."""
    cols = []
    for k in range(P2.T):
        row = None
        for j in range(P2.T):
            term = state[:, j] * np.uint32(int(_ME[k][j]))
            row = term if row is None else row + term
        cols.append(row[:, None])
    return jnp.concatenate(cols, axis=1)


def _kernel(x_ref, c_ref, d_ref, out_ref):
    state = x_ref[...]  # (18, 8, TB) Montgomery lazy
    d = d_ref[...]  # (18, 8)

    def full_round(r, s):
        c_r = c_ref[r]  # (18, 8) dynamic leading-axis index
        s = _pow7(s + c_r[:, :, None])
        return _mix(s)

    def partial_round(r, s):
        c0 = c_ref[r, :, 0]  # (18,)
        s0 = _pow7(s[:, 0] + c0[:, None])
        s = jnp.concatenate([s0[:, None], s[:, 1:]], axis=1)
        # explicit lane adds: Mosaic has no unsigned-integer reductions
        lane_sum = s[:, 0]
        for j in range(1, P2.T):
            lane_sum = lane_sum + s[:, j]
        tot = _mont_mul(lane_sum, _ONE_INTS)
        return _mont_mul(s, d[:, :, None]) + tot[:, None]

    state = _mix(state)
    state = jax.lax.fori_loop(0, P2._HALF_F, full_round, state)
    state = jax.lax.fori_loop(P2._HALF_F, P2._HALF_F + P2.ROUNDS_P,
                              partial_round, state)
    state = jax.lax.fori_loop(P2._HALF_F + P2.ROUNDS_P, P2.N_ROUNDS,
                              full_round, state)
    out_ref[...] = state


@functools.partial(jax.jit, static_argnames=("interpret",))
def permute_pallas(state: jax.Array, interpret: bool = False) -> jax.Array:
    """Poseidon2 permutation on Montgomery-form (18, 8, B); B % TILE_B == 0."""
    b = state.shape[-1]
    assert b % TILE_B == 0, f"batch {b} must be a multiple of {TILE_B}"
    c = jnp.asarray(P2._C_MONT, dtype=jnp.uint32)
    d = jnp.asarray(P2._D_MONT, dtype=jnp.uint32)
    grid = (b // TILE_B,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((F.N_LIMBS, P2.T, TILE_B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P2.N_ROUNDS, F.N_LIMBS, P2.T), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F.N_LIMBS, P2.T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F.N_LIMBS, P2.T, TILE_B), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(state, c, d)


def hash_n_mont_pallas(inputs_mont: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched hash of Montgomery-form (18, n, B) inputs -> (18, B)."""
    n = inputs_mont.shape[1]
    assert 1 <= n <= P2.RATE
    b = inputs_mont.shape[2]
    pad = jnp.zeros((F.N_LIMBS, P2.RATE - n, b), dtype=jnp.uint32)
    cap = jnp.broadcast_to(
        jnp.asarray(P2._CAP_MONT[n], jnp.uint32)[:, None, None],
        (F.N_LIMBS, 1, b))
    state = jnp.concatenate([inputs_mont, pad, cap], axis=1)
    return permute_pallas(state, interpret=interpret)[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hash_n_pallas(inputs: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched hash of canonical (18, n, B) inputs -> canonical (18, B)."""
    m = F.to_mont(F.FR, inputs)
    out = hash_n_mont_pallas(m, interpret=interpret)
    return F.from_mont(F.FR, out)
