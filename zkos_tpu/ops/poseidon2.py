"""Poseidon2 (t=8, alpha=7, 8 full + 48 partial rounds) over BN254-Fr.

Two implementations:

- a pure-python golden model (``permute_ints`` / ``hash_ints``) — the
  correctness oracle and the host-side hasher for protocol bookkeeping;
- a batched JAX kernel (``permute`` / ``hash_n``) on Montgomery-form
  limb-major arrays of shape ``(18, 8, B)`` (limbs, lanes, batch), with the
  partial-round block and the two full-round blocks wrapped in ``lax.scan``.
  The batch dimension B (Merkle nodes, notes, ...) rides the TPU vector lanes.

Spec source (reference): poseidon2-solidity/generate_t8.py — init sets the
capacity lane (index 7) to ``n_inputs * 2^64`` and applies the external mix
once before round 0; full rounds add per-lane constants, apply x^7 to every
lane and mix with M_E; partial rounds add a constant to lane 0 only, apply x^7
to lane 0 and set ``state[i] = D[i]*state[i] + sum(state)``; the digest is
lane 0 after the last full round.  The off-circuit ``hash::<N>`` for N < 7
(crates/shielder_bindings/src/utils.rs:14-30) zero-pads the rate lanes and
tags the capacity with N * 2^64.

Lazy-domain bound sketch: post-mix lanes < 96p; +constant < 97p; pow7's first
square has alpha*beta = 97^2 < 2^16 — fine; inside the partial block the lane
sum (< ~780p) is reduced to < 2p with one Montgomery mul per round so bounds
stay stationary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_golden as G
from .poseidon2_constants import ALPHA, C, D, M_E, ROUNDS_F, ROUNDS_P, T, CAPACITY_TAG_BASE

P = G.FR_MODULUS
RATE = T - 1  # 7
N_ROUNDS = ROUNDS_F + ROUNDS_P  # 56
_HALF_F = ROUNDS_F // 2  # 4

# ---------------------------------------------------------------------------
# golden model (python ints)
# ---------------------------------------------------------------------------


def _mix_ints(state: list[int]) -> list[int]:
    return [sum(M_E[i][j] * state[j] for j in range(T)) % P for i in range(T)]


def permute_ints(state: list[int]) -> list[int]:
    """Poseidon2 permutation on 8 field elements (pure python oracle)."""
    assert len(state) == T
    s = _mix_ints([x % P for x in state])
    for r in range(_HALF_F):
        s = [pow((x + C[T * r + i]) % P, ALPHA, P) for i, x in enumerate(s)]
        s = _mix_ints(s)
    for r in range(_HALF_F, _HALF_F + ROUNDS_P):
        s0 = pow((s[0] + C[T * r]) % P, ALPHA, P)
        s = [s0] + s[1:]
        tot = sum(s) % P
        s = [(D[i] * s[i] + tot) % P for i in range(T)]
    for r in range(_HALF_F + ROUNDS_P, N_ROUNDS):
        s = [pow((x + C[T * r + i]) % P, ALPHA, P) for i, x in enumerate(s)]
        s = _mix_ints(s)
    return s


def hash_ints(inputs: list[int]) -> int:
    """``poseidon::off_circuit::hash::<N>`` for N in 1..=7 (golden)."""
    n = len(inputs)
    assert 1 <= n <= RATE, "hash arity must be in 1..=7"
    state = [x % P for x in inputs] + [0] * (RATE - n) + [n * CAPACITY_TAG_BASE]
    return permute_ints(state)[0]


# ---------------------------------------------------------------------------
# JAX kernel — state (18, 8, B), limb-major
# ---------------------------------------------------------------------------

def _mont_np(x: int) -> np.ndarray:
    return np.array(G.to_limbs(G.FR.to_mont(x % P)), dtype=np.uint32)


# constants in Montgomery form: rounds x limbs x lanes
_C_MONT = np.stack(
    [np.stack([_mont_np(C[T * r + i]) for i in range(T)], axis=-1) for r in range(N_ROUNDS)]
)  # (56, 18, 8)
_D_MONT = np.stack([_mont_np(d) for d in D], axis=-1)  # (18, 8)
_CAP_MONT = {n: _mont_np(n * CAPACITY_TAG_BASE) for n in range(1, RATE + 1)}
_M_E_U32 = np.array(M_E, dtype=np.uint32)  # entries <= 14, row sums <= 48


def _external_mix(state: jax.Array) -> jax.Array:
    """M_E applied across the lane axis of (18, 8, B) — one lazy contraction.

    Row sums <= 48 keep limbs < 2^22 and values < 96p, absorbed by the next
    Montgomery multiply; no modular reduction needed here.
    """
    m = jnp.asarray(_M_E_U32)
    return jnp.einsum("kj,ljb->lkb", m, state)


def _pow7(x: jax.Array) -> jax.Array:
    spec = F.FR
    x2 = F.mont_sqr(spec, x)
    x4 = F.mont_sqr(spec, x2)
    return F.mont_mul(spec, F.mont_mul(spec, x4, x2), x)


def _full_round(state: jax.Array, c_round: jax.Array) -> jax.Array:
    # state (18, 8, B); c_round (18, 8)
    state = state + c_round[:, :, None]
    state = _pow7(state)
    return _external_mix(state)


def _partial_round(state: jax.Array, c0: jax.Array) -> jax.Array:
    spec = F.FR
    s0 = _pow7(state[:, 0] + c0[:, None])
    state = state.at[:, 0].set(s0)
    tot = F.reduce2p(spec, jnp.sum(state, axis=1, dtype=jnp.uint32))
    d = jnp.asarray(_D_MONT, dtype=jnp.uint32)[:, :, None]
    return F.mont_mul(spec, state, d) + tot[:, None]


def permute(state: jax.Array) -> jax.Array:
    """Poseidon2 permutation on Montgomery-form state of shape (18, 8, B)."""
    c = jnp.asarray(_C_MONT, dtype=jnp.uint32)
    state = _external_mix(state)

    def full_body(s, cr):
        return _full_round(s, cr), None

    def partial_body(s, cr):
        return _partial_round(s, cr[:, 0]), None

    state, _ = jax.lax.scan(full_body, state, c[:_HALF_F])
    state, _ = jax.lax.scan(partial_body, state, c[_HALF_F:_HALF_F + ROUNDS_P])
    state, _ = jax.lax.scan(full_body, state, c[_HALF_F + ROUNDS_P:])
    return state


def hash_n_mont(inputs_mont: jax.Array) -> jax.Array:
    """Batched Poseidon hash of Montgomery-form inputs.

    inputs_mont: (18, n, B) with 1 <= n <= 7.  Returns (18, B) Montgomery.
    """
    n = inputs_mont.shape[1]
    assert 1 <= n <= RATE
    b = inputs_mont.shape[2]
    pad = jnp.zeros((F.N_LIMBS, RATE - n, b), dtype=jnp.uint32)
    cap = jnp.broadcast_to(jnp.asarray(_CAP_MONT[n], jnp.uint32)[:, None, None],
                           (F.N_LIMBS, 1, b))
    state = jnp.concatenate([inputs_mont, pad, cap], axis=1)
    return permute(state)[:, 0]


@jax.jit
def hash_n(inputs: jax.Array) -> jax.Array:
    """Batched Poseidon hash of canonical-form inputs.

    inputs: (18, n, B) canonical limbs; returns (18, B) canonical limbs.
    Mirrors ``hash_variable_length`` (shielder_bindings/src/utils.rs:14-30).
    """
    m = F.to_mont(F.FR, inputs)
    out = hash_n_mont(m)
    return F.from_mont(F.FR, out)


def hash_n_best(inputs: jax.Array) -> jax.Array:
    """``hash_n`` routed through the fastest available engine.

    On accelerator backends this pads the batch to the Pallas tile size and
    runs the VMEM-resident kernel (measured 3.5x over the XLA scan on v5e);
    on CPU (tests) it falls back to the fused-XLA path.
    """
    if jax.default_backend() == "cpu":
        return hash_n(inputs)
    from . import poseidon2_pallas as PP

    b = inputs.shape[-1]
    pad = (-b) % PP.TILE_B
    if pad:
        inputs = jnp.concatenate(
            [inputs, jnp.zeros(inputs.shape[:-1] + (pad,), inputs.dtype)],
            axis=-1)
    out = PP.hash_n_pallas(inputs)
    return out[..., :b] if pad else out
