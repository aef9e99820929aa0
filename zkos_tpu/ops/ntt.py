"""Radix-2 NTT / iNTT over BN254-Fr as batched JAX kernels.

Math contract (matches halo2's EvaluationDomain over bn256::Fr):
``ntt(coeffs)[i] = poly(omega^i)`` with ``omega`` the canonical primitive
n-th root of unity derived from halo2curves' ``ROOT_OF_UNITY``
(GENERATOR=7, S=28; the per-circuit omega constants embedded into generated
verifiers at crates/halo2-verifier/src/lib/codegen.rs:164-171 are these same
values).  ``intt = ntt`` with ``omega^{-1}`` plus a final ``n^{-1}`` scale —
this is halo2's ``lagrange_to_coeff`` (oracle:
crates/powers-of-tau/src/lib.rs:248-263, ``commit_lagrange == commit`` after
the round trip).

Implementation: iterative decimation-in-time on Montgomery-form limb arrays of
shape ``(n, ..., 18)`` — one bit-reversal gather, then log2(n) stages, each a
single reshape + one batched Montgomery multiply + lazy add/sub (values grow
by 2p per stage in the lazy domain, absorbed by the next multiply; the final
output is reduced to < 2p).  The whole transform traces to ~60 ops per stage
regardless of n, and the batch/limb dims vectorize on the TPU VPU.

The multi-chip variant (four-step/Bailey decomposition with all_to_all stage
exchange) lives in ``zkos_tpu.parallel.sharded_ntt``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_golden as G


def root_of_unity(n: int, inverse: bool = False) -> int:
    """Canonical primitive n-th root of unity in Fr (n a power of two)."""
    assert n & (n - 1) == 0 and n >= 1
    k = n.bit_length() - 1
    assert k <= G.FR_TWO_ADICITY
    w = pow(G.fr_root_of_unity(), 1 << (G.FR_TWO_ADICITY - k), G.FR_MODULUS)
    if inverse:
        w = G.FR.inv(w)
    return w


def bit_reverse_indices(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def pow_table_mont(spec: F.FieldSpec, w_mont: jax.Array, m: int) -> jax.Array:
    """[1, w, w^2, ..., w^{m-1}] in Montgomery form, (18, m), by doubling."""
    table = F.one_mont(spec, (1,))  # (18, 1)
    w_pow = w_mont  # (18,), w^(2^i) at step i
    size = 1
    while size < m:
        ext = F.mont_mul(spec, table, w_pow[:, None])
        table = jnp.concatenate([table, ext], axis=1)
        w_pow = F.mont_sqr(spec, w_pow)
        size *= 2
    return table[:, :m]


def ntt_mont(spec: F.FieldSpec, a: jax.Array, inverse: bool = False,
             reduce_output: bool = True) -> jax.Array:
    """NTT/iNTT on Montgomery-form values, natural order in and out.

    a: (18, n, *batch) limb-major with n a power of two, values < 2p.
    Returns evaluations (or coefficients if inverse) < 2p.
    """
    n = a.shape[1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    k = n.bit_length() - 1
    batch_shape = a.shape[2:]
    batch_ndim = len(batch_shape)
    nl = F.N_LIMBS

    w_int = root_of_unity(n, inverse=inverse)
    w_mont = jnp.asarray(F.to_limbs(G.FR.to_mont(w_int)), dtype=jnp.uint32)
    table = pow_table_mont(spec, w_mont, n // 2)  # (18, n/2)

    a = jnp.take(a, jnp.asarray(bit_reverse_indices(n)), axis=1)
    for s in range(1, k + 1):
        half = 1 << (s - 1)
        m = n >> s
        aa = a.reshape((nl, m, 2, half) + batch_shape)
        e = aa[:, :, 0]
        o = aa[:, :, 1]
        tw = table[:, :: (n >> s)]  # (18, half)
        tw = tw.reshape((nl, 1, half) + (1,) * batch_ndim)
        t = F.mont_mul(spec, o, tw)
        hi = e + t
        lo = F.sub(spec, e, t, k=2)
        a = jnp.stack([hi, lo], axis=2).reshape((nl, n) + batch_shape)
    if inverse:
        n_inv = G.FR.to_mont(G.FR.inv(n))
        a = F.mont_mul(spec, a, F.const(F.to_limbs(n_inv), a.ndim))
    elif reduce_output:
        a = F.reduce2p(spec, a)
    return a


@functools.partial(jax.jit, static_argnames=("inverse",))
def ntt(a: jax.Array, inverse: bool = False) -> jax.Array:
    """Canonical-domain NTT: (18, n, *batch) canonical limbs -> same shape."""
    am = F.to_mont(F.FR, a)
    out = ntt_mont(F.FR, am, inverse=inverse)
    return F.from_mont(F.FR, out)


def ntt_mont_large(spec: F.FieldSpec, a: jax.Array,
                   inverse: bool = False) -> jax.Array:
    """Single-chip four-step (Bailey) NTT for transforms too large for the
    monolithic radix-2 graph (the 2^24 HBM-memory-plan killer).

    n = n1*n2: row NTTs along j2, twiddle scale w_n^{j1*k2}, column NTTs
    along j1 — peak live memory ~4 matrices instead of the 24-stage chain's
    temporaries.  a: (18, n) Montgomery; returns (18, n) natural order.
    Same math as parallel.sharded.sharded_ntt_4step with the all_to_all
    removed (single device).
    """
    n = a.shape[1]
    k = n.bit_length() - 1
    n1 = 1 << (k // 2)
    n2 = n // n1
    # A[j1, j2] = a[j2*n1 + j1]
    amat = jnp.moveaxis(a.reshape(F.N_LIMBS, n2, n1), 1, 2)  # (18, n1, n2)
    b = ntt_mont(spec, jnp.moveaxis(amat, 2, 1), inverse=inverse,
                 reduce_output=False)  # NTT along j2; (18, n2, n1)
    b = jnp.moveaxis(b, 1, 2)  # (18, n1, n2)
    w_mont = jnp.asarray(
        F.to_limbs(G.FR.to_mont(root_of_unity(n, inverse=inverse))),
        dtype=jnp.uint32)
    row_heads = pow_table_mont(spec, w_mont, n1)  # (18, n1): w^{j1}
    # tw[j1, k2] = (w^{j1})^{k2}, synthesized by doubling (log2(n2) steps)
    table = F.one_mont(spec, (n1, 1))
    w_pow = row_heads[:, :, None]
    size = 1
    while size < n2:
        ext = F.mont_mul(spec, table, w_pow)
        table = jnp.concatenate([table, ext], axis=2)
        w_pow = F.mont_sqr(spec, w_pow)
        size *= 2
    c = F.mont_mul(spec, b, table[:, :, :n2])
    d = ntt_mont(spec, c, inverse=inverse, reduce_output=False)  # along j1
    return F.reduce2p(spec, d.reshape(F.N_LIMBS, n))


@functools.partial(jax.jit, static_argnames=("inverse",))
def ntt_large(a: jax.Array, inverse: bool = False) -> jax.Array:
    """Canonical-domain four-step NTT: (18, n) -> (18, n) natural order."""
    am = F.to_mont(F.FR, a)
    return F.from_mont(F.FR, ntt_mont_large(F.FR, am, inverse=inverse))


# ---------------------------------------------------------------------------
# golden model
# ---------------------------------------------------------------------------

def ntt_ints(coeffs: list[int], inverse: bool = False) -> list[int]:
    """Naive O(n^2) DFT oracle over python ints."""
    n = len(coeffs)
    w = root_of_unity(n, inverse=inverse)
    p = G.FR_MODULUS
    out = []
    for i in range(n):
        acc = 0
        wi = pow(w, i, p)
        x = 1
        for c in coeffs:
            acc = (acc + c * x) % p
            x = (x * wi) % p
        out.append(acc)
    if inverse:
        n_inv = G.FR.inv(n)
        out = [(x * n_inv) % p for x in out]
    return out
