"""BN254 G1 point arithmetic as branchless batched JAX kernels.

Points are homogeneous projective (X : Y : Z) over Fq in Montgomery form,
stored limb-major as arrays of shape ``(3, 18, *batch)`` (coordinate axis 0,
limb axis 1, batch on the vector lanes).  The group law is the
Renes–Costello–Batina *complete* addition for short-Weierstrass curves with
a = 0 (Alg. 7, 12M + 2m_b3 + 19a): one formula covers add, double, identity
and inverse cases with no data-dependent control flow — exactly what an
XLA/TPU kernel wants (no divergence, pure vector math).

Identity is (0 : 1 : 0).  Lazy-domain bounds are tracked per temporary; all
subtractions use k=8 (valid for any operand < 8p, which holds throughout for
inputs < 8p; outputs are reduced to < 2p).

Oracle: ``curve_golden`` (branchy affine python ints).  Reference semantics:
halo2curves bn256 G1 as consumed by crates/powers-of-tau (SRS points) and the
MSM commitments pinned by Srs::commit (powers-of-tau/src/lib.rs:255-263).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_golden as G

FQ = F.FQ
B3 = 9  # 3*b for y^2 = x^3 + 3

_B3_MONT = np.array(G.to_limbs(G.FQ.to_mont(B3)), dtype=np.uint32)


def point_identity(batch_shape=()) -> jax.Array:
    """(0 : 1 : 0) in Montgomery form, shape (3, 18, *batch)."""
    x = F.zero(FQ, batch_shape)
    y = F.one_mont(FQ, batch_shape)
    z = F.zero(FQ, batch_shape)
    return jnp.stack([x, y, z], axis=0)


def point_from_affine_ints(pts) -> np.ndarray:
    """Host: list of golden affine points (or None) -> (3, 18, n) Montgomery."""
    cols = []
    for p in pts:
        if p is None:
            cols.append([G.to_limbs(0), G.to_limbs(G.FQ.r), G.to_limbs(0)])
        else:
            cols.append([G.to_limbs(G.FQ.to_mont(p[0])),
                         G.to_limbs(G.FQ.to_mont(p[1])),
                         G.to_limbs(G.FQ.r)])
    return np.asarray(cols, dtype=np.uint32).transpose(1, 2, 0)


def point_to_affine_ints(pt_arr) -> list:
    """Host: (3, 18[, n]) Montgomery projective -> golden affine points/None.

    Accepts any lazy representative (< 2^16 p) with dirty limbs: the
    weighted limb sum is exact for ANY uint32 limb values (the limb array
    represents sum a_i 2^{15 i} whether or not limbs are canonical), so
    the whole conversion runs in pure python-int arithmetic.  No jax ops:
    the previous per-element eager normalize dispatched ~21k primitive
    binds per (3, 18, 24) fold — ~4 s on CPU and a device round-trip per
    op through the TPU tunnel, which dominated every commitment phase of
    the prover (fold_windows_host's python EC math itself costs ~1 ms).
    """
    arr = np.asarray(pt_arr)
    single = arr.ndim == 2
    if single:
        arr = arr[:, :, None]
    weights = np.array([1 << (15 * i) for i in range(F.N_LIMBS)],
                       dtype=object)
    vals = np.tensordot(weights, arr.astype(object), axes=(0, 1))  # (3, n)
    p = G.FQ_MODULUS
    n = vals.shape[1]
    xyz = [[G.FQ.from_mont(int(vals[c, i]) % p) for c in range(3)]
           for i in range(n)]
    # Montgomery batch inversion of the nonzero z's: one Fermat inversion
    # + 3 mulmods per point instead of one ~1.2 ms inversion per point
    nz = [i for i in range(n) if xyz[i][2]]
    acc, prefix = 1, []
    for i in nz:
        prefix.append(acc)
        acc = acc * xyz[i][2] % p
    inv_acc = G.FQ.inv(acc) if nz else 1
    zinv = {}
    for j in range(len(nz) - 1, -1, -1):
        i = nz[j]
        zinv[i] = inv_acc * prefix[j] % p
        inv_acc = inv_acc * xyz[i][2] % p
    out = []
    for i in range(n):
        x, y, z = xyz[i]
        if z == 0:
            out.append(None)
        else:
            zi = zinv[i]
            out.append(((x * zi) % p, (y * zi) % p))
    return out[0] if single else out


def ec_add(p: jax.Array, q: jax.Array) -> jax.Array:
    """Complete projective addition (RCB Alg. 7, a=0).  Fully batched.

    p, q: (3, 18, *batch) Montgomery-form lazy-domain coordinates (< 10p).
    Returns (3, 18, *batch) with X < 10p, Y < 4p, Z < 4p — a lazy fixed
    point (outputs are valid inputs), so chained additions never pay a
    reduction.  Bound audit (values in units of p, k=8 subtractions, and
    mont_mul's alpha*beta <= 2^16 contract): with inputs < 10p the largest
    product is (x1+y1)(x2+y2) at 20*20 = 400 and the largest sub operand is
    t0+t1 < 4p < 8p; every mont_mul output is < 2p, so X = sub(t2, x3) < 10p
    and Y, Z (mul + add) < 4p.
    """
    s = FQ
    mul = lambda a, b: F.mont_mul(s, a, b)
    add = lambda a, b: a + b
    sub = lambda a, b: F.sub(s, a, b, k=8)

    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2, z2 = q[0], q[1], q[2]
    b3 = F.const(_B3_MONT, x1.ndim)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))          # x1y2 + x2y1
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))          # y1z2 + y2z1
    x3 = mul(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))          # x1z2 + x2z1
    x3 = add(t0, t0)
    t0 = add(x3, t0)                   # 3*t0
    t2 = mul(b3, t2)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add(z3, t0)
    return jnp.stack([x3, y3, z3], axis=0)


def ec_add_mixed(p: jax.Array, q_affine: jax.Array) -> jax.Array:
    """Complete mixed addition: projective p + affine q (RCB Alg. 7, Z2=1).

    p: (3, 18, *batch) lazy coords (< 10p, any representative incl. the
    identity (0:1:0)); q_affine: (2, 18, *batch) canonical Montgomery affine
    coordinates of real curve points (affine cannot encode the identity).
    Specializing Z2 = 1 saves one full mul (t2 = z1) and turns two pair-muls
    into single muls: 13 mont_muls vs ec_add's 14.  Same output bounds as
    ``ec_add`` (X < 10p, Y < 4p, Z < 4p); valid for accumulator values up to
    8192p (the binding constraint is mul((x1+y1) < 2A, (x2+y2) < 4)).
    """
    s = FQ
    mul = lambda a, b: F.mont_mul(s, a, b)
    sub = lambda a, b: F.sub(s, a, b, k=8)

    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2 = q_affine[0], q_affine[1]
    b3 = F.const(_B3_MONT, x1.ndim)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = mul(x1 + y1, x2 + y2)
    t3 = sub(t3, t0 + t1)              # x1y2 + x2y1
    t4 = mul(y2, z1) + y1              # y1*1 + y2z1
    y3 = mul(x2, z1) + x1              # x1*1 + x2z1
    x3 = t0 + t0
    t0 = x3 + t0                       # 3*t0
    t2 = mul(b3, z1)                   # b3 * z1z2
    z3 = t1 + t2
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = t1 + y3
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = z3 + t0
    return jnp.stack([x3, y3, z3], axis=0)


def ec_double(p: jax.Array) -> jax.Array:
    return ec_add(p, p)


def ec_neg(p: jax.Array) -> jax.Array:
    return jnp.stack([p[0], F.neg(FQ, F.carry_once(p[1]), k=8), p[2]], axis=0)


def ec_select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """where(mask, a, b) with mask shaped (*batch,) matching point batch dims."""
    return jnp.where(mask[None, None], a, b)


def ec_scalar_mul_bits(p: jax.Array, bits: jax.Array) -> jax.Array:
    """Double-and-add: bits (nbits,) LSB-first uint32 array (per-batch shared)."""
    bits_msb = bits[::-1]

    def body(acc, bit):
        acc = ec_double(acc)
        added = ec_add(acc, p)
        acc = ec_select(jnp.broadcast_to(bit == 1, acc.shape[2:]), added, acc)
        return acc, None

    init = point_identity(p.shape[2:])
    out, _ = jax.lax.scan(body, init, bits_msb)
    return out


def ec_is_identity(p: jax.Array) -> jax.Array:
    return F.is_zero(FQ, p[2])


def ec_eq(p: jax.Array, q: jax.Array) -> jax.Array:
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (plus identity)."""
    s = FQ
    xe = F.eq(s, F.mont_mul(s, p[0], q[2]), F.mont_mul(s, q[0], p[2]))
    ye = F.eq(s, F.mont_mul(s, p[1], q[2]), F.mont_mul(s, q[1], p[2]))
    both_id = ec_is_identity(p) & ec_is_identity(q)
    one_id = ec_is_identity(p) ^ ec_is_identity(q)
    return (xe & ye & ~one_id) | both_id
