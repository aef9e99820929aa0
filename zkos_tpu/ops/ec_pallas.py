"""BN254 G1 mixed addition + the MSM prefix scan as Pallas TPU kernels.

The MSM's chunked EC prefix scan (ops.msm._chunked_prefix_scan) is the
arithmetic-bound half of the bucket phase; under XLA it runs at ~0.4
effective Tu32op/s on v5e.  This kernel keeps the running accumulator in
VMEM scratch across the M sequential grid steps of each lane tile (TPU
grids execute sequentially per core) and streams the sorted points
through VMEM blocks — the same recipe that made the Poseidon2 kernel 3.5x
faster than its XLA scan.

Mosaic restrictions shape the code (cf. ops.poseidon2_pallas): no captured
array constants (modulus/curve constants enter as python-int scalars), no
scatter (CIOS column updates are zero-pad concatenations), and all field
ops are the lazy-Montgomery forms of ops.field with identical bounds —
this kernel computes bit-for-bit the same function as
curve.ec_add_mixed chained over the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from . import field_golden as G
from .poseidon2_pallas import _carry_once, _mont_mul  # Mosaic-safe CIOS

_N = F.N_LIMBS
_MASK = np.uint32(F.LIMB_MASK)
_BITS = F.LIMB_BITS

_P8_INTS = [int(x) for x in F._np_limbs(8 * F.FQ.p)]
_B3_INTS = [int(x) for x in G.to_limbs(G.FQ.to_mont(9))]
_ONE_INTS = [int(x) for x in F.FQ.one_mont]
_FQ_P_INTS = [int(x) for x in F.FQ.p_limbs]


_FQ_NP0 = np.uint32(F.FQ.np0)


def _fq_mul(a, b):
    return _mont_mul(a, b, p_scalars=_FQ_P_INTS, np0=_FQ_NP0)


def _fq_mul_b3(a):
    return _mont_mul(a, _B3_INTS, p_scalars=_FQ_P_INTS, np0=_FQ_NP0)


def _sub8p(a, b):
    """a + (8p - b): the k=8 lazy subtraction of field.sub, Mosaic-safe.

    b's limbs must be <= ~2^16 (one dirty layer), value(b) < 8p.
    """
    borrow = jnp.zeros(b.shape[1:], jnp.uint32)
    outs = []
    for i in range(_N):
        d = np.uint32(_P8_INTS[i]) + np.uint32(4 << _BITS) - b[i] - borrow
        outs.append(d & _MASK)
        borrow = np.uint32(4) - (d >> _BITS)
    return a + jnp.stack(outs, axis=0)


def ec_add_mixed_rows(x1, y1, z1, x2, y2):
    """curve.ec_add_mixed on separate coordinate arrays (18, *batch).

    Identical formula and lazy bounds (inputs < 10p, outputs X < 10p,
    Y, Z < 4p); see zkos_tpu.ops.curve.ec_add_mixed for the bound audit.
    """
    t0 = _fq_mul(x1, x2)
    t1 = _fq_mul(y1, y2)
    t3 = _fq_mul(x1 + y1, x2 + y2)
    t3 = _sub8p(t3, t0 + t1)
    t4 = _fq_mul(y2, z1) + y1
    y3 = _fq_mul(x2, z1) + x1
    x3 = t0 + t0
    t0 = x3 + t0
    t2 = _fq_mul_b3(z1)
    z3 = t1 + t2
    t1 = _sub8p(t1, t2)
    y3 = _fq_mul_b3(y3)
    x3 = _fq_mul(t4, y3)
    t2 = _fq_mul(t3, t1)
    x3 = _sub8p(t2, x3)
    y3 = _fq_mul(y3, t0)
    t1 = _fq_mul(t1, z3)
    y3 = t1 + y3
    t0 = _fq_mul(t0, t3)
    z3 = _fq_mul(z3, t4)
    z3 = z3 + t0
    return x3, y3, z3


_P2_INTS = [int(x) for x in F._np_limbs(2 * F.FQ.p)]


def _neg2p(b):
    """2p - b for canonical b (clean limbs, value < p), Mosaic-safe."""
    borrow = jnp.zeros(b.shape[1:], jnp.uint32)
    outs = []
    for i in range(_N):
        d = np.uint32(_P2_INTS[i]) + np.uint32(4 << _BITS) - b[i] - borrow
        outs.append(d & _MASK)
        borrow = np.uint32(4) - (d >> _BITS)
    return jnp.stack(outs, axis=0)


def _unpack_xy(g):
    """(18, *batch) packed rows -> (x limbs, y limbs, sign).

    Two 15-bit limbs per u32 word (x words 0..8, y words 9..17); the
    otherwise-unused bit 31 of word 0 carries the digit sign, so the
    packed rows are self-contained (no second input stream).
    """
    lo = g & _MASK
    hi = (g >> _BITS) & _MASK
    tail = g.shape[1:]
    x = jnp.stack([lo[:_N // 2], hi[:_N // 2]], axis=1).reshape((_N,) + tail)
    y = jnp.stack([lo[_N // 2:], hi[_N // 2:]], axis=1).reshape((_N,) + tail)
    return x, y, g[0] >> 31


def _prefix_kernel(xs_ref, out_ref, acc_ref):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        tile = acc_ref.shape[-1]
        zero = jnp.zeros((1, _N, tile), jnp.uint32)
        one = jnp.stack([jnp.full((tile,), np.uint32(v), jnp.uint32)
                         for v in _ONE_INTS], axis=0)[None]
        acc_ref[...] = jnp.concatenate([zero, one, zero], axis=0)

    g = xs_ref[0]   # (18, TILE) packed rows with embedded sign bit
    x2, y2, sg = _unpack_xy(g)
    y2 = jnp.where((sg != 0)[None], _neg2p(y2), y2)
    acc = acc_ref[...]
    nx, ny, nz = ec_add_mixed_rows(acc[0], acc[1], acc[2], x2, y2)
    new = jnp.stack([nx, ny, nz], axis=0)
    acc_ref[...] = new
    # emit a (ROW_PAD, tile) block per step: 54 limb rows (x|y|z) plus two
    # zero rows so the block's sublane dim is 8-aligned — Mosaic requires
    # minor block dims (8, 128)-aligned, and ROW_PAD*M x LANES allocates
    # with ZERO tile padding (a (..., 3, 18)-minor layout pads 9.5x and
    # OOMed 2^20 MSMs in round 3)
    tile = new.shape[-1]
    out_ref[...] = jnp.concatenate(
        [nx, ny, nz, jnp.zeros((ROW_PAD - 3 * _N, tile), jnp.uint32)],
        axis=0)


#: rows per scan step in the kernel output: 54 limb rows + 2 alignment rows
ROW_PAD = 56


def prefix_scan_pallas(xs: jax.Array, tile: int = 512,
                       interpret: bool = False) -> jax.Array:
    """Inclusive per-chunk EC prefix scan over PACKED sorted points.

    xs: (M, 18, LANES) 72-byte packed affine rows (canonical limbs, two
    per u32 word; bit 31 of word 0 = digit sign — y negated in-kernel).
    LANES % tile == 0.  Returns (M*56, LANES): step m's running sum for
    lane l lives at [m*56 : m*56+54, l] as (x|y|z limbs) with rows
    m*56+54..55 zero.  Both minor dims are (8, 128)-aligned, so the HBM
    allocation carries no tile padding at all (3.7% from the alignment
    rows).  Equals lax.scan of curve.ec_add_mixed over the unpacked,
    sign-applied points — unpack/negate run in VMEM, halving the
    kernel's HBM input stream vs unpacked (2, 18) coordinates.
    """
    m_steps, nl, lanes = xs.shape
    assert lanes % tile == 0
    return pl.pallas_call(
        _prefix_kernel,
        grid=(lanes // tile, m_steps),
        in_specs=[pl.BlockSpec((1, nl, tile),
                               lambda t, m: (m, 0, t),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROW_PAD, tile),
                               lambda t, m: (m, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_steps * ROW_PAD, lanes),
                                       jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3, nl, tile), jnp.uint32)],
        interpret=interpret,
    )(xs)
