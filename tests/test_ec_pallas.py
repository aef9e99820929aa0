"""ec_pallas kernel coverage (round-3 ADVICE): the packed-row EC prefix
scan in interpret mode vs the golden chain, and the shared rolling-CIOS
``_fq_mul`` vs the golden Montgomery multiply with dirty operands.

The Pallas kernel itself only runs on TPU (tests run on the CPU backend),
but ``interpret=True`` executes the exact kernel body — unpack, sign
negation, mixed add, accumulator scratch, output transpose — through the
Pallas interpreter, so a regression in this consensus-critical arithmetic
can no longer ship silently.
"""

import numpy as np

import jax.numpy as jnp

from zkos_tpu.ops import curve_golden as CG
from zkos_tpu.ops import curve as C
from zkos_tpu.ops import ec_pallas as EP
from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G


def _pack_rows(pts, signs):
    """Golden affine points + sign bits -> (18,) packed u32 rows per point.

    Layout (ec_pallas._unpack_xy): two 15-bit limbs per word; words 0..8
    hold x (word i = x[2i] | x[2i+1] << 15), words 9..17 hold y; bit 31 of
    word 0 carries the digit sign.
    """
    rows = []
    for p, s in zip(pts, signs):
        x = G.to_limbs(G.FQ.to_mont(p[0]))
        y = G.to_limbs(G.FQ.to_mont(p[1]))
        w = [int(x[2 * i]) | (int(x[2 * i + 1]) << 15) for i in range(9)]
        w += [int(y[2 * i]) | (int(y[2 * i + 1]) << 15) for i in range(9)]
        w[0] |= int(s) << 31
        rows.append(w)
    return np.asarray(rows, dtype=np.uint32)  # (n, 18)


def test_prefix_scan_pallas_interpret_matches_golden(rng):
    m_steps, lanes, tile = 3, 8, 4
    n = m_steps * lanes
    pts = CG.random_points(rng, n)
    signs = [int(rng.integers(0, 2)) for _ in range(n)]
    packed = _pack_rows(pts, signs)  # (n, 18)
    # xs layout: (M, 18, LANES); lane l's chunk is [l] across the M steps
    xs = jnp.asarray(packed.reshape(m_steps, lanes, 18).transpose(0, 2, 1))

    out = EP.prefix_scan_pallas(xs, tile=tile, interpret=True)
    assert out.shape == (m_steps * EP.ROW_PAD, lanes)
    out = np.asarray(out).T.reshape(lanes, m_steps, EP.ROW_PAD)
    assert (out[:, :, 54:] == 0).all()  # alignment rows stay zero
    out = out[:, :, :54].reshape(lanes, m_steps, 3, 18)

    for lane in range(lanes):
        acc = None  # golden running sum over this lane's chunk
        for j in range(m_steps):
            idx = j * lanes + lane
            q = pts[idx]
            if signs[idx]:
                q = CG.neg(q)
            acc = CG.add(acc, q)
            got = C.point_to_affine_ints(jnp.asarray(out[lane, j]))
            assert got == acc, (lane, j)


def test_fq_mul_matches_golden_with_dirty_operands(rng):
    """The rolling interleaved CIOS (shared with poseidon2_pallas) equals
    the golden Montgomery product for dirty operands in the kernel's
    actual regime: limb-wise sums of canonical values (limbs < 2^16,
    value < a few p) as produced by the lazy add/sub layers, including the
    2p - y form from ``_neg2p``."""
    p = G.FQ.p
    r_inv = pow(G.FQ.r, p - 2, p)

    def canonical():
        v = int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % p
        return np.array(G.to_limbs(v), dtype=np.uint64)

    def dirty():
        # one lazy-add layer: limbs < 2^16, value < 2p
        return canonical() + canonical()

    def neg2p():
        # _neg2p output shape: 2p - y for canonical y
        v = int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % p
        return np.array(G.to_limbs(2 * p - v), dtype=np.uint64)

    cols = [canonical() for _ in range(8)] + [dirty() for _ in range(8)] \
        + [neg2p() for _ in range(8)]
    a = np.stack(cols, axis=-1).astype(np.uint32)
    b = np.stack(cols[::-1], axis=-1).astype(np.uint32)
    got = np.asarray(EP._fq_mul(jnp.asarray(a), jnp.asarray(b)))
    for i in range(a.shape[1]):
        av = G.from_limbs(a[:, i])
        bv = G.from_limbs(b[:, i])
        want = av * bv * r_inv % p
        gv = sum(int(x) << (15 * j) for j, x in enumerate(got[:, i]))
        assert gv % p == want, i
