"""Pippenger multi-scalar multiplication on BN254 G1 — XLA/TPU-friendly.

Classic Pippenger does data-dependent scatter (point -> bucket), which is
hostile to a vector machine.  This reformulation keeps Pippenger's O(W*N)
addition count while exposing wide static parallelism:

1. **Signed digits**: scalars (canonical 15-bit limb arrays) are split
   on-device into W = ceil(254/c) windows of c bits, then recoded to
   [-2^(c-1), 2^(c-1)] — G1 negation is free (negate y), so this halves the
   bucket count and, with it, the scan-carry HBM traffic that dominates the
   bucket phase.
2. **Bucket accumulation**: points are partitioned into G groups; a single
   ``lax.scan`` of length M = N/G performs, per step, one *batched* complete
   EC addition over all (window, group) lanes simultaneously: lane (w, g)
   folds +-(its current point) into bucket ``|digit|-1`` of its private
   bucket array (identity for digit 0).  That is W*G EC adds per step — wide
   enough to saturate the VPU — with per-lane unique-index gather/scatter.
3. **Group reduction**: the G per-group bucket arrays are folded by an
   adjacent-pair tree under one fori_loop body (log2(G) steps).
4. **Suffix sums**: ``sum_k (k+1) S_k`` per window via a log2(B)-depth
   Hillis-Steele suffix scan + pair-fold tree of wide batched ec_adds.
5. **Window fold**: Horner over windows (c doublings + 1 add per window,
   scan-wrapped).

Total work: ~W*(N + 3*2^(c-1)*log2(B)-ish) complete additions.  Layout:
points are ``(3, 18, N)`` limb-major; buckets are ``(3, 18, W, G, 2^(c-1))``
so the EC adds batch over (W, G[, B]) on the vector lanes.  The multi-chip
variant (points sharded, per-chip partials combined with an all-gather fold)
lives in ``zkos_tpu.parallel``.

Oracle: ``curve_golden.msm`` (python ints).  This kernel implements
``Srs::commit`` / ``commit_lagrange`` (reference pins:
crates/powers-of-tau/src/lib.rs:255-263).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F


def num_windows(c: int, nbits: int = 254) -> int:
    return -(-nbits // c)


def limbs_to_digits(scalar_limbs: jax.Array, c: int) -> jax.Array:
    """(18, N) canonical 15-bit limbs -> (W, N) uint32 digits in [0, 2^c)."""
    assert 1 <= c <= 15
    w_count = num_windows(c)
    lb = F.LIMB_BITS
    n_limbs = scalar_limbs.shape[0]
    outs = []
    for w in range(w_count):
        b0 = c * w
        i0, sh = divmod(b0, lb)
        d = scalar_limbs[i0] >> sh
        if sh + c > lb and i0 + 1 < n_limbs:
            d = d | (scalar_limbs[i0 + 1] << (lb - sh))
        outs.append(d & ((1 << c) - 1))
    return jnp.stack(outs, axis=0)


def limbs_to_digits_signed(scalar_limbs: jax.Array, c: int) -> jax.Array:
    """Signed-window recoding: (18, N) limbs -> (W, N) int32 in [-2^(c-1), 2^(c-1)].

    Halves the bucket count (magnitudes 1..2^(c-1)) at the cost of a cheap
    per-window carry chain; point negation is free on G1 (negate y).  When
    c divides 254 exactly the top window has no slack bit for the final
    carry, so an extra all-zero window is appended before recoding.
    """
    d = limbs_to_digits(scalar_limbs, c).astype(jnp.int32)  # (W, N)
    if c * num_windows(c) == 254:
        d = jnp.concatenate([d, jnp.zeros_like(d[:1])], axis=0)
    half = 1 << (c - 1)
    full = 1 << c
    outs = []
    carry = jnp.zeros_like(d[0])
    for w in range(d.shape[0]):
        v = d[w] + carry
        neg = v > half
        outs.append(jnp.where(neg, v - full, v))
        carry = neg.astype(jnp.int32)
    return jnp.stack(outs, axis=0)


def _bucket_accumulate(points: jax.Array, sdigits: jax.Array, c: int, groups: int) -> jax.Array:
    """Scan-Pippenger bucket phase over signed digits.

    points: (3, 18, N) Montgomery projective; sdigits: (W, N) int32 in
    [-2^(c-1), 2^(c-1)].  Bucket index k holds magnitude k+1; zero digits
    contribute the identity.  Returns bucket sums (3, 18, W, 2^(c-1)).
    """
    w_count, n = sdigits.shape
    g = groups
    assert n % g == 0, "pad inputs to a multiple of the group count"
    m = n // g
    b_count = 1 << (c - 1)
    nl = F.N_LIMBS

    # scan xs: per step one point per group and its signed digit per window
    pts = jnp.moveaxis(points.reshape(3, nl, g, m), -1, 0)  # (M, 3, 18, G)
    dig = jnp.moveaxis(sdigits.reshape(w_count, g, m), -1, 0)  # (M, W, G)

    buckets = C.point_identity((w_count, g, b_count))  # (3, 18, W, G, B)
    w_idx = jnp.arange(w_count, dtype=jnp.int32)[:, None]
    g_idx = jnp.arange(g, dtype=jnp.int32)[None, :]
    ident_wg = C.point_identity((w_count, g))

    def body(bk, xs):
        pts_step, d_step = xs  # (3,18,G), (W,G) signed
        idx = jnp.maximum(jnp.abs(d_step), 1) - 1  # (W,G) in [0, B)
        # per-lane bucket gather/scatter: unique indices per (w, g) lane, so
        # the scatter stays vectorized; traffic per step is just the touched
        # bucket rows, not the whole array.
        cur = jnp.take_along_axis(
            bk, idx[None, None, :, :, None], axis=4)[..., 0]  # (3,18,W,G)
        # signed-digit point: negate y for negative digits, identity for 0
        base = pts_step[:, :, None, :]  # (3,18,1,G)
        y = jnp.broadcast_to(base[1], cur.shape[1:])
        y_neg = F.neg(F.FQ, F.carry_once(y), k=8)
        addend = jnp.broadcast_to(base, cur.shape)
        addend = addend.at[1].set(
            jnp.where((d_step < 0)[None], y_neg, y))
        addend = jnp.where((d_step == 0)[None, None], ident_wg, addend)
        # barriers: without them XLA fuses the gather into the ec_add limb
        # loop (recomputing it per loop step) and the ec_add into the
        # scatter — measured ~10x step cost.
        cur = jax.lax.optimization_barrier(cur)
        new = C.ec_add(cur, addend)
        new = jax.lax.optimization_barrier(new)
        bk = bk.at[:, :, w_idx, g_idx, idx].set(
            new, unique_indices=True, mode="promise_in_bounds")
        return bk, None

    buckets, _ = jax.lax.scan(body, buckets, (pts, dig))

    # tree-fold groups (axis 3) with a static-shape adjacent-pair fold: view
    # (G, B) as (G/2, 2B) so each pair is two contiguous stride-1 slices, add
    # them into the front half and pad with identity (absorbing).  Valid
    # entries always stay compacted at the front, so the same body iterates
    # under lax.fori_loop — ONE compiled ec_add instead of log2(G) copies.
    if g > 1:
        assert g & (g - 1) == 0, "group count must be a power of two"
        ident_half = C.point_identity((w_count, g // 2, b_count))

        def fold_step(_, bk):
            v = bk.reshape(3, nl, w_count, g // 2, 2 * b_count)
            summed = C.ec_add(v[..., :b_count], v[..., b_count:])
            return jnp.concatenate([summed, ident_half], axis=3)

        buckets = jax.lax.fori_loop(
            0, int(g).bit_length() - 1, fold_step, buckets)
    return buckets[:, :, :, 0]  # (3, 18, W, B)


def _suffix_weighted_sums(buckets: jax.Array) -> jax.Array:
    """sum_k (k+1)*S_k per window via suffix sums: (3,18,W,B)->(3,18,W).

    Bucket k holds digit magnitude k+1 (signed-window scheme), and
    sum_k (k+1)*S_k = sum_{j>=0} R_j where R_j = sum_{k>=j} S_k.
    Both the suffix sums and their total are computed at log2(B) depth with
    wide batched ec_adds (an O(B log B)-work Hillis-Steele suffix scan plus a
    pair-fold tree) instead of a 2(B-1)-step sequential scan — B-1 sequential
    tiny-lane steps cost far more on TPU than log2(B) full-width sweeps.
    """
    nl = F.N_LIMBS
    b_count = buckets.shape[-1]
    w_count = buckets.shape[2]
    assert b_count & (b_count - 1) == 0
    log_b = b_count.bit_length() - 1
    ident_cols = C.point_identity((w_count, b_count))
    pos = jnp.arange(b_count, dtype=jnp.uint32)

    def suffix_step(s, r):
        shift = jnp.uint32(1) << s
        rolled = jnp.roll(r, -shift.astype(jnp.int32), axis=-1)
        valid = (pos + shift < b_count)[None, None, None, :]
        shifted = jnp.where(valid, rolled, ident_cols)
        return C.ec_add(r, shifted)

    acc = jax.lax.fori_loop(0, log_b, suffix_step, buckets)
    # acc[..., j] = sum_{k >= j} S_k; pair-fold all suffixes into the total

    ident_half = C.point_identity((w_count, b_count // 2))

    def fold_step(_, a):
        v = a.reshape(3, nl, w_count, b_count // 2, 2)
        folded = C.ec_add(v[..., 0], v[..., 1])
        return jnp.concatenate([folded, ident_half], axis=-1)

    acc = jax.lax.fori_loop(0, log_b, fold_step, acc)
    return acc[..., 0]


def _fold_windows(per_window: jax.Array, c: int) -> jax.Array:
    """Horner over windows: result = sum_w 2^{cw} T_w.  (3,18,W) -> (3,18)."""
    xs = jnp.moveaxis(per_window, -1, 0)[::-1]  # (W, 3, 18), MSB window first
    ident = C.point_identity()

    def body(acc, t_w):
        acc = jax.lax.fori_loop(0, c, lambda _, r: C.ec_double(r), acc)
        return C.ec_add(acc, t_w), None

    out, _ = jax.lax.scan(body, ident, xs)
    return out


@functools.partial(jax.jit, static_argnames=("c", "groups"))
def msm_mont(points: jax.Array, scalar_limbs: jax.Array, c: int = 8,
             groups: int | None = None) -> jax.Array:
    """MSM: sum_i scalars[i] * points[i].

    points: (3, 18, N) Montgomery projective (< 2p);
    scalar_limbs: (18, N) canonical 15-bit limbs of the scalars.
    Returns a single projective point (3, 18).
    """
    n = points.shape[-1]
    if groups is None:
        # G=64 measured fastest on v5e at 2^16..2^20 (G>=256 blows the
        # bucket array past cache-friendly sizes and the group tree-fold
        # cost grows linearly in G; smaller G adds scan-latency steps)
        groups = max(1, min(64, n // 8))
        groups = 1 << (groups.bit_length() - 1)  # largest power of two <=
    pad = (-n) % groups
    if pad:
        points = jnp.concatenate(
            [points, C.point_identity((pad,))], axis=-1)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((F.N_LIMBS, pad), dtype=jnp.uint32)], axis=-1)
    sdigits = limbs_to_digits_signed(scalar_limbs, c)
    buckets = _bucket_accumulate(points, sdigits, c, groups)
    per_window = _suffix_weighted_sums(buckets)
    return _fold_windows(per_window, c)
