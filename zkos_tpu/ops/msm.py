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
    """(18, N) canonical 15-bit limbs -> (W, N) uint32 digits in [0, 2^c).

    c <= 16: a window spans at most two 15-bit limbs (worst case
    sh = 14, c = 16 uses bits 14..29 of the pair — exactly the 30 bits
    two limbs provide)."""
    assert 1 <= c <= 16
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


# ---------------------------------------------------------------------------
# sorted prefix-scan MSM (v2) — the fast path
# ---------------------------------------------------------------------------
#
# Classic Pippenger's bucket scatter is hostile to a vector machine; the v1
# scan above keeps buckets random-access and pays a gather+scatter per step
# (measured: 5.2 s at 2^20 on v5e, ~40x off the VPU arithmetic bound).  v2
# removes ALL data-dependent memory traffic from the hot loop:
#
#   1. per window, sort the (digit magnitude, point) pairs by magnitude
#      (dense XLA sort + one gather, done once);
#   2. bucket sums become contiguous-run sums of the sorted sequence, and a
#      run sum is a difference of two *prefix* sums: S(end) - S(start-1);
#   3. prefix sums of EC points are computed with a chunked serial scan:
#      lane l owns the contiguous slice [l*M, (l+1)*M); a lax.scan of M
#      steps does one dense (W, L)-wide mixed ec_add per step — pure
#      vector arithmetic, no indexing — then a cheap two-level exclusive
#      scan over lane totals supplies the chunk offsets;
#   4. the B+1 run-boundary prefix values per window are fetched with one
#      gather, bucket sums are adjacent differences (EC sub = negate+add),
#      and the weighted sum  sum_m m * bucket_m  is computed with a
#      work-efficient two-level suffix scan (~2*W*B adds instead of
#      Hillis-Steele's W*B*log B);
#   5. the final fold over windows (sum_w 2^{cw} T_w) is ~c*W sequential
#      single-lane doublings — pure dispatch latency on an accelerator — so
#      it is done on the host in python ints (microseconds) via
#      ``fold_windows_host``.
#
# Zero-digit elements sort to the front and are *still added* into the
# prefix (affine points cannot encode the identity); they cancel exactly
# because every bucket difference spans only its own run.  Padding points
# (any valid curve point) ride along the same way with digit 0.

_SCAN_STEPS_DEFAULT = 64


def _sorted_window_inputs(points_xy: jax.Array, sdigits: jax.Array):
    """Sort each window's points by digit magnitude — PACKED output.

    points_xy: (2, 18, N) canonical-Montgomery affine; sdigits: (W, N) int32.
    Returns (packed (18, W, N) 72-byte rows — two 15-bit limbs per u32
    word, x in words 0..8, y in 9..17 — sorted_sign (W, N) uint32,
    sorted_mag (W, N) uint32).

    The point gather runs over the packed rows (TPU gathers are
    row-byte-bound; packing measured 3.9x over raw (N, 36) rows at 2^20 on
    v5e), and stays packed: the prefix-scan kernel unpacks and applies the
    sign in VMEM, so the unpacked (2, 18, W, N) array is never
    materialized in HBM.
    """
    n = points_xy.shape[-1]
    mag = jnp.abs(sdigits).astype(jnp.uint32)  # (W, N)
    order = jnp.argsort(mag, axis=-1)  # (W, N)
    sorted_mag = jnp.take_along_axis(mag, order, axis=-1)
    sorted_sign = (jnp.take_along_axis(sdigits, order, axis=-1) < 0
                   ).astype(jnp.uint32)  # (W, N)
    flat = points_xy.reshape(2 * F.N_LIMBS, n)  # canonical limbs < 2^15
    packed = (flat[0::2] | (flat[1::2] << 15)).T  # (N, 18)
    g = jnp.moveaxis(jnp.take(packed, order, axis=0), -1, 0)  # (18, W, N)
    # embed the sign in word 0's spare bit 31 (words use 30 bits) so the
    # scan kernel needs no second input stream
    g = g.at[0].set(g[0] | (sorted_sign << 31))
    return g, sorted_sign, sorted_mag


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


def _chunked_prefix_scan(packed: jax.Array, steps: int):
    """Per-lane serial EC prefix scan of the sorted (packed) points.

    packed: (18, W, N) 72-byte rows with the digit sign in word 0 bit 31.
    Lane l of window w owns the contiguous slice [l*M, (l+1)*M) with
    M = steps.  Returns
    (prefix_rows (W*L, M*56) inclusive within-chunk prefixes as
     216-byte (x|y|z limb) rows at [chunk, m*56 : m*56+54] (2 zero
     alignment columns per step) — the layout the boundary gather reads
     with one contiguous (1, 54) slice per boundary.  The kernel emits
     (M*56, LANES) with zero tile padding and one XLA transpose lands
     this layout (~2 HBM passes; the r3 (..., 3, 18)-minor layout
     tile-padded 9.5x and OOMed 2^20 MSMs) —
     and chunk_excl (3, 18, W, L), the exclusive EC prefix over chunks).

    On TPU the scan runs as the Pallas kernel (ops.ec_pallas), which keeps
    the accumulator in VMEM across the M sequential steps and unpacks the
    72-byte rows in VMEM — measured 9.2x over the lax.scan form at the
    2^20 shape on v5e, plus the halved HBM input stream from packing.
    """
    nl, w_count, n = packed.shape
    m = steps
    assert n % m == 0
    lanes = n // m
    xs = jnp.moveaxis(packed.reshape(nl, w_count, lanes, m), -1, 0)

    flat_lanes = w_count * lanes
    tile = 512
    rp = 56  # ec_pallas.ROW_PAD
    if _use_pallas() and flat_lanes % tile == 0:
        from . import ec_pallas as EP

        raw = EP.prefix_scan_pallas(
            xs.reshape(m, nl, flat_lanes), tile=tile)  # (M*56, W*L)
        prefix_rows = jnp.transpose(raw, (1, 0))       # (W*L, M*56)
    else:
        from . import ec_pallas as EP

        def body(acc, x):
            px, py, s = EP._unpack_xy(x)
            py = jnp.where((s != 0)[None], F.neg(F.FQ, py, k=2), py)
            acc = C.ec_add_mixed(acc, jnp.stack([px, py], axis=0))
            return acc, acc

        _totals, prefix = jax.lax.scan(
            body, C.point_identity((w_count, lanes)), xs)
        # (M, 3, 18, W, L) -> (W*L, M, 54) -> pad to 56 -> (W*L, M*56)
        p = jnp.transpose(prefix, (3, 4, 0, 1, 2)).reshape(
            w_count * lanes, m, 3 * nl)
        p = jnp.concatenate(
            [p, jnp.zeros((w_count * lanes, m, rp - 3 * nl), jnp.uint32)],
            axis=-1)
        prefix_rows = p.reshape(w_count * lanes, m * rp)
    totals = jnp.transpose(
        prefix_rows[:, (m - 1) * rp : (m - 1) * rp + 3 * nl].reshape(
            w_count, lanes, 3, nl), (2, 3, 0, 1))

    # exclusive scan over the L chunk totals, two-level to stay work-efficient
    l1 = 1
    while l1 * l1 < lanes:
        l1 *= 2
    m1 = lanes // l1  # lanes = l1 * m1, chunk l = (l1_idx * m1 + m1_idx)
    t2 = totals.reshape(3, nl, w_count, l1, m1)
    t2 = jnp.moveaxis(t2, -1, 0)  # (m1, 3, 18, W, l1)

    def excl_body(acc, x):
        return C.ec_add(acc, x), acc  # emit exclusive value

    sup_tot, within_excl = jax.lax.scan(
        excl_body, C.point_identity((w_count, l1)), t2)
    # exclusive scan over the l1 super-chunk totals: shift right one slot,
    # then inclusive Hillis-Steele (l1 <= ~sqrt(L), so log2(l1) cheap sweeps)
    ident = C.point_identity((w_count, l1))
    idx = jnp.arange(l1)
    cur = jnp.where((idx >= 1)[None, None, None],
                    jnp.roll(sup_tot, 1, axis=-1), ident)
    shift = 1
    while shift < l1:
        moved = jnp.where((idx >= shift)[None, None, None],
                          jnp.roll(cur, shift, axis=-1), ident)
        cur = C.ec_add(cur, moved)
        shift *= 2
    # chunk_excl[l1_idx*m1 + m1_idx] = sup_excl[l1_idx] + within_excl
    chunk_excl = C.ec_add(jnp.repeat(cur, m1, axis=-1),
                          jnp.moveaxis(within_excl, 0, -1).reshape(
                              3, nl, w_count, lanes))
    return prefix_rows, chunk_excl


def _boundary_prefix(prefix_rows: jax.Array, chunk_excl: jax.Array,
                     boundaries: jax.Array):
    """Global prefix values S(E-1) at run boundaries.

    prefix_rows: (W*L, M*56) point rows from the scan (54 limb columns +
    2 alignment columns per step); chunk_excl: (3, 18, W, L);
    boundaries: (W, B+1) uint32 element counts E (S(-1) = identity).
    Returns (3, 18, W, B+1).

    ONE contiguous 216-byte (1, 54) gather slice per boundary instead of
    54 element gathers (TPU gathers are row-bound; measured ~8x on the
    boundary phase at 2^19).
    """
    from .ec_pallas import ROW_PAD

    nl, w_count, lanes = chunk_excl.shape[1:]
    m = prefix_rows.shape[1] // ROW_PAD
    j = jnp.maximum(boundaries, 1) - 1  # clamp; E==0 handled below
    lane = (j // m).astype(jnp.int32)
    pos = (j % m).astype(jnp.int32)
    w_idx = jnp.arange(w_count, dtype=jnp.int32)[:, None]
    start = jnp.stack([(w_idx * lanes + lane).reshape(-1),
                       (pos * ROW_PAD).reshape(-1)], axis=-1)
    within = jax.lax.gather(
        prefix_rows, start,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1)),
        slice_sizes=(1, 3 * nl), mode=jax.lax.GatherScatterMode.CLIP)
    within = jnp.transpose(
        within.reshape(w_count, -1, 3, nl), (2, 3, 0, 1))  # (3, nl, W, B+1)
    base_rows = jnp.transpose(chunk_excl, (2, 3, 0, 1)).reshape(
        w_count, lanes, 3 * nl)
    base = jax.vmap(lambda mat, ix: jnp.take(mat, ix, axis=0))(base_rows, lane)
    base = jnp.transpose(base.reshape(w_count, -1, 3, nl), (2, 3, 0, 1))
    s = C.ec_add(base, within)
    ident = C.point_identity(boundaries.shape)
    return jnp.where((boundaries == 0)[None, None], ident, s)


def _bucket_boundaries(mag: jax.Array, b: int) -> jax.Array:
    """E_m = #elements with magnitude < m, for m = 1..b+1 — MXU histogram.

    mag: (W, N) uint32 in [0, b].  A vmapped searchsorted costs
    log2(N) * W * (b+1) element gathers (measured 300+ ms at c=16, 2^19);
    instead, count: split each magnitude into (coarse, fine) = (m >> 7,
    m & 127), one-hot both halves per 2048-element chunk, and contract the
    chunk axis on the MXU — hist[w, coarse, fine] accumulates exactly in
    f32 (counts < 2^24), and the boundary array is its flat cumsum.
    """
    w, n = mag.shape
    fine = 128
    chunk = min(2048, n)
    pad = (-n) % chunk
    if pad:
        # sentinel b+1 lands at flat slot b+1, outside the e[:, :b+1] slice,
        # so padded rows never affect any boundary count
        mag = jnp.concatenate(
            [mag, jnp.full((w, pad), b + 1, mag.dtype)], axis=1)
        n += pad
    coarse = -(-(b + 2) // fine)
    mg = jnp.moveaxis(mag.reshape(w, n // chunk, chunk), 1, 0)  # (K, W, ch)
    f_iota = jnp.arange(fine, dtype=jnp.uint32)
    c_iota = jnp.arange(coarse, dtype=jnp.uint32)

    def body(hist, mg_k):
        f_oh = ((mg_k[..., None] & (fine - 1)) == f_iota).astype(jnp.bfloat16)
        c_oh = (mg_k[..., None] >> 7 == c_iota).astype(jnp.bfloat16)
        part = jnp.einsum("wnc,wnf->wcf", c_oh, f_oh,
                          preferred_element_type=jnp.float32)
        return hist + part, None

    hist = jnp.zeros((w, coarse, fine), jnp.float32)
    hist, _ = jax.lax.scan(body, hist, mg)
    e = jnp.cumsum(hist.reshape(w, coarse * fine), axis=-1)
    return e[:, : b + 1].astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("c", "steps"))
def msm_window_sums(points_xy: jax.Array, scalar_limbs: jax.Array,
                    c: int = 13, steps: int | None = None) -> jax.Array:
    """Per-window weighted bucket sums T_w: the device side of the MSM.

    points_xy: (2, 18, N) canonical Montgomery affine G1 points (no
    identities); scalar_limbs: (18, N) canonical 15-bit limbs.
    Returns (3, 18, W) lazy projective points with
    result = sum_w 2^{cw} T_w (fold on host via ``fold_windows_host`` or on
    device via ``_fold_windows``).
    """
    n = points_xy.shape[-1]
    if steps is None:
        steps = min(_SCAN_STEPS_DEFAULT, max(1, n // 2048))
    # round the lane count up to a power of two (the two-level lane-offset
    # scan needs l1 | lanes); pad with digit-0 points, which cancel
    lanes = -(-n // steps)
    lanes = 1 << (lanes - 1).bit_length()
    pad = lanes * steps - n
    if pad:
        # pad with copies of point 0 under digit 0: they sort into the
        # magnitude-0 run and cancel in the bucket differences
        points_xy = jnp.concatenate(
            [points_xy, jnp.broadcast_to(points_xy[:, :, :1],
                                         (2, F.N_LIMBS, pad))], axis=-1)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((F.N_LIMBS, pad), jnp.uint32)], axis=-1)
        n += pad
    sdigits = limbs_to_digits_signed(scalar_limbs, c)  # (W, N)
    return _window_sums_sorted(points_xy, sdigits, c, steps)


@functools.partial(jax.jit, static_argnames=("c", "steps"))
def msm_window_sums_batch(points_xy: jax.Array, scalar_batch: jax.Array,
                          c: int = 13,
                          steps: int | None = None) -> jax.Array:
    """B independent MSMs against ONE shared point table, as one kernel.

    scalar_batch: (B, 18, N) canonical limbs.  Returns (B, 3, 18, W).

    The window axis of the sorted-scan pipeline is already a batch of
    independent lanes, so the B scalar vectors simply become B*W windows
    in a single pass — NEVER ``jax.vmap`` the single-MSM form: the Pallas
    prefix-scan kernel keeps its running accumulator in VMEM scratch
    across sequential grid steps, and a vmapped (appended) grid dimension
    interleaves batch elements through that scratch, silently corrupting
    every commitment (off-curve points out of the device engine on TPU).
    """
    bsz, _, n = scalar_batch.shape
    if steps is None:
        steps = min(_SCAN_STEPS_DEFAULT, max(1, n // 2048))
    lanes = -(-n // steps)
    lanes = 1 << (lanes - 1).bit_length()
    pad = lanes * steps - n
    if pad:
        points_xy = jnp.concatenate(
            [points_xy, jnp.broadcast_to(points_xy[:, :, :1],
                                         (2, F.N_LIMBS, pad))], axis=-1)
        scalar_batch = jnp.concatenate(
            [scalar_batch,
             jnp.zeros((bsz, F.N_LIMBS, pad), jnp.uint32)], axis=-1)
        n += pad
    digs = jax.vmap(lambda s: limbs_to_digits_signed(s, c))(scalar_batch)
    w = digs.shape[1]
    sdigits = digs.reshape(bsz * w, n)
    t = _window_sums_sorted(points_xy, sdigits, c, steps)  # (3, 18, B*W)
    return jnp.moveaxis(t.reshape(3, F.N_LIMBS, bsz, w), 2, 0)


def _window_sums_sorted(points_xy: jax.Array, sdigits: jax.Array, c: int,
                        steps: int) -> jax.Array:
    """Shared sorted-scan pipeline over a (W, N) window-of-digits batch."""
    w_count = sdigits.shape[0]
    b = 1 << (c - 1)

    packed, _sorted_sign, _sorted_mag = _sorted_window_inputs(
        points_xy, sdigits)
    prefix, chunk_excl = _chunked_prefix_scan(packed, steps)
    # run boundaries: E_m = #elements with magnitude < m, for m = 1..B+1
    bounds = _bucket_boundaries(jnp.abs(sdigits).astype(jnp.uint32), b)
    s_at = _boundary_prefix(prefix, chunk_excl, bounds)  # (3, 18, W, B+1)
    # Abel summation: with P_m = prefix at boundary E_m (s_at[m-1]) and
    # bucket m = P_{m+1} - P_m,
    #   T_w = sum_m m * bucket_m = B * P_{B+1} - sum_{m=1..B} P_m
    # — no bucket differences and no weighted suffix machinery: one
    # log-depth pair-fold of the B boundary points plus log2(B) doublings
    # (~3x fewer EC adds than diff + two-level weighted suffix scans).
    top = s_at[..., -1]
    for _ in range(b.bit_length() - 1):
        top = C.ec_add(top, top)  # * B (B = 2^(c-1))
    rest = s_at[..., :-1]
    k = b
    while k > 1:
        rest = C.ec_add(rest[..., : k // 2], rest[..., k // 2 : k])
        k //= 2
    return C.ec_add(top, C.ec_neg(rest[..., 0]))


def fold_windows_dev(wsums_batch: jax.Array, c: int) -> jax.Array:
    """Batched device Horner over windows: (B, 3, 18, W) -> (3, 18, B).

    c*W sequential ec_double/ec_add steps, each batched over the B
    commitments — traced INSIDE the caller's phase graph, so the per-
    commitment window fold costs no host dispatch at all (the host-side
    fold was ~40 ms/commitment of python EC math, times every commitment
    of every proof phase).
    """
    per_window = jnp.moveaxis(wsums_batch, 0, -1)  # (3, 18, W, B)
    xs = jnp.moveaxis(per_window, 2, 0)[::-1]      # (W, 3, 18, B)
    ident = C.point_identity((wsums_batch.shape[0],))

    def body(acc, t_w):
        acc = jax.lax.fori_loop(0, c, lambda _, r: C.ec_double(r), acc)
        return C.ec_add(acc, t_w), None

    out, _ = jax.lax.scan(body, ident, xs)
    return out


def fold_windows_host(window_sums, c: int):
    """Host fold: sum_w 2^{cw} T_w over python ints -> affine point or None.

    ~c*W doublings of a single point: microseconds on host, but hundreds of
    dispatch-latency-bound single-lane steps on the accelerator.
    """
    from . import curve_golden as CG

    pts = C.point_to_affine_ints(window_sums)  # list of affine/None
    acc = None
    for t_w in reversed(pts):
        for _ in range(c):
            acc = CG.add(acc, acc)
        acc = CG.add(acc, t_w)
    return acc


def msm_affine_ints(points_xy: jax.Array, scalar_limbs: jax.Array,
                    c: int = 13, steps: int | None = None):
    """Full MSM: device window sums + host fold -> affine int point."""
    return fold_windows_host(msm_window_sums(points_xy, scalar_limbs,
                                             c=c, steps=steps), c)


def points_to_affine_limbs(pts) -> np.ndarray:
    """Host: list of golden affine (x, y) int points -> (2, 18, n) canonical
    Montgomery limbs for ``msm_window_sums`` (identities not representable)."""
    from . import field_golden as G

    cols = []
    for p in pts:
        assert p is not None, "affine MSM tables cannot hold the identity"
        cols.append([G.to_limbs(G.FQ.to_mont(p[0])),
                     G.to_limbs(G.FQ.to_mont(p[1]))])
    return np.asarray(cols, dtype=np.uint32).transpose(1, 2, 0)


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
