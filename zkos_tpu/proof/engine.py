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
import os
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


def _mesh_put(arr, mesh, axis: int = 1):
    """Place ``arr`` on the mesh, sharded along ``axis`` when divisible.

    The device engine is mesh-agnostic: phase graphs are plain jit
    functions, and GSPMD partitions them from the input shardings laid
    down here (rows of the evaluation/extended domain across the data
    axis), inserting the collectives (all-to-alls for the NTT
    transposes, psums for the MSM window reductions) itself.  Arrays too
    small to split (challenge scalars, blinding tails) are replicated.
    """
    if mesh is None or arr is None:
        return arr
    from jax.sharding import NamedSharding, PartitionSpec

    name = mesh.axis_names[0]
    nd = mesh.shape[name]
    spec = [None] * arr.ndim
    if arr.ndim > axis and arr.shape[axis] % nd == 0 and arr.shape[axis] >= nd:
        spec[axis] = name
    return jax.device_put(arr, NamedSharding(mesh, PartitionSpec(*spec)))


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
    return eval_at_dev(coeffs, _mont_scalar(x))


def pow_vector_dev(z_mont: jax.Array, n: int, ndim_tail: int = 0) -> jax.Array:
    """[z^0 .. z^{n-1}] from a device Montgomery scalar (18,)."""
    tab = NTT.pow_table_mont(FR, z_mont, n)
    return tab.reshape(tab.shape + (1,) * ndim_tail)


def divide_linear_dev(coeffs: jax.Array, z_mont: jax.Array,
                      zinv_mont: jax.Array) -> jax.Array:
    """(p(X) - p(z)) / (X - z) for coefficient-form polys, wide.

    q_i = z^{-(i+1)} * sum_{j>i} c_j z^j  — a powers-table scale, a
    log-depth suffix-sum sweep, and an inverse-powers scale.
    coeffs: (18, n[, b]) Montgomery; z_mont/zinv_mont: (18,) Montgomery
    scalar and its inverse (z != 0).  Returns (18, n-1[, b]) < 2p.
    """
    n = coeffs.shape[1]
    tail = coeffs.ndim - 2
    zpow = pow_vector_dev(z_mont, n, tail)
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
    zinv_pows = pow_vector_dev(zinv_mont, n + 1, tail)[:, 1:]  # z^{-(i+1)}
    q = F.mont_mul(FR, F.reduce2p(FR, s_next), zinv_pows)
    return q[:, : n - 1]


def divide_linear(coeffs: jax.Array, z: int) -> jax.Array:
    """Host-point convenience wrapper around ``divide_linear_dev``."""
    zm = _mont_scalar(z)
    zim = _mont_scalar(pow(z % P, P - 2, P))
    return divide_linear_dev(coeffs, zm, zim)


def _mont_scalar(v: int) -> jax.Array:
    return jnp.asarray(F.to_limbs(G.FR.to_mont(v % P)), dtype=jnp.uint32)


def eval_at_dev(coeffs: jax.Array, z_mont: jax.Array) -> jax.Array:
    """Like ``eval_at`` but with a device Montgomery point (18,)."""
    n = coeffs.shape[1]
    tab = pow_vector_dev(z_mont, n, coeffs.ndim - 2)
    terms = F.mont_mul(FR, coeffs, tab)
    level = 0
    while terms.shape[1] > 1:
        half = terms.shape[1] // 2
        rest = terms[:, 2 * half :]
        summed = terms[:, :half] + terms[:, half : 2 * half]
        terms = jnp.concatenate([summed, rest], axis=1) if rest.shape[1] \
            else summed
        level += 1
        if level % 10 == 0:
            terms = F.reduce2p(FR, terms)
    return F.reduce2p(FR, terms[:, 0])


# ---------------------------------------------------------------------------
# device expression evaluator (quotient numerator rows)
# ---------------------------------------------------------------------------

def eval_expr_device(e, ctx, memo: dict) -> MVal:
    """Evaluate a plonk.Expr DAG over device vectors with CSE.

    Expression nodes are frozen dataclasses, so syntactically identical
    subtrees (e.g. the S-box cubes shared by all 16 full-round constraints)
    hash equal and are computed once.  Small integer scalings (|k| < 2^15,
    covering the Poseidon2 mixing matrices and bit weights) are single
    vector multiplies instead of full Montgomery products.
    """
    from . import plonk as pl

    if e in memo:
        return memo[e]
    if isinstance(e, pl.Constant):
        out = mval_const(e.value, ctx.ndim)
    elif isinstance(e, pl.Fixed):
        out = ctx.fixed(e.index, e.rot)
    elif isinstance(e, pl.Advice):
        out = ctx.advice(e.index, e.rot)
    elif isinstance(e, pl.Instance):
        out = ctx.instance()
    elif isinstance(e, pl.Sum):
        out = eval_expr_device(e.a, ctx, memo) + eval_expr_device(e.b, ctx, memo)
    elif isinstance(e, pl.Prod):
        out = eval_expr_device(e.a, ctx, memo) * eval_expr_device(e.b, ctx, memo)
    elif isinstance(e, pl.Scaled):
        v = eval_expr_device(e.e, ctx, memo)
        k = e.k % P
        if k < (1 << 15):
            out = v.scale_small(k)
        elif P - k < (1 << 15):
            out = v.scale_small(P - k).neg()
        else:
            out = v * mval_const(k, ctx.ndim)
    else:
        raise TypeError(e)
    memo[e] = out
    return out


@dataclass
class DeviceQuotientCtx:
    """Extended-coset column accessors for the quotient evaluator."""

    fixed: object      # (i, rot) -> MVal (18, ext_n)
    advice: object
    instance: object   # () -> MVal
    z: object          # (i, rot) -> MVal
    sigma: object      # (i) -> MVal
    l0: MVal
    llast: MVal
    lblind: MVal
    x_vec: MVal
    beta: MVal
    gamma: MVal
    ndim: int = 2
    theta: MVal = None
    lookup_z: object = None    # (i, rot) -> MVal
    lookup_pin: object = None  # (i, rot) -> MVal
    lookup_ptab: object = None  # (i) -> MVal


def quotient_row_builders(cs) -> list:
    """One thunk per quotient-numerator row, in the NORMATIVE y-Horner
    order (matches plonk._quotient_rows / codegen.rs:237-248).

    Each thunk is ``f(ctx, memo) -> MVal``; evaluating a contiguous slice
    of thunks against a fresh ctx/memo traces exactly that slice's rows —
    the basis for chunking the quotient phase into several smaller jits
    (the single fused quotient graph's ~75 MB HLO exceeds the TPU
    compile-helper's memory cap and is SIGKILLED; see prove_device).
    """
    builders: list = []

    def one_of(ctx):
        return MVal(F.one_mont(FR, ()).reshape(
            F.N_LIMBS, *([1] * (ctx.ndim - 1))), 1)

    for _name, exprs in cs.gates:
        for e in exprs:
            builders.append(
                lambda ctx, memo, e=e: eval_expr_device(e, ctx, memo))

    nz = cs.num_permutation_zs()
    if nz:
        chunk_len = cs.permutation_chunk_len()
        chunks = [cs.permutation_columns[i : i + chunk_len]
                  for i in range(0, len(cs.permutation_columns), chunk_len)]
        rot_last = cs.rotation_last()

        builders.append(lambda ctx, memo: ctx.l0 * (one_of(ctx) - ctx.z(0, 0)))

        def llast_row(ctx, memo):
            zl = ctx.z(nz - 1, 0)
            return ctx.llast * (zl * zl - zl)

        builders.append(llast_row)
        for j in range(1, nz):
            builders.append(lambda ctx, memo, j=j: ctx.l0 * (
                ctx.z(j, 0) - ctx.z(j - 1, rot_last)))

        col_offset = 0
        for ci, chunk in enumerate(chunks):
            def perm_row(ctx, memo, ci=ci, chunk=chunk,
                         col_offset=col_offset):
                lhs = ctx.z(ci, 1)
                rhs = ctx.z(ci, 0)
                for j, col in enumerate(chunk):
                    if col.kind == "fixed":
                        v = ctx.fixed(col.index, 0)
                    elif col.kind == "advice":
                        v = ctx.advice(col.index, 0)
                    else:
                        v = ctx.instance()
                    sig = ctx.sigma(col_offset + j)
                    lhs = lhs * (v + ctx.beta * sig + ctx.gamma)
                    delta_pow = mval_const(pow(_DELTA, col_offset + j, P),
                                           ctx.ndim)
                    rhs = rhs * (v + ctx.beta * delta_pow * ctx.x_vec
                                 + ctx.gamma)
                return (lhs - rhs) * (one_of(ctx)
                                      - (ctx.llast + ctx.lblind))

            builders.append(perm_row)
            col_offset += len(chunk)

    # lookup rows (evaluator.rs:126-218 order), after permutation rows
    for li, (_name, ins, tabs) in enumerate(cs.lookups):
        builders.append(lambda ctx, memo, li=li: ctx.l0 * (
            one_of(ctx) - ctx.lookup_z(li, 0)))

        def lk_last(ctx, memo, li=li):
            lz0 = ctx.lookup_z(li, 0)
            return ctx.llast * (lz0 * lz0 - lz0)

        builders.append(lk_last)

        def lk_main(ctx, memo, li=li, ins=ins, tabs=tabs):
            def compress(exprs):
                acc = None
                for e in exprs:
                    v = eval_expr_device(e, ctx, memo)
                    acc = v if acc is None else acc * ctx.theta + v
                return acc

            a_c = compress(ins)
            s_c = compress(tabs)
            pin = ctx.lookup_pin(li, 0)
            ptab = ctx.lookup_ptab(li)
            lhs = (ctx.lookup_z(li, 1) * (pin + ctx.beta)
                   * (ptab + ctx.gamma))
            rhs = ctx.lookup_z(li, 0) * (a_c + ctx.beta) * (s_c + ctx.gamma)
            active = one_of(ctx) - (ctx.llast + ctx.lblind)
            return (lhs - rhs) * active

        builders.append(lk_main)
        builders.append(lambda ctx, memo, li=li: ctx.l0 * (
            ctx.lookup_pin(li, 0) - ctx.lookup_ptab(li)))

        def lk_order(ctx, memo, li=li):
            pin = ctx.lookup_pin(li, 0)
            ptab = ctx.lookup_ptab(li)
            active = one_of(ctx) - (ctx.llast + ctx.lblind)
            return (pin - ptab) * (pin - ctx.lookup_pin(li, -1)) * active

        builders.append(lk_order)

    return builders


def horner_rows_device(builders, ctx: DeviceQuotientCtx,
                       y_mont: jax.Array, acc: jax.Array | None) -> jax.Array:
    """Fold ``builders``'s rows into the running y-Horner accumulator.

    ``acc`` is the reduced (< 2p) accumulator carried across chunk jits
    (None for the first chunk).  The arithmetic ORDER is identical to the
    single-graph evaluation: acc = acc*y + row per row, reduced < 2p at
    the chunk boundary (representative choice does not affect the
    residues, so proofs stay byte-identical).
    """
    memo: dict = {}
    y = MVal(y_mont.reshape(F.N_LIMBS, *([1] * (ctx.ndim - 1))), 2)
    mval = (MVal(jnp.zeros(
        (F.N_LIMBS,) + (1,) * (ctx.ndim - 1), dtype=jnp.uint32), 1)
        if acc is None else MVal(acc, 2))
    for b in builders:
        mval = mval * y + b(ctx, memo)
    return F.reduce2p(FR, mval.arr)


def quotient_numer_device(cs, ctx: DeviceQuotientCtx, y_mont: jax.Array) -> jax.Array:
    """The full gate+permutation quotient numerator, Horner-folded in y.

    Row order matches plonk._quotient_rows exactly (the y-Horner order is
    normative: codegen.rs:237-248).  Returns (18, ext_n) Montgomery < 2p.
    """
    return horner_rows_device(quotient_row_builders(cs), ctx, y_mont, None)


from ..proof import domain as _dom  # noqa: E402  (host domain constants)

_DELTA = _dom.DELTA


# ---------------------------------------------------------------------------
# device proving key
# ---------------------------------------------------------------------------

def msm_c(n: int) -> int:
    """Window width for an n-point commit: ~log2(n) balances the W*n bucket
    adds against the 2^(c-1)-bucket suffix machinery."""
    return max(4, min(13, n.bit_length() - 1))


_SRS_TABLES: dict = {}


def srs_affine_table(srs, n: int) -> jax.Array:
    """Cached (2, 18, n) affine Montgomery table of the first n G1 powers."""
    key = (id(srs), n)
    if key not in _SRS_TABLES:
        _SRS_TABLES[key] = jnp.asarray(M.points_to_affine_limbs(srs.g1[:n]))
    return _SRS_TABLES[key]


@jax.jit
def commit_table(table: jax.Array, coeff_mont: jax.Array) -> jax.Array:
    """Batched commit: (2,18,n) table x (18,n,B) Montgomery coeffs.

    Routes through msm_window_sums_batch (B*W windows in one pass) —
    vmapping the single-MSM form corrupts the Pallas scan's VMEM scratch
    on TPU (see msm.msm_window_sums_batch docstring)."""
    canon = F.from_mont(FR, coeff_mont)
    sc = jnp.moveaxis(canon, -1, 0)  # (B, 18, n)
    return M.msm_window_sums_batch(table, sc, c=msm_c(table.shape[-1]))


@jax.jit
def _l2c_jit(arr):
    coeff = NTT.ntt_mont(FR, F.to_mont(FR, arr), inverse=True)
    return F.from_mont(FR, coeff)


def lagrange_to_coeff_many(cols: list[list[int]], n: int) -> list[list[int]]:
    """Batched host-int lagrange->coeff via the device iNTT (one jit call —
    eager per-op dispatch through the device tunnel is ~50 ms per op)."""
    if not cols:
        return []
    out = np.asarray(_l2c_jit(ints_to_device([list(c) for c in cols])))
    return [device_to_ints(out[:, :, i]) for i in range(out.shape[-1])]


class DeviceProverKey:
    """Device-resident tables + jitted phase graphs for one ProvingKey.

    With ``mesh`` set, every domain-sized table is laid out row-sharded
    over the mesh's data axis (SRS points over the point axis), so the
    phase graphs compile as GSPMD-partitioned programs — the multi-chip
    proving path drives the SAME six graphs as single-chip.
    """

    def __init__(self, pk, mesh=None):
        from . import plonk as pl

        self.pk = pk
        self.mesh = mesh
        cs = pk.vk.cs
        d = pk.vk.domain
        self.cs = cs
        self.n = d.n
        self.ext_n = d.extended_n
        self.rot_step = d.extended_n // d.n
        self.u = cs.usable_rows()
        self.bf = cs.blinding_factors()
        self.nz = cs.num_permutation_zs()

        n, ext_n = self.n, self.ext_n
        # SRS G1 powers, affine canonical-Montgomery limbs
        self.srs_table = jnp.asarray(
            M.points_to_affine_limbs(pk.srs.g1[:n]))
        j = ext_n // n
        coset_n = pow(d.coset, n, P)
        w_ext_n = pow(d.extended_omega, n, P)
        zh_inv_vals = [pow((coset_n * pow(w_ext_n, i, P) - 1) % P, P - 2, P)
                       for i in range(j)]
        lag_specials = [[1] + [0] * (n - 1),
                        [1 if r == self.u else 0 for r in range(n)],
                        [1 if r > self.u else 0 for r in range(n)]]
        delta_pows = [pow(_DELTA, jcol, P)
                      for jcol in range(len(cs.permutation_columns))]

        # ALL table construction in ONE jitted graph: eager per-op dispatch
        # through the device tunnel costs ~50 ms per op, and this pile is
        # hundreds of mont ops
        def build_tables(fixed_canon, sigma_canon, lag_canon, zh_canon,
                         delta_canon):
            omega_pows = pow_vector(d.omega, n)
            coset_pows = pow_vector(d.coset, n)
            coset_inv_pows = pow_vector(pow(d.coset, P - 2, P), ext_n)
            zh_inv = jnp.tile(F.to_mont(FR, zh_canon), (1, n))
            ext_pows = pow_vector(d.extended_omega, ext_n)
            x_vec = F.mont_mul(FR, ext_pows, _mont_scalar(d.coset)[:, None])
            fixed_vals = F.to_mont(FR, fixed_canon)
            sigma_vals = F.to_mont(FR, sigma_canon)
            fixed_coeff = self._intt(fixed_vals)
            sigma_coeff = self._intt(sigma_vals)
            fixed_ext = self._to_ext_tab(fixed_coeff, coset_pows,
                                         coset_inv_pows)
            sigma_ext = self._to_ext_tab(sigma_coeff, coset_pows,
                                         coset_inv_pows)
            l_ext = self._to_ext_tab(self._intt(F.to_mont(FR, lag_canon)),
                                     coset_pows, coset_inv_pows)
            dm = F.to_mont(FR, delta_canon)  # (18, S)
            tag_vecs = F.mont_mul(FR, omega_pows[:, :, None], dm[:, None, :])
            return (omega_pows, coset_pows, coset_inv_pows, zh_inv, x_vec,
                    fixed_vals, sigma_vals, fixed_coeff, sigma_coeff,
                    fixed_ext, sigma_ext, l_ext, tag_vecs)

        def canon_cols(cols, width=None):
            if not cols:
                return jnp.zeros((F.N_LIMBS, width or n, 0), jnp.uint32)
            return ints_to_device([list(c) for c in cols])

        (self.omega_pows, self.coset_pows, self.coset_inv_pows, self.zh_inv,
         self.x_vec, self.fixed_vals, self.sigma_vals, self.fixed_coeff,
         self.sigma_coeff, self.fixed_ext, self.sigma_ext, self.l_ext,
         self.tag_vecs) = jax.jit(build_tables)(
            canon_cols(pk.fixed_values), canon_cols(pk.sigma_values),
            canon_cols(lag_specials),
            ints_to_device(zh_inv_vals),
            canon_cols([[v] for v in delta_pows], width=1)[:, 0, :]
            if delta_pows else jnp.zeros((F.N_LIMBS, 0), jnp.uint32))
        if mesh is not None:
            for attr in ("omega_pows", "coset_pows", "coset_inv_pows",
                         "zh_inv", "x_vec", "fixed_vals", "sigma_vals",
                         "fixed_coeff", "sigma_coeff", "fixed_ext",
                         "sigma_ext", "l_ext", "tag_vecs"):
                setattr(self, attr, _mesh_put(getattr(self, attr), mesh))
            self.srs_table = _mesh_put(self.srs_table, mesh, axis=2)
        self._jit_cache: dict = {}

    def put(self, arr, axis: int = 1):
        """Mesh-shard an input array (no-op without a mesh)."""
        return _mesh_put(arr, self.mesh, axis)

    # -- basis conversion helpers (traced) --

    def _intt(self, vals):  # (18, n, C) mont lagrange -> mont coeff
        return NTT.ntt_mont(FR, vals, inverse=True)

    def _ntt(self, coeff):
        return NTT.ntt_mont(FR, coeff, inverse=False)

    def _to_ext(self, coeff):  # (18, n, C) mont coeff -> (18, ext_n, C)
        return self._to_ext_tab(coeff, self.coset_pows, self.coset_inv_pows)

    def _to_ext_tab(self, coeff, coset_pows, _coset_inv_pows):
        tail = coeff.ndim - 2
        scaled = F.mont_mul(FR, coeff,
                            coset_pows.reshape(
                                (F.N_LIMBS, self.n) + (1,) * tail))
        pad = [(0, 0), (0, self.ext_n - self.n)] + [(0, 0)] * tail
        return NTT.ntt_mont(FR, jnp.pad(scaled, pad))

    def _from_ext(self, ext):  # (18, ext_n[, C]) -> coeff, coset-unscaled
        tail = ext.ndim - 2
        coeff = NTT.ntt_mont(FR, ext, inverse=True)
        return F.mont_mul(FR, coeff,
                          self.coset_inv_pows.reshape(
                              (F.N_LIMBS, self.ext_n) + (1,) * tail))

    def commit_many(self, coeff_mont):  # (18, n, B) -> (3, 18, B) folded
        canon = F.from_mont(FR, coeff_mont)
        sc = jnp.moveaxis(canon, -1, 0)  # (B, 18, n)
        c = msm_c(self.n)
        wsums = M.msm_window_sums_batch(self.srs_table, sc, c=c)
        # window Horner ON DEVICE, batched over the B commitments — the
        # host-side per-commitment fold cost ~40 ms of python EC math each
        # and dominated every phase boundary
        return M.fold_windows_dev(wsums, c)

    def fold_commits(self, folded) -> list:
        """(3, 18, B) device-folded commitments -> list of affine points."""
        from ..ops import curve as C

        return C.point_to_affine_ints(np.asarray(folded))

    def jitted(self, name: str, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]


_DPK_CACHE: dict = {}


def device_prover_key(pk, mesh=None) -> DeviceProverKey:
    key = (id(pk), id(mesh) if mesh is not None else None)
    if key not in _DPK_CACHE:
        _DPK_CACHE[key] = DeviceProverKey(pk, mesh)
    return _DPK_CACHE[key]


# ---------------------------------------------------------------------------
# the device prover
# ---------------------------------------------------------------------------

_DEBUG_STASH: dict = {}  # latest phase-5 intermediates (debug/test aid)

def prove_device(pk, advice_values, instances, rng, mesh=None) -> bytes:
    """TPU-resident prove() — byte-identical to the host engine.

    Mirrors plonk.prove's transcript flow (same rng consumption order, same
    proof layout); all polynomial arithmetic and commitments run on device
    in six jitted phases, one per Fiat-Shamir round trip.

    With ``mesh`` set the same six phase graphs compile GSPMD-partitioned
    over the mesh (domain rows / SRS points sharded across the data axis)
    — grand products, quotient, opens and evals all stay on device, and
    the proof bytes are unchanged.
    """
    from . import plonk as pl
    from .transcript import Transcript

    dpk = device_prover_key(pk, mesh)
    cs, d = pk.vk.cs, pk.vk.domain
    n, u, bf, nz = dpk.n, dpk.u, dpk.bf, dpk.nz
    num_a = cs.num_advice
    tr = Transcript(vk_digest=pk.vk.vk_digest)

    instance_vals = [x % P for x in instances] + [0] * (n - len(instances))
    for x in instances:
        tr.common_scalar(x % P)

    # host-side randomness, consumed in the host engine's exact order
    blinds = [[rng.randrange(P) for _ in range(n - bf, n)]
              for _ in range(num_a)]

    # ---- phase 1: advice commitments ----
    adv_canon = dpk.put(ints_to_device([list(col) for col in advice_values]))
    blind_arr = dpk.put(ints_to_device(blinds)) if num_a else None  # (18, bf, A)
    inst_canon = dpk.put(ints_to_device(instance_vals))

    def phase1(adv, blind, inst):
        adv = jax.lax.dynamic_update_slice_in_dim(adv, blind, n - bf, 1)
        adv_m = F.to_mont(FR, adv)
        adv_coeff = dpk._intt(adv_m)
        wsums = dpk.commit_many(adv_coeff)
        return adv_m, adv_coeff, F.to_mont(FR, inst), wsums

    adv_m, adv_coeff, inst_m, wsums = dpk.jitted("p1", phase1)(
        adv_canon, blind_arr, inst_canon)
    for pt in dpk.fold_commits(np.asarray(wsums)):
        tr.write_point(pt)
    theta = tr.squeeze_challenge()

    # ---- phase 1.5: lookup permuted input/table commitments ----
    n_lk = len(cs.lookups)
    theta_a = dpk.put(ints_to_device([theta])[:, 0])
    lk_perm_m = lk_perm_coeff = None
    if n_lk:
        def phase1b(adv_m, inst_m, theta_a):
            """theta-compressed input/table lagrange values per lookup."""
            th = MVal(F.to_mont(FR, theta_a)[:, None], 2)
            memo: dict = {}
            ctx = DeviceQuotientCtx(
                fixed=lambda i, r: MVal(jnp.roll(
                    dpk.fixed_vals[:, :, i], -r, axis=1), 2),
                advice=lambda i, r: MVal(jnp.roll(
                    adv_m[:, :, i], -r, axis=1), 2),
                instance=lambda: MVal(inst_m, 2),
                z=None, sigma=None, l0=None, llast=None, lblind=None,
                x_vec=None, beta=None, gamma=None, ndim=2, theta=th)
            outs = []
            for _name, ins, tabs in cs.lookups:
                for exprs in (ins, tabs):
                    acc = None
                    for e in exprs:
                        v = eval_expr_device(e, ctx, memo)
                        acc = v if acc is None else acc * th + v
                    outs.append(F.from_mont(FR, acc._reduced(2).arr))
            return jnp.stack(outs, axis=-1)  # (18, n, 2L) canonical

        comp = np.asarray(dpk.jitted("p1b", phase1b)(adv_m, inst_m, theta_a))
        lk_perm = []
        for li in range(n_lk):
            a_ints = device_to_ints(comp[:, :, 2 * li])
            s_ints = device_to_ints(comp[:, :, 2 * li + 1])
            ap_u, sp_u = pl.permute_lookup_pair(a_ints[:u], s_ints[:u])
            ap = ap_u + [rng.randrange(P) for _ in range(u, n)]
            sp = sp_u + [rng.randrange(P) for _ in range(u, n)]
            lk_perm.extend([ap, sp])
        perm_canon = dpk.put(ints_to_device(lk_perm))  # (18,n,2L): ap0,sp0,..
        comp_canon = dpk.put(jnp.asarray(comp))

        def phase1c(perm_canon, comp_canon):
            perm_m = F.to_mont(FR, perm_canon)
            perm_coeff = dpk._intt(perm_m)
            return (perm_m, perm_coeff, F.to_mont(FR, comp_canon),
                    dpk.commit_many(perm_coeff))

        lk_perm_m, lk_perm_coeff, lk_comp_m, wsums = dpk.jitted(
            "p1c", phase1c)(perm_canon, comp_canon)
        for pt in dpk.fold_commits(np.asarray(wsums)):
            tr.write_point(pt)
    beta = tr.squeeze_challenge() if n_lk else tr.squeeze_challenge_cont()
    gamma = tr.squeeze_challenge_cont()

    # ---- phase 2: permutation + lookup grand products + random poly ----
    chunk_len = cs.permutation_chunk_len()
    chunks = [cs.permutation_columns[i : i + chunk_len]
              for i in range(0, len(cs.permutation_columns), chunk_len)]
    z_blinds = [[rng.randrange(P) for _ in range(u + 1, n)] for _ in chunks]
    lk_z_blinds = [[rng.randrange(P) for _ in range(u + 1, n)]
                   for _ in range(n_lk)]
    random_poly = [rng.randrange(P) for _ in range(n)]
    zb_arr = (dpk.put(ints_to_device(z_blinds)) if nz else None)
    lk_zb_arr = dpk.put(ints_to_device(lk_z_blinds)) if n_lk else None
    rp_arr = dpk.put(ints_to_device(random_poly))

    def phase2(adv_m, inst_m, beta_a, gamma_a, zb, rp, lk_comp_m=None,
               lk_perm_m=None, lk_zb=None):
        beta_m = F.to_mont(FR, beta_a)[:, None, None]
        gamma_m = F.to_mont(FR, gamma_a)[:, None, None]

        def col_vals(col):  # lagrange mont (18, n)
            if col.kind == "fixed":
                return dpk.fixed_vals[:, :, col.index]
            if col.kind == "advice":
                return adv_m[:, :, col.index]
            return inst_m

        nums, dens = [], []
        col_offset = 0
        for chunk in chunks:
            num = F.one_mont(FR, (n,))
            den = F.one_mont(FR, (n,))
            for jc, col in enumerate(chunk):
                v = col_vals(col)
                tag = dpk.tag_vecs[:, :, col_offset + jc]
                sig = dpk.sigma_vals[:, :, col_offset + jc]
                tnum = v + F.mont_mul(FR, beta_m[:, :, 0], tag) \
                         + gamma_m[:, :, 0]
                tden = v + F.mont_mul(FR, beta_m[:, :, 0], sig) \
                         + gamma_m[:, :, 0]
                num = F.mont_mul(FR, num, tnum)
                den = F.mont_mul(FR, den, tden)
            nums.append(num)
            dens.append(den)
            col_offset += len(chunk)
        num = jnp.stack(nums, axis=-1)  # (18, n, nz)
        den = jnp.stack(dens, axis=-1)
        # rows >= u contribute ratio 1
        row_ok = (jnp.arange(n) < u)[None, :, None]
        one = F.one_mont(FR, (n, nz))
        num = jnp.where(row_ok, num, one)
        den = jnp.where(row_ok, den, one)
        num_pre = prefix_product(num, exclusive=True)  # z without chain
        den_pre = prefix_product(den, exclusive=True)
        z_raw = F.mont_mul(FR, num_pre, batch_inverse(den_pre))
        # chunk chaining: multiply chunk ci by prod of previous chunks' z[u]
        totals = z_raw[:, u, :]  # (18, nz)
        chain = prefix_product(totals, exclusive=True)  # (18, nz)
        z = F.mont_mul(FR, z_raw, chain[:, None, :])
        # blinding rows u+1..n-1
        if zb is not None and zb.shape[1]:
            z = jax.lax.dynamic_update_slice_in_dim(
                z, F.to_mont(FR, zb), u + 1, 1)
        z_coeff = dpk._intt(z)

        # lookup grand products: z_l(r+1) = z_l(r) (A+b)(S+g)/((A'+b)(S'+g))
        lk_z_coeff = None
        if n_lk:
            lnum, lden = [], []
            for li in range(n_lk):
                a_m = lk_comp_m[:, :, 2 * li]
                s_m = lk_comp_m[:, :, 2 * li + 1]
                ap_m = lk_perm_m[:, :, 2 * li]
                sp_m = lk_perm_m[:, :, 2 * li + 1]
                bm, gm = beta_m[:, :, 0], gamma_m[:, :, 0]
                lnum.append(F.mont_mul(FR, F.reduce2p(FR, a_m + bm),
                                       F.reduce2p(FR, s_m + gm)))
                lden.append(F.mont_mul(FR, F.reduce2p(FR, ap_m + bm),
                                       F.reduce2p(FR, sp_m + gm)))
            lnum = jnp.stack(lnum, axis=-1)
            lden = jnp.stack(lden, axis=-1)
            row_ok2 = (jnp.arange(n) < u)[None, :, None]
            one2 = F.one_mont(FR, (n, n_lk))
            lnum = jnp.where(row_ok2, lnum, one2)
            lden = jnp.where(row_ok2, lden, one2)
            lz = F.mont_mul(FR, prefix_product(lnum, exclusive=True),
                            batch_inverse(prefix_product(lden,
                                                         exclusive=True)))
            if lk_zb is not None and lk_zb.shape[1]:
                lz = jax.lax.dynamic_update_slice_in_dim(
                    lz, F.to_mont(FR, lk_zb), u + 1, 1)
            lk_z_coeff = dpk._intt(lz)

        rp_m = F.to_mont(FR, rp)
        parts = [z_coeff]
        if lk_z_coeff is not None:
            parts.append(lk_z_coeff)
        parts.append(rp_m[:, :, None])
        to_commit = jnp.concatenate(parts, axis=-1)
        wsums = dpk.commit_many(to_commit)
        return z_coeff, lk_z_coeff, rp_m, wsums

    beta_a = dpk.put(ints_to_device([beta])[:, 0])
    gamma_a = dpk.put(ints_to_device([gamma])[:, 0])
    if n_lk:
        z_coeff, lk_z_coeff, rp_m, wsums = dpk.jitted("p2", phase2)(
            adv_m, inst_m, beta_a, gamma_a, zb_arr, rp_arr,
            lk_comp_m, lk_perm_m, lk_zb_arr)
    else:
        z_coeff, lk_z_coeff, rp_m, wsums = dpk.jitted("p2", phase2)(
            adv_m, inst_m, beta_a, gamma_a, zb_arr, rp_arr)
    for pt in dpk.fold_commits(np.asarray(wsums)):
        tr.write_point(pt)
    y = tr.squeeze_challenge()

    # ---- phase 3: quotient, CHUNKED across several jits ----
    # One fused quotient graph lowers to a ~75 MB HLO module whose TPU
    # compile is SIGKILLED by the compile helper's memory cap (observed
    # twice at k=11); the row Horner is therefore split: p3a (extension
    # transforms), p3q<i> (contiguous row slices folding one shared
    # reduced accumulator — identical arithmetic order, so proofs stay
    # byte-identical), p3c (zh division, piece split, commit+fold).
    num_q = cs.num_quotients()

    def phase3a(adv_coeff, z_coeff, inst_m, lk_z_coeff=None,
                lk_perm_coeff=None):
        inst_coeff = dpk._intt(inst_m[:, :, None])
        adv_ext = dpk._to_ext(adv_coeff)
        z_ext = dpk._to_ext(z_coeff)
        inst_ext = dpk._to_ext(inst_coeff)[:, :, 0]
        outs = (adv_ext, z_ext, inst_ext)
        if n_lk:
            outs += (dpk._to_ext(lk_z_coeff), dpk._to_ext(lk_perm_coeff))
        return outs

    def _quotient_ctx(adv_ext, z_ext, inst_ext, fixed_ext, sigma_ext,
                      l_ext, x_vec, beta_a, gamma_a, theta_a,
                      lkz_ext=None, lkp_ext=None):
        rs = dpk.rot_step
        ext_n = dpk.ext_n

        def rot(a, r):
            return jnp.roll(a, -((r * rs) % ext_n), axis=1)

        return DeviceQuotientCtx(
            fixed=lambda i, r: MVal(rot(fixed_ext[:, :, i], r), 2),
            advice=lambda i, r: MVal(rot(adv_ext[:, :, i], r), 2),
            instance=lambda: MVal(inst_ext, 2),
            z=lambda i, r: MVal(rot(z_ext[:, :, i], r), 2),
            sigma=lambda i: MVal(sigma_ext[:, :, i], 2),
            l0=MVal(l_ext[:, :, 0], 2),
            llast=MVal(l_ext[:, :, 1], 2),
            lblind=MVal(l_ext[:, :, 2], 2),
            x_vec=MVal(x_vec, 2),
            beta=MVal(F.to_mont(FR, beta_a)[:, None], 2),
            gamma=MVal(F.to_mont(FR, gamma_a)[:, None], 2),
            ndim=2,
            theta=MVal(F.to_mont(FR, theta_a)[:, None], 2),
            lookup_z=(lambda i, r: MVal(rot(lkz_ext[:, :, i], r), 2))
            if n_lk else None,
            lookup_pin=(lambda i, r: MVal(rot(lkp_ext[:, :, 2 * i], r), 2))
            if n_lk else None,
            lookup_ptab=(lambda i: MVal(lkp_ext[:, :, 2 * i + 1], 2))
            if n_lk else None)

    builders = quotient_row_builders(cs)
    n_chunks = max(1, min(len(builders), int(os.environ.get(
        "ZKOS_P3_CHUNKS", "6"))))
    bounds = [round(i * len(builders) / n_chunks)
              for i in range(n_chunks + 1)]

    def make_chunk(lo, hi, first):
        def chunk_fn(acc, adv_ext, z_ext, inst_ext, fixed_ext, sigma_ext,
                     l_ext, x_vec, y_a, beta_a, gamma_a, theta_a,
                     lkz_ext=None, lkp_ext=None):
            ctx = _quotient_ctx(adv_ext, z_ext, inst_ext, fixed_ext,
                                sigma_ext, l_ext, x_vec, beta_a, gamma_a,
                                theta_a, lkz_ext, lkp_ext)
            return horner_rows_device(
                builders[lo:hi], ctx, F.to_mont(FR, y_a),
                None if first else acc)
        return chunk_fn

    def phase3c(numer):
        t_ext = F.mont_mul(FR, numer, dpk.zh_inv)
        t_coeff = dpk._from_ext(t_ext)  # (18, ext_n)
        pieces = t_coeff[:, : num_q * n].reshape(F.N_LIMBS, num_q, n)
        pieces = jnp.moveaxis(pieces, 1, -1)  # (18, n, num_q)
        folded = dpk.commit_many(pieces)
        return pieces, folded

    y_a = dpk.put(ints_to_device([y])[:, 0])
    if n_lk:
        exts = dpk.jitted("p3a", phase3a)(adv_coeff, z_coeff, inst_m,
                                          lk_z_coeff, lk_perm_coeff)
    else:
        exts = dpk.jitted("p3a", phase3a)(adv_coeff, z_coeff, inst_m)
    tables = (dpk.fixed_ext, dpk.sigma_ext, dpk.l_ext, dpk.x_vec)
    acc = exts[2]  # placeholder arg with the right dtype; unused when first
    for ci in range(n_chunks):
        lo, hi = bounds[ci], bounds[ci + 1]
        acc = dpk.jitted(f"p3q{ci}", make_chunk(lo, hi, ci == 0))(
            acc, exts[0], exts[1], exts[2], *tables,
            y_a, beta_a, gamma_a, theta_a, *exts[3:])
    t_pieces, wsums = dpk.jitted("p3c", phase3c)(acc)
    for pt in dpk.fold_commits(np.asarray(wsums)):
        tr.write_point(pt)
    x = tr.squeeze_challenge()

    # ---- phase 4: evaluations ----
    aq = cs.advice_queries()
    fq = cs.fixed_queries()
    rot_last = cs.rotation_last()
    rot_set = sorted({r for _, r in aq} | {r for _, r in fq}
                     | {0, 1, rot_last} | ({-1} if n_lk else set()))
    x_n = pow(x, n, P)
    points = [d.rotated_point(x, r) for r in rot_set]

    def phase4(adv_coeff, z_coeff, t_pieces, rp_m, pts_canon,
               lk_z_coeff=None, lk_perm_coeff=None):
        # poly stack: advice | fixed | sigma | perm_z | rp | quotient pieces
        # | lookup z | lookup permuted (ap0, sp0, ap1, ...)
        parts = [adv_coeff, dpk.fixed_coeff, dpk.sigma_coeff, z_coeff,
                 rp_m[:, :, None], t_pieces]
        if n_lk:
            parts += [lk_z_coeff, lk_perm_coeff]
        stacked = jnp.concatenate(parts, axis=-1)
        outs = []
        for pi in range(pts_canon.shape[1]):
            pm = F.to_mont(FR, pts_canon[:, pi])
            outs.append(eval_at_dev(stacked, pm))  # (18, TOT)
        evs = jnp.stack(outs, axis=-1)  # (18, TOT, R)
        return F.from_mont(FR, evs)

    pts_canon = dpk.put(ints_to_device(points))
    if n_lk:
        evs = np.asarray(dpk.jitted("p4", phase4)(
            adv_coeff, z_coeff, t_pieces, rp_m, pts_canon,
            lk_z_coeff, lk_perm_coeff))
    else:
        evs = np.asarray(dpk.jitted("p4", phase4)(
            adv_coeff, z_coeff, t_pieces, rp_m, pts_canon))
    n_f = cs.num_fixed
    n_s = len(pk.sigma_values)

    def ev(kind, idx, rot):
        ri = rot_set.index(rot)
        base = {"advice": 0, "fixed": num_a, "sigma": num_a + n_f,
                "perm_z": num_a + n_f + n_s,
                "random": num_a + n_f + n_s + nz,
                "quotient": num_a + n_f + n_s + nz + 1,
                "lookup_z": num_a + n_f + n_s + nz + 1 + num_q,
                "lookup_pin": num_a + n_f + n_s + nz + 1 + num_q + n_lk,
                "lookup_ptab": num_a + n_f + n_s + nz + 1 + num_q + n_lk}[kind]
        if kind == "lookup_pin":
            idx = 2 * idx
        elif kind == "lookup_ptab":
            idx = 2 * idx + 1
        col = evs[:, base + idx, ri]
        return device_to_ints(col[:, None])[0]

    for idx, rot in aq:
        tr.write_scalar(ev("advice", idx, rot))
    for idx, rot in fq:
        tr.write_scalar(ev("fixed", idx, rot))
    tr.write_scalar(ev("random", 0, 0))
    for i in range(n_s):
        tr.write_scalar(ev("sigma", i, 0))
    for i in range(nz):
        tr.write_scalar(ev("perm_z", i, 0))
        tr.write_scalar(ev("perm_z", i, 1))
        if i < nz - 1:
            tr.write_scalar(ev("perm_z", i, rot_last))
    for i in range(n_lk):
        tr.write_scalar(ev("lookup_z", i, 0))
        tr.write_scalar(ev("lookup_z", i, 1))
        tr.write_scalar(ev("lookup_pin", i, 0))
        tr.write_scalar(ev("lookup_pin", i, -1))
        tr.write_scalar(ev("lookup_ptab", i, 0))

    # ---- phase 5: BDFG21 h(X) ----
    zeta = tr.squeeze_challenge()
    nu = tr.squeeze_challenge_cont()

    # rotation-set structure over poly *keys* (plonk helpers reused verbatim)
    keyed = pl._open_queries(
        cs,
        [("advice", i) for i in range(num_a)],
        [("perm_z", i) for i in range(nz)],
        [("sigma", i) for i in range(n_s)],
        [("fixed", i) for i in range(n_f)],
        ("quotient", 0), ("random", 0),
        lookup_zs=[("lookup_z", i) for i in range(n_lk)],
        lookup_pins=[("lookup_pin", i) for i in range(n_lk)],
        lookup_ptabs=[("lookup_ptab", i) for i in range(n_lk)])
    sets = pl._rotation_sets(keyed)  # [(rots, [key...])]

    # evals of the zeta-combined f_s at its rotation points (host ints)
    x_n_pows = [pow(x_n, i, P) for i in range(num_q)]

    def key_eval(key, rot):
        kind, idx = key
        if kind == "quotient":
            return sum(x_n_pows[i] * ev("quotient", i, rot)
                       for i in range(num_q)) % P
        return ev(kind, idx, rot)

    set_meta = []  # host per-set data
    for rots, keys in sets:
        pts = [d.rotated_point(x, r) for r in rots]
        vals = []
        for ri, rot in enumerate(rots):
            acc, zp = 0, 1
            for key in keys:
                acc = (acc + zp * key_eval(key, rot)) % P
                zp = zp * zeta % P
            vals.append(acc)
        r_s = _dom.lagrange_interpolate(pts, vals)
        set_meta.append((rots, keys, pts, r_s))

    max_pts = max(len(pts) for _, _, pts, _ in set_meta)
    nsets = len(set_meta)
    # upload per-set constants
    zeta_pows = [pow(zeta, i, P) for i in
                 range(max(len(k) for _, k, _, _ in set_meta))]
    nu_pows = [pow(nu, i, P) for i in range(nsets + 1)]
    pts_flat, pts_inv_flat, rs_flat = [], [], []
    for rots, keys, pts, r_s in set_meta:
        row = pts + [1] * (max_pts - len(pts))
        pts_flat.append(row)
        pts_inv_flat.append([pow(v, P - 2, P) for v in row])
        rs_flat.append((r_s + [0] * max_pts)[:max_pts])

    def poly_by_key(key, adv_coeff, z_coeff, t_pieces, rp_m,
                    lk_z_coeff=None, lk_perm_coeff=None):
        kind, idx = key
        if kind == "advice":
            return adv_coeff[:, :, idx]
        if kind == "fixed":
            return dpk.fixed_coeff[:, :, idx]
        if kind == "sigma":
            return dpk.sigma_coeff[:, :, idx]
        if kind == "perm_z":
            return z_coeff[:, :, idx]
        if kind == "random":
            return rp_m
        if kind == "lookup_z":
            return lk_z_coeff[:, :, idx]
        if kind == "lookup_pin":
            return lk_perm_coeff[:, :, 2 * idx]
        if kind == "lookup_ptab":
            return lk_perm_coeff[:, :, 2 * idx + 1]
        raise KeyError(key)

    def phase5(adv_coeff, z_coeff, t_pieces, rp_m, zeta_p, nu_p,
               xn_p, pts_a, ptsi_a, rs_a, lk_z_coeff=None,
               lk_perm_coeff=None):
        # fold quotient pieces by x^n: t_fold = sum_i (x^n)^i * piece_i
        xnp = F.to_mont(FR, xn_p)  # (18, num_q)
        tf_terms = F.mont_mul(FR, t_pieces, xnp[:, None, :])
        t_fold = tf_terms[:, :, 0]
        for i in range(1, num_q):
            t_fold = t_fold + tf_terms[:, :, i]
        t_fold = F.reduce2p(FR, t_fold)

        zeta_m = F.to_mont(FR, zeta_p)
        nu_m = F.to_mont(FR, nu_p)
        h = jnp.zeros((F.N_LIMBS, n), dtype=jnp.uint32)
        f_list = []
        q_list = []
        for si, (rots, keys, pts, r_s) in enumerate(set_meta):
            f_s = jnp.zeros((F.N_LIMBS, n), dtype=jnp.uint32)
            for ki, key in enumerate(keys):
                poly = (t_fold if key[0] == "quotient"
                        else poly_by_key(key, adv_coeff, z_coeff, t_pieces,
                                         rp_m, lk_z_coeff, lk_perm_coeff))
                f_s = f_s + F.mont_mul(FR, poly, zeta_m[:, ki : ki + 1])
            f_s = F.reduce2p(FR, f_s)
            f_list.append(f_s)
            # subtract r_s (low-degree) then divide by each linear factor
            rsm = F.to_mont(FR, rs_a[:, :, si])  # (18, max_pts)
            q_s = f_s.at[:, :max_pts].add(
                F.neg(FR, F.carry_once(rsm), k=2))
            for pi in range(len(pts)):
                zm = F.to_mont(FR, pts_a[:, si, pi])
                zim = F.to_mont(FR, ptsi_a[:, si, pi])
                q_full = divide_linear_dev(q_s, zm, zim)
                q_s = jnp.pad(q_full, [(0, 0), (0, 1)])
            q_list.append(q_s)
            h = h + F.mont_mul(FR, q_s, nu_m[:, si : si + 1])
        h = F.reduce2p(FR, h)
        wsums = dpk.commit_many(h[:, :, None])
        return h, jnp.stack(f_list, axis=-1), jnp.stack(q_list, axis=-1), wsums

    zeta_p = dpk.put(ints_to_device(zeta_pows))
    nu_p = dpk.put(ints_to_device(nu_pows))
    xn_p = dpk.put(ints_to_device(x_n_pows))
    pts_a = dpk.put(jnp.stack([ints_to_device(row) for row in pts_flat],
                              axis=1))
    ptsi_a = dpk.put(jnp.stack([ints_to_device(row)
                                for row in pts_inv_flat], axis=1))
    rs_a = dpk.put(jnp.stack([ints_to_device(row) for row in rs_flat],
                             axis=-1))
    if n_lk:
        h_poly, f_stack, q_stack, wsums = dpk.jitted("p5", phase5)(
            adv_coeff, z_coeff, t_pieces, rp_m, zeta_p, nu_p, xn_p,
            pts_a, ptsi_a, rs_a, lk_z_coeff, lk_perm_coeff)
    else:
        h_poly, f_stack, q_stack, wsums = dpk.jitted("p5", phase5)(
            adv_coeff, z_coeff, t_pieces, rp_m, zeta_p, nu_p, xn_p,
            pts_a, ptsi_a, rs_a)
    _DEBUG_STASH.update(h_poly=h_poly, f_stack=f_stack, q_stack=q_stack,
                        set_meta=set_meta, t_pieces=t_pieces, x=x,
                        zeta=zeta, nu=nu)
    for pt in dpk.fold_commits(np.asarray(wsums)):
        tr.write_point(pt)
    mu = tr.squeeze_challenge()

    # ---- phase 6: W' ----
    z0_mu = 1
    for pt in set_meta[0][2]:
        z0_mu = z0_mu * ((mu - pt) % P) % P
    scales, r_mu_total = [], 0
    nu_pow = 1
    for rots, keys, pts, r_s in set_meta:
        zs_mu = 1
        for pt in pts:
            zs_mu = zs_mu * ((mu - pt) % P) % P
        d_s = z0_mu * pow(zs_mu, P - 2, P) % P
        scale = nu_pow * d_s % P
        scales.append(scale)
        r_mu_total = (r_mu_total + scale * _dom.poly_eval(r_s, mu)) % P
        nu_pow = nu_pow * nu % P

    def phase6(h_poly, f_stack, sc_a, negz0_a, negrmu_a, mu_a, mui_a):
        scm = F.to_mont(FR, sc_a)  # (18, nsets)
        lp = F.mont_mul(FR, h_poly, F.to_mont(FR, negz0_a)[:, None])
        terms = F.mont_mul(FR, f_stack, scm[:, None, :])
        for si in range(nsets):
            lp = lp + terms[:, :, si]
        lp = lp.at[:, 0].add(F.to_mont(FR, negrmu_a))
        lp = F.reduce2p(FR, lp)
        w_prime = divide_linear_dev(lp, F.to_mont(FR, mu_a),
                                    F.to_mont(FR, mui_a))
        wsums = dpk.commit_many(jnp.pad(w_prime, [(0, 0), (0, 1)])[:, :, None])
        return wsums

    wsums = dpk.jitted("p6", phase6)(
        h_poly, f_stack,
        dpk.put(ints_to_device(scales)),
        dpk.put(ints_to_device([(P - z0_mu) % P])[:, 0]),
        dpk.put(ints_to_device([(P - r_mu_total) % P])[:, 0]),
        dpk.put(ints_to_device([mu])[:, 0]),
        dpk.put(ints_to_device([pow(mu, P - 2, P)])[:, 0]))
    for pt in dpk.fold_commits(np.asarray(wsums)):
        tr.write_point(pt)

    return bytes(tr.proof)
