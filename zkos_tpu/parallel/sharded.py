"""Multi-chip sharded kernels: Poseidon2 batches, Pippenger MSM, four-step NTT.

Design (SURVEY.md §2.3, §5 "long-context" analog): the reference parallelizes
with rayon on one host; here distribution is native — a ``jax.sharding.Mesh``
with XLA collectives over ICI:

- **Poseidon2 / NTT batches** are embarrassingly data-parallel: shard the
  batch axis with ``NamedSharding`` and let XLA partition (zero comms).
- **MSM** shards the *points* axis: each device runs the full scan-Pippenger
  bucket pipeline on its local slice, producing one projective partial sum;
  partials are combined with an ``all_gather`` + log-tree of EC adds
  (communication = n_dev * 1 point = tiny vs the bucket phase).
- **Large single NTT** uses the Bailey four-step decomposition
  n = n1*n2: local row NTTs, on-device twiddle synthesis + scaling, an
  ``all_to_all`` transpose (the only cross-chip exchange — each coefficient
  moves once), local column NTTs.  This is the 2^24-coefficient config of
  BASELINE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, mesh, in_specs, out_specs):
    """shard_map with the varying-manual-axes check off.

    The limb kernels build scan/fori carries with ``jnp.zeros`` inits, which
    the VMA checker flags as unvarying-vs-varying mismatches inside manual
    regions; replication is enforced by our out_specs instead.
    """
    try:
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)
    except TypeError:  # older jax spelling
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_rep=False)

from ..ops import curve as C
from ..ops import field as F
from ..ops import field_golden as G
from ..ops import msm as M
from ..ops import ntt as NTT
from ..ops import poseidon2 as P2
from .mesh import DATA_AXIS


# ---------------------------------------------------------------------------
# data-parallel batches (no communication)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _hash_graph(mesh):
    """One jitted graph per mesh: rebuilding jax.jit per call would
    retrace every invocation (measured as the 2-device efficiency loss
    in SCALING_r02 — the batch shard itself is comms-free)."""
    out_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(P2.hash_n, out_shardings=out_sh)


def sharded_hash_n(mesh, inputs: jax.Array) -> jax.Array:
    """Poseidon2 hash with the batch axis sharded over the mesh.

    inputs: (18, n, B) canonical limbs, B divisible by mesh size.
    """
    in_sh = NamedSharding(mesh, P(None, None, DATA_AXIS))
    inputs = jax.device_put(inputs, in_sh)
    return _hash_graph(mesh)(inputs)


@functools.lru_cache(maxsize=None)
def _ntt_batch_graph(mesh, inverse: bool):
    sh = NamedSharding(mesh, P(None, None, DATA_AXIS))
    return jax.jit(functools.partial(NTT.ntt, inverse=inverse),
                   out_shardings=sh)


def sharded_ntt_batch(mesh, a: jax.Array, inverse: bool = False) -> jax.Array:
    """Many independent NTTs: (18, n, B) with the B axis sharded (no comms)."""
    sh = NamedSharding(mesh, P(None, None, DATA_AXIS))
    a = jax.device_put(a, sh)
    return _ntt_batch_graph(mesh, inverse)(a)


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------

def _fold_points(pts: jax.Array) -> jax.Array:
    """Tree-fold a (3, 18, m) stack of projective points to (3, 18)."""
    m = pts.shape[-1]
    while m > 1:
        half = m // 2
        rest = pts[..., 2 * half :]
        pts = jnp.concatenate(
            [C.ec_add(pts[..., :half], pts[..., half : 2 * half]), rest], axis=-1)
        m = pts.shape[-1]
    return pts[..., 0]


@functools.lru_cache(maxsize=None)
def _msm_graph(mesh, c: int, groups: int | None):
    p_spec = P(None, None, DATA_AXIS)
    s_spec = P(None, DATA_AXIS)

    def local(pts, sc):
        partial = M.msm_mont(pts, sc, c=c, groups=groups)  # (3, 18)
        allp = jax.lax.all_gather(partial, DATA_AXIS, axis=2)  # (3, 18, n_dev)
        return _fold_points(allp)

    fn = shard_map(local, mesh=mesh, in_specs=(p_spec, s_spec), out_specs=P())
    return jax.jit(fn)


def sharded_msm(mesh, points: jax.Array, scalar_limbs: jax.Array, c: int = 8,
                groups: int | None = None) -> jax.Array:
    """MSM with points+scalars sharded over the mesh "data" axis.

    points: (3, 18, N) Montgomery projective; scalar_limbs: (18, N) canonical.
    N must be divisible by the mesh size.  Returns (3, 18) on all devices.
    """
    n_dev = mesh.shape[DATA_AXIS]
    n = points.shape[-1]
    assert n % n_dev == 0, "pad the MSM to a multiple of the mesh size"
    points = jax.device_put(
        points, NamedSharding(mesh, P(None, None, DATA_AXIS)))
    scalar_limbs = jax.device_put(
        scalar_limbs, NamedSharding(mesh, P(None, DATA_AXIS)))
    return _msm_graph(mesh, c, groups)(points, scalar_limbs)


def sharded_msm_window_sums(mesh, points_xy: jax.Array,
                            scalar_limbs: jax.Array, c: int = 13,
                            steps: int | None = None) -> jax.Array:
    """The sorted prefix-scan MSM (ops.msm v2) with points sharded.

    points_xy: (2, 18, N) canonical Montgomery affine; scalar_limbs (18, N).
    Each device runs the full sort/prefix/suffix pipeline on its local
    slice of the points axis, producing per-window sums; the (3, 18, W)
    partials are all_gathered and tree-folded — communication is n_dev
    window vectors regardless of N.  Finish with ops.msm.fold_windows_host.
    """
    n_dev = mesh.shape[DATA_AXIS]
    assert points_xy.shape[-1] % n_dev == 0
    points_xy = jax.device_put(
        points_xy, NamedSharding(mesh, P(None, None, DATA_AXIS)))
    scalar_limbs = jax.device_put(
        scalar_limbs, NamedSharding(mesh, P(None, DATA_AXIS)))
    return _msm_wsums_graph(mesh, c, steps)(points_xy, scalar_limbs)


@functools.lru_cache(maxsize=None)
def _msm_wsums_graph(mesh, c: int, steps: int | None):
    p_spec = P(None, None, DATA_AXIS)
    s_spec = P(None, DATA_AXIS)

    def local(pts, sc):
        ws = M.msm_window_sums(pts, sc, c=c, steps=steps)  # (3, 18, W)
        allw = jax.lax.all_gather(ws, DATA_AXIS, axis=3)  # (3, 18, W, nd)
        return _fold_points(allw)  # (3, 18, W)

    fn = shard_map(local, mesh=mesh, in_specs=(p_spec, s_spec), out_specs=P())
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# four-step (Bailey) sharded NTT
# ---------------------------------------------------------------------------
#
# n = n1*n2; index split j = j2*n1 + j1, k = k1*n2 + k2 gives
#   X[k1*n2+k2] = sum_{j1} w_{n1}^{j1 k1} * w_n^{j1 k2}
#                    * (sum_{j2} A[j1, j2] w_{n2}^{j2 k2})
# with A[j1, j2] = a[j2*n1 + j1].  Pipeline per device (rows j1 sharded):
#   (1) local NTT_n2 along rows -> B[j1, k2]
#   (2) multiply the local twiddle block w_n^{j1 k2} (synthesized on device)
#   (3) all_to_all transpose so columns become local
#   (4) local NTT_n1 along columns -> D[k1, k2] = X[k1*n2 + k2], k2 sharded.
#
# The same code computes the inverse transform (w -> w^-1): each local pass
# contributes its own 1/n_i scale, so the product is the required 1/n.

def coeffs_to_matrix(a: jax.Array, n1: int, n2: int) -> jax.Array:
    """(18, n) natural-order values -> (18, n1, n2) with A[j1,j2] = a[j2*n1+j1]."""
    return jnp.moveaxis(a.reshape(F.N_LIMBS, n2, n1), 1, 2)


def matrix_to_naturals(d: jax.Array) -> jax.Array:
    """(18, n1, n2) output D[k1,k2] -> (18, n) natural order (index k1*n2+k2)."""
    n1, n2 = d.shape[1], d.shape[2]
    return d.reshape(F.N_LIMBS, n1 * n2)


def _twiddle_block(row_heads: jax.Array, n2: int) -> jax.Array:
    """Device: (18, m) Montgomery bases b_i -> (18, m, n2) powers b_i^{k2}.

    log2(n2) batched doubling steps (same scheme as ``ntt.pow_table_mont``).
    """
    table = F.one_mont(F.FR, (row_heads.shape[1], 1))  # (18, m, 1)
    w_pow = row_heads[:, :, None]  # b^(2^i) as the table doubles
    size = 1
    while size < n2:
        ext = F.mont_mul(F.FR, table, w_pow)
        table = jnp.concatenate([table, ext], axis=2)
        w_pow = F.mont_sqr(F.FR, w_pow)
        size *= 2
    return table[:, :, :n2]


def sharded_ntt_4step(mesh, a_matrix: jax.Array, inverse: bool = False) -> jax.Array:
    """Sharded large NTT on Montgomery-form values (< 2p).

    a_matrix: (18, n1, n2) from ``coeffs_to_matrix`` (sharded or shardable on
    axis 1).  Returns (18, n1, n2) = D[k1, k2] = result at natural index
    k1*n2+k2, sharded on axis 2.  One all_to_all is the only cross-chip step.
    """
    n_dev = mesh.shape[DATA_AXIS]
    n1, n2 = a_matrix.shape[1], a_matrix.shape[2]
    assert n1 % n_dev == 0 and n2 % n_dev == 0
    a_matrix = jax.device_put(
        a_matrix, NamedSharding(mesh, P(None, DATA_AXIS, None)))
    return _ntt4_graph(mesh, n1, n2, inverse)(a_matrix)


@functools.lru_cache(maxsize=None)
def _ntt4_graph(mesh, n1: int, n2: int, inverse: bool):
    spec_in = P(None, DATA_AXIS, None)
    spec_out = P(None, None, DATA_AXIS)
    w_mont = jnp.asarray(
        F.to_limbs(G.FR.to_mont(NTT.root_of_unity(n1 * n2, inverse=inverse))),
        dtype=jnp.uint32)

    def pipeline(blk_in):
        row_heads = NTT.pow_table_mont(F.FR, w_mont, n1)  # (18, n1) w^{j1}

        def local(blk, heads):
            # blk (18, n1/nd, n2) rows local; heads (18, n1/nd) local row bases
            b = NTT.ntt_mont(F.FR, jnp.moveaxis(blk, 2, 1), inverse=inverse,
                             reduce_output=False)            # NTT along j2
            b = jnp.moveaxis(b, 1, 2)
            tw = _twiddle_block(heads, n2)                   # (18, n1/nd, n2)
            c = F.mont_mul(F.FR, b, tw)
            d = jax.lax.all_to_all(c, DATA_AXIS, split_axis=2,
                                   concat_axis=1, tiled=True)
            out = NTT.ntt_mont(F.FR, d, inverse=inverse,
                               reduce_output=False)          # NTT along k1
            return F.reduce2p(F.FR, out)

        fn = shard_map(local, mesh=mesh,
                       in_specs=(spec_in, P(None, DATA_AXIS)),
                       out_specs=spec_out)
        return fn(blk_in, row_heads)

    return jax.jit(pipeline)
