"""Mesh-sharded prover backend: the multi-chip PLONK proving path.

BASELINE config 5 ("full Shielder-scale proving workload sharded over
N >= 2 hosts") maps the prover's heavy kernels onto the mesh:

- **commits (phase 1/2/3 + multiopen)**: the SRS G1 table and the
  scalar vector are sharded over the points axis; every device runs the
  sorted prefix-scan Pippenger on its local slice and the per-window
  partial sums are all_gathered and tree-folded (communication per
  commit = n_dev * W points — independent of n).  Plugged into the
  host-driven prover through ``plonk.prove(commit_fn=...)``, which
  makes the *entire proof* — every commitment the verifier sees —
  mesh-computed while staying byte-identical to the single-chip
  engines.
- **extended-domain NTTs (phase 3)**: the coset extension runs as the
  Bailey four-step transform with its single all_to_all exchange
  (parallel.sharded.sharded_ntt_4step).

``ShardedProver`` is the user-facing handle; ``__graft_entry__.
dryrun_multichip`` drives it over the virtual CPU mesh every round and
checks byte-equality of the resulting proof against the host engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import field as F
from ..ops import field_golden as G
from ..ops import msm as M
from ..ops import ntt as NTT
from ..proof import engine as eng
from .mesh import DATA_AXIS
from .sharded import _fold_points, shard_map, sharded_ntt_4step, \
    coeffs_to_matrix, matrix_to_naturals


class ShardedProver:
    """Points-sharded commitment backend for one ProvingKey + mesh."""

    def __init__(self, pk, mesh):
        self.pk = pk
        self.mesh = mesh
        self.n = pk.vk.domain.n
        self.nd = mesh.shape[DATA_AXIS]
        assert self.n % self.nd == 0, \
            f"domain {self.n} not divisible by mesh size {self.nd}"
        self.c = eng.msm_c(self.n)
        p_spec = P(None, None, DATA_AXIS)
        self.s_spec = P(None, DATA_AXIS)
        self.table = jax.device_put(
            eng.srs_affine_table(pk.srs, self.n),
            NamedSharding(mesh, p_spec))
        self._graph = None
        self._p_spec = p_spec

    def _commit_graph(self):
        if self._graph is not None:
            return self._graph
        c = self.c

        def local(pts, sc):
            ws = M.msm_window_sums(pts, sc, c=c)       # (3, 18, W) local
            allw = jax.lax.all_gather(ws, DATA_AXIS, axis=3)
            return _fold_points(allw)                   # (3, 18, W)

        fn = shard_map(local, mesh=self.mesh,
                       in_specs=(self._p_spec, self.s_spec), out_specs=P())
        self._graph = jax.jit(fn)
        return self._graph

    def commit(self, coeffs: list[int]):
        """Drop-in for plonk._commit: python-int poly -> affine point.

        The identity (all-zero polynomial) short-circuits on host like
        the host engine — the mesh MSM's affine tables cannot represent
        it (and the transcript rejects it anyway).
        """
        if not any(coeffs):
            return None
        padded = list(coeffs) + [0] * (self.n - len(coeffs))
        sc = jax.device_put(
            jnp.asarray(np.asarray(F.to_limbs(padded), dtype=np.uint32)),
            NamedSharding(self.mesh, self.s_spec))
        wsums = self._commit_graph()(self.table, sc)
        return M.fold_windows_host(np.asarray(wsums), self.c)

    # -- phase-3 extended-domain transform over the mesh --

    def coset_extended_eval(self, coeffs: list[int]) -> list[int]:
        """coeff -> values on the extended coset, via the sharded
        four-step NTT (one all_to_all).  Matches
        domain.coeff_to_extended_coset (the engine's _to_ext)."""
        d = self.pk.vk.domain
        ext_n = d.extended_n
        scaled = [c * pow(d.coset, i, G.FR_MODULUS) % G.FR_MODULUS
                  for i, c in enumerate(coeffs)]
        padded = scaled + [0] * (ext_n - len(scaled))
        n1 = 1 << (ext_n.bit_length() // 2)
        while ext_n // n1 % self.nd and n1 >= self.nd:
            n1 *= 2
        n2 = ext_n // n1
        assert n1 % self.nd == 0 and n2 % self.nd == 0, \
            f"ext domain {ext_n} does not tile the {self.nd}-device mesh"
        a = F.to_mont(F.FR, jnp.asarray(
            np.asarray(F.to_limbs(padded), dtype=np.uint32)))
        mat = coeffs_to_matrix(a, n1, n2)
        out = sharded_ntt_4step(self.mesh, mat)
        vals = F.from_mont(F.FR, matrix_to_naturals(out))
        return eng.device_to_ints(vals)


def prove_sharded(pk, advice_values, instances, mesh, rng=None,
                  pcs: str = "bdfg21") -> bytes:
    """Full proof with every commitment computed on the mesh.

    Byte-identical to plonk.prove(engine="host"/"device") for the same
    rng stream; the host drives transcript + scalar work while all G1
    MSMs execute points-sharded across the devices.
    """
    from ..proof import plonk

    sp = ShardedProver(pk, mesh)
    return plonk.prove(pk, advice_values, instances, rng=rng,
                       engine="host", pcs=pcs, commit_fn=sp.commit)
