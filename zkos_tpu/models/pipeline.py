"""The flagship proving-compute step (compile-check entry).

One fused "step" of the Shielder proving workload, shaped like halo2's
``create_proof`` hot loop (SURVEY.md §3.1): witness hashing (Poseidon2
Merkle levels), polynomial work (NTT/iNTT over Fr), and commitment work
(Pippenger MSM over G1).  ``prove_step`` is the driver's single-chip
compile-check entry; the sharded variants in ``zkos_tpu.parallel``
distribute the same kernels over a mesh.

The full PLONKish ``generate_proof`` driver lives in
``zkos_tpu.proof.engine.prove_device`` (the production device prover,
default engine of ``proof.plonk.prove``); this module stays as the
minimal jittable surface the harness compile-checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as NTT
from ..ops import poseidon2 as P2


def prove_step(leaves: jax.Array, coeffs: jax.Array, points: jax.Array,
               scalars: jax.Array):
    """One fused proving compute step (jittable, single chip).

    leaves:  (18, 7, B)  canonical limbs — a batch of 7-tuples to hash
             (Merkle level / note hashing, ARITY=7 per SURVEY.md §2.0)
    coeffs:  (18, n)     canonical limbs — a polynomial to evaluate (NTT)
    points:  (3, 18, N)  Montgomery projective G1 points (SRS slice)
    scalars: (18, N)     canonical limbs — MSM scalars

    Returns (digests (18, B), evals (18, n), commitment (3, 18)).
    """
    digests = P2.hash_n(leaves)
    evals = NTT.ntt(coeffs)
    commitment = M.msm_mont(points, scalars, c=8)
    return digests, evals, commitment
