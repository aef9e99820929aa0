"""Device meshes and sharded (multi-chip) kernel variants.

The reference is a single-host CPU codebase (rayon thread pools — see
SURVEY.md §2.3); distribution here is a new, first-class design: JAX meshes +
``shard_map`` with XLA collectives over ICI/DCN instead of NCCL/MPI.

- ``mesh``         mesh construction helpers
- ``sharded``      sharded Poseidon2 / MSM / NTT kernels
"""

from . import mesh, sharded  # noqa: F401
