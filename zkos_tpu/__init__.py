"""zkos_tpu — a TPU-native zero-knowledge proving framework.

A from-scratch re-design of the compute core of Cardinal-Cryptography/zkOS-monorepo
("Shielder") for TPU hardware: BN254 field/curve arithmetic, Poseidon2 hashing,
NTT polynomial arithmetic, Pippenger MSM, KZG commitments and a PLONKish prover,
built on JAX/XLA (vectorized uint32 limb arithmetic on the VPU, Pallas kernels for
hot paths, jax.sharding meshes for multi-chip scale-out).

Package layout
--------------
- ``zkos_tpu.ops``       low-level kernels: field, Poseidon2, NTT, curve, MSM, Keccak
- ``zkos_tpu.proof``     proving stack: SRS/ptau, KZG, transcript, PLONK driver
- ``zkos_tpu.parallel``  device meshes and sharded (multi-chip) kernel variants
- ``zkos_tpu.protocol``  Shielder protocol model: notes, accounts, Merkle tree, secrets
- ``zkos_tpu.models``    end-to-end flagship pipelines (the "models" of this framework)
- ``zkos_tpu.utils``     conversions and helpers

The reference system is documented in SURVEY.md; file:line citations in
docstrings point into /root/reference (the upstream Rust/Solidity codebase whose
behavior this framework reproduces bit-exactly on a different architecture).
"""

__version__ = "0.1.0"
