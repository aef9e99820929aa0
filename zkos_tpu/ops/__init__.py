"""Low-level compute kernels: field, Poseidon2, NTT, curve, MSM, Keccak."""
