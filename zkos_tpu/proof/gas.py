"""Static EVM gas model for the rendered Halo2 verifier.

The reference pins measured on-chain verification gas as regression
constants — 642 011 (NewAccount), 831 764 (Deposit), 925 323 (Withdraw) in
`crates/halo2-verifier/src/generator.rs:79-81`, measured by running the
generated Yul verifier on an in-process EVM
(`crates/evm-utils/src/evm_runner.rs:43-149`,
`crates/integration-tests/src/bin/gas_consumption.rs:27-141`).

There is no EVM in this environment, so instead of *measuring* we *derive*
the verification gas from the verifying key: the rendered verifier
(zkos_tpu.proof.solidity) performs a statically-known sequence of EVM
operations — calldata load, Keccak transcript squeezes, mulmod/addmod field
arithmetic for the quotient evaluation, one modexp inversion, one EC
linear combination (ecMul/ecAdd precompiles) and one 2-pair pairing — whose
prices are fixed by the (Istanbul+) fee schedule.  `estimate(vk)` walks the
same ConstraintSystemMeta-style layout math the codegen uses
(`codegen/util.rs:22-103`) and prices each component.

This is an ESTIMATOR: it models the dominant, protocol-determined costs
(precompiles, calldata, field-op counts) exactly, and per-opcode stack
traffic by a calibrated average, so it tracks circuit-shape changes the way
the reference's regression constants do — use it for relative accounting
and regression detection, not wei-exact billing.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import plonk

# -- EVM fee schedule (Istanbul/London, values the verifier touches) --------
G_TX = 21_000                 # intrinsic transaction cost
G_CALLDATA_NONZERO = 16
G_CALLDATA_ZERO = 4
G_KECCAK = 30                 # + 6 per 32-byte word
G_KECCAK_WORD = 6
G_ECADD = 150                 # BN254 point addition precompile (EIP-1108)
G_ECMUL = 6_000               # BN254 scalar multiplication precompile
G_PAIRING_BASE = 45_000       # BN254 pairing precompile
G_PAIRING_PER_PAIR = 34_000
G_MODEXP_INV = 1_360          # Fermat inversion of one Fr element
# one mulmod/addmod including the PUSH/DUP/SWAP traffic the Yul compiler
# emits around it (8 for the opcode + ~6 measured average stack cost)
G_FIELD_OP = 14
G_DISPATCH = 3_000            # selector dispatch, memory expansion, return


def expr_ops(e: plonk.Expr) -> int:
    """Number of field operations (mulmod+addmod) to evaluate ``e`` at x."""
    if isinstance(e, (plonk.Constant, plonk.Fixed, plonk.Advice,
                      plonk.Instance)):
        return 0
    if isinstance(e, plonk.Sum):
        return 1 + expr_ops(e.a) + expr_ops(e.b)
    if isinstance(e, plonk.Prod):
        return 1 + expr_ops(e.a) + expr_ops(e.b)
    if isinstance(e, plonk.Scaled):
        return 1 + expr_ops(e.e)
    raise TypeError(e)


@dataclass
class GasBreakdown:
    calldata: int
    transcript: int
    field_ops: int
    inversions: int
    ec_msm: int
    pairing: int
    dispatch: int

    @property
    def verify_call(self) -> int:
        """Gas of the verifyProof CALL body (what generator.rs:79-81 pins)."""
        return (self.calldata + self.transcript + self.field_ops
                + self.inversions + self.ec_msm + self.pairing
                + self.dispatch)

    @property
    def tx(self) -> int:
        """Full-transaction cost (intrinsic 21k on top of the call)."""
        return G_TX + self.verify_call


def proof_layout(cs: plonk.ConstraintSystem, pcs: str = "bdfg21"):
    """(n_commitments_in_proof, n_evals_in_proof, n_vk_commitments).

    Mirrors the proof-layout math of ConstraintSystemMeta
    (`halo2-verifier/src/lib/codegen/util.rs:46-69`) for this repo's
    transcript schedule (proof/plonk.py module docstring).
    """
    nz = cs.num_permutation_zs()
    nlk = len(cs.lookups)
    commits = (cs.num_advice          # phase-1 advice
               + 2 * nlk              # permuted input/table a', s'
               + nz + nlk             # grand products (permutation + lookup)
               + 1                    # random poly
               + cs.num_quotients())  # quotient pieces
    if pcs == "bdfg21":
        commits += 2                  # W, W'
    else:  # gwc19: one W per distinct rotation
        rotations = {r for _c, r in cs.advice_queries()}
        rotations |= {r for _c, r in cs.fixed_queries()}
        rotations |= {0, 1}           # z / z_next
        if nz > 1:
            rotations |= {cs.rotation_last()}
        if nlk:
            rotations |= {-1}         # lookup permuted-input @ x*omega^-1
                                      # (plonk.py gwc19 arm, a'_prev opening)
        commits += len(rotations)
    evals = (len(cs.advice_queries()) + len(cs.fixed_queries())
             + len(cs.permutation_columns)   # common sigma polys at x
             + (3 * nz - 1 if nz else 0)     # z, z_next per chunk + z_last
             + 5 * nlk                       # z, z_next, a', a'_prev, s'
             + 1)                            # random poly at x
    vk_commits = cs.num_fixed + len(cs.permutation_columns)
    return commits, evals, vk_commits


def estimate(vk: plonk.VerifyingKey, num_instances: int | None = None,
             pcs: str = "bdfg21") -> GasBreakdown:
    """Derive the verification gas of the rendered verifier for ``vk``."""
    cs = vk.cs
    if num_instances is None:
        num_instances = max((c.index + 1 for c in cs.permutation_columns
                             if c.kind == "instance"), default=1)
        num_instances = max(num_instances, 8)  # shielder pubs are 8-13 wide
    commits, evals, vk_commits = proof_layout(cs, pcs)
    proof_bytes = 64 * commits + 32 * evals

    # calldata: abi header + proof + instances; field elements are dense
    # (1/256 zero bytes on average)
    n_bytes = 4 + 64 + 32 + proof_bytes + 32 * num_instances
    calldata = round(n_bytes * (G_CALLDATA_NONZERO * 255
                                + G_CALLDATA_ZERO) / 256)

    # transcript: every proof byte is absorbed and re-hashed once per
    # squeeze of its phase; challenges = theta? beta gamma y x + 2 multiopen
    n_challenges = (1 if cs.lookups else 0) + 4 + 2
    hashed_words = (proof_bytes + 32 * num_instances + 32) // 32 + 2
    transcript = (n_challenges + 1) * G_KECCAK + hashed_words * G_KECCAK_WORD

    # field arithmetic of the quotient-polynomial evaluation at x
    ops = 0
    n_exprs = 0
    for _name, exprs in cs.gates:
        for e in exprs:
            ops += expr_ops(e)
            n_exprs += 1
    ncols = len(cs.permutation_columns)
    nz = cs.num_permutation_zs()
    # permutation rows: l_0/l_last boundary rows + per-chunk product rows
    ops += 6 * max(nz - 1, 0) + 8
    ops += 5 * ncols + 4 * nz
    n_exprs += 2 * nz + max(nz - 1, 0) + 2
    for _name, ins, tabs in cs.lookups:
        ops += sum(expr_ops(e) for e in ins) + sum(expr_ops(e) for e in tabs)
        ops += 2 * (len(ins) - 1 + len(tabs) - 1)  # theta folding
        ops += 14                                  # product/permuted rows
        n_exprs += 5
    ops += 2 * n_exprs          # y-Horner fold across quotient rows
    ops += 2 * cs.k + 4         # x^n by squaring + vanishing x^n - 1
    # lagrange evals for instances + l_0 + l_last/l_blind range
    n_lag = num_instances + 2 + cs.blinding_factors()
    ops += 5 * n_lag
    # multiopen scalar work: per-eval vanishing/r-poly coefficients
    ops += 12 * evals + 8 * commits
    field_ops = ops * G_FIELD_OP

    # inversions: one batched Montgomery inversion (3 muls/elt) + 1 modexp
    inversions = G_MODEXP_INV + 3 * (n_lag + evals) * G_FIELD_OP

    # EC linear combination: every commitment (proof + VK fixed/sigma ones)
    # enters the batched-opening accumulator with a scalar
    n_ec = commits + vk_commits
    ec_msm = n_ec * (G_ECMUL + G_ECADD)
    pairing = G_PAIRING_BASE + 2 * G_PAIRING_PER_PAIR

    return GasBreakdown(calldata=calldata, transcript=transcript,
                        field_ops=field_ops, inversions=inversions,
                        ec_msm=ec_msm, pairing=pairing, dispatch=G_DISPATCH)
