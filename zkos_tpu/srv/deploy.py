"""Full-suite deployment: the integration-tests Deployment fixture analog.

The reference deploys the whole contract suite to its in-process EVM —
ERC1967 proxy + Shielder implementation with manual library-placeholder
linking for the Poseidon2 and verifier library addresses, plus the
always-reverting transfer-failure sentinel
(`crates/integration-tests/src/shielder/deploy.rs:62-65,121-326`).

Here the same topology is assembled over the EvmRunner: the three
generated verifier twins from ``artifacts/`` are loaded as the
verification libraries (the *real* verification algorithm with the
embedded VKs — not stubs), the Poseidon2 schedule module stands at the
hash-library address, and ShielderSim is the implementation behind the
"proxy" address.  Tests that drive real proofs through this deployment
exercise exactly the reference's prove -> deploy -> verify-on-chain
loop (src/verifier.rs:61-151).
"""

from __future__ import annotations

import importlib.util
import os
from dataclasses import dataclass

from ..protocol import contract as contract_mod
from . import evm_runner as ev

ART = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                   "artifacts")

#: fixed well-known addresses (deploy.rs uses deterministic actors)
POSEIDON2_ADDRESS = 0x70521D
NEW_ACCOUNT_VERIFIER_ADDRESS = 0x7E1
DEPOSIT_VERIFIER_ADDRESS = 0x7E2
WITHDRAW_VERIFIER_ADDRESS = 0x7E3
SHIELDER_PROXY_ADDRESS = 0x5F1E1D


def load_artifact_module(name: str, art_dir: str = ART):
    """Import artifacts/{name}_verifier.py as a fresh module."""
    path = os.path.join(art_dir, f"{name}_verifier.py")
    spec = importlib.util.spec_from_file_location(f"{name}_verifier_lib",
                                                 path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@dataclass
class Deployment:
    """Addressed suite over an EvmRunner (deploy_shielder.sh analog)."""

    runner: ev.EvmRunner
    shielder: contract_mod.ShielderSim
    shielder_address: int
    verifier_addresses: dict
    poseidon2_address: int


def deploy_suite(ar_pubkey=None, tree_height: int | None = None,
                 art_dir: str = ART, verifiers: dict | None = None,
                 **sim_kwargs) -> Deployment:
    """Deploy ArbSys + Poseidon2 + three verifier libraries + Shielder.

    ``verifiers`` overrides the artifact modules (tests pass stubs for
    the behavior matrix; omitting it links the real committed twins —
    the library-placeholder linking step of deploy.rs:232-276).
    """
    if ar_pubkey is None:
        from ..ops.grumpkin_golden import GEN as ar_pubkey  # on-curve default
    runner = ev.EvmRunner.aleph_evm()
    runner.contracts[ev.REVERTING_ADDRESS] = object()  # transfer-failure

    if verifiers is None:
        verifiers = {name: load_artifact_module(name, art_dir)
                     for name in ("newaccount", "deposit", "withdraw")}

    from ..proof import poseidon2_sol

    runner.create(poseidon2_sol, address=POSEIDON2_ADDRESS)
    addr_map = {"newaccount": NEW_ACCOUNT_VERIFIER_ADDRESS,
                "deposit": DEPOSIT_VERIFIER_ADDRESS,
                "withdraw": WITHDRAW_VERIFIER_ADDRESS}
    for name, lib in verifiers.items():
        runner.create(lib, address=addr_map[name])

    def _vfy(lib):
        def check(proof: bytes, pub: list) -> bool:
            try:
                return bool(lib.verify(proof, list(pub)))
            except Exception:  # malformed proof bytes -> revert, not crash
                return False

        return check

    if tree_height is None:
        tree_height = contract_mod.consts.TREE_HEIGHT
    sim = contract_mod.ShielderSim(
        verify_new_account=_vfy(verifiers["newaccount"]),
        verify_deposit=_vfy(verifiers["deposit"]),
        verify_withdraw=_vfy(verifiers["withdraw"]),
        ar_pubkey=ar_pubkey, tree_height=tree_height, **sim_kwargs)
    runner.create(sim, address=SHIELDER_PROXY_ADDRESS)
    return Deployment(runner=runner, shielder=sim,
                      shielder_address=SHIELDER_PROXY_ADDRESS,
                      verifier_addresses=addr_map,
                      poseidon2_address=POSEIDON2_ADDRESS)


# ---------------------------------------------------------------------------
# interpreted-.sol deployment (the emitted Shielder.sol / MerkleTree.sol
# executing on the runner; protocol/contract.py remains the oracle)
# ---------------------------------------------------------------------------

MERKLE_TREE_ADDRESS = 0x3EE
OWNER_ADDRESS = 0x0007


class Poseidon2Contract:
    """Poseidon2T8Assembly stand-in executing the committed schedule
    (proof.poseidon2_sol.evaluate — the same schedule the Yul artifact is
    rendered from), metered at the reference's measured per-hash cost."""

    sol_gas = {"hash": contract_mod.GAS_POSEIDON_T8}

    def hash(self, inputs):
        from ..proof import poseidon2_sol

        assert len(inputs) == contract_mod.consts.ARITY
        return poseidon2_sol.evaluate([int(x) for x in inputs])


class MockERC20:
    """Minimal ERC20 for the harness (testcontainers-token analog):
    bool-returning transfer/transferFrom, no allowance bookkeeping."""

    sol_gas = {"transferFrom": 20_000, "transfer": 20_000,
               "balanceOf": 2_600}

    def __init__(self):
        self.bal = {}

    def mint(self, holder, amount):
        self.bal[holder] = self.bal.get(holder, 0) + amount

    def balanceOf(self, holder):  # noqa: N802 — solidity casing
        return self.bal.get(holder, 0)

    def transferFrom(self, frm, to, amount):  # noqa: N802
        if self.bal.get(frm, 0) < amount:
            return False
        self.bal[frm] -= amount
        self.mint(to, amount)
        return True

    def transfer(self, to, amount, sender):
        return self.transferFrom(sender, to, amount)


class StubVerifier:
    """Behavior-matrix verifier stub: accept iff proof == b"ok"; metered
    at the reference's measured verification gas (generator.rs:79-81)."""

    def __init__(self, kind: str, check=None):
        self.sol_gas = {"verifyProof": contract_mod.GAS_VERIFY[kind]}
        self.check = check or (lambda proof, pub: proof == b"ok")

    def verifyProof(self, proof, instances):  # noqa: N802
        return bool(self.check(bytes(proof), list(instances)))


@dataclass
class SolDeployment:
    """Interpreted-.sol suite over an EvmRunner."""

    runner: ev.EvmRunner
    shielder: object            # sol_interp.SolContract
    tree: object                # sol_interp.SolContract
    shielder_address: int
    tree_address: int
    token: MockERC20
    token_address: int


def deploy_suite_sol(ar_pubkey=None, tree_height: int | None = None,
                     art_dir: str = ART, verifiers: dict | None = None,
                     deposit_fee_bps: int = 0, withdraw_fee_bps: int = 0,
                     protocol_fee_receiver: int = 0xFEE,
                     chain_id: int = 1) -> SolDeployment:
    """Deploy the EMITTED contracts: Poseidon2 + MerkleTree.sol +
    Shielder.sol + verifier libraries, linked by address and initialized —
    the deploy.rs:121-326 fixture with the contract plane as executable
    Solidity text instead of the Python sim.

    ``verifiers`` maps {"newaccount","deposit","withdraw"} to deployed
    objects exposing verifyProof (StubVerifier for the matrix; the
    committed interpreted {Name}Verifier.sol for real-proof runs).
    """
    from ..proof import contracts_sol
    from . import sol_interp

    if ar_pubkey is None:
        from ..ops.grumpkin_golden import GEN as ar_pubkey
    if tree_height is None:
        tree_height = contract_mod.consts.TREE_HEIGHT

    runner = ev.EvmRunner.aleph_evm()
    runner.contracts[ev.REVERTING_ADDRESS] = object()
    runner.create(Poseidon2Contract(), address=POSEIDON2_ADDRESS)

    if verifiers is None:
        verifiers = {name: StubVerifier(
            {"newaccount": "new_account"}.get(name, name))
            for name in ("newaccount", "deposit", "withdraw")}
    addr_map = {"newaccount": NEW_ACCOUNT_VERIFIER_ADDRESS,
                "deposit": DEPOSIT_VERIFIER_ADDRESS,
                "withdraw": WITHDRAW_VERIFIER_ADDRESS}
    for name, lib in verifiers.items():
        runner.create(lib, address=addr_map[name])

    tree = sol_interp.SolContract(contracts_sol.render_merkle_tree(
        tree_height))
    runner.create(tree, address=MERKLE_TREE_ADDRESS)
    shielder = sol_interp.SolContract(contracts_sol.render_shielder())
    runner.create(shielder, address=SHIELDER_PROXY_ADDRESS)

    token = MockERC20()
    token_address = 0x7C57
    runner.create(token, address=token_address)

    runner.call(MERKLE_TREE_ADDRESS, "initialize",
                POSEIDON2_ADDRESS, SHIELDER_PROXY_ADDRESS)
    runner.call(SHIELDER_PROXY_ADDRESS, "initialize",
                OWNER_ADDRESS, MERKLE_TREE_ADDRESS,
                NEW_ACCOUNT_VERIFIER_ADDRESS, DEPOSIT_VERIFIER_ADDRESS,
                WITHDRAW_VERIFIER_ADDRESS, int(ar_pubkey[0]),
                int(ar_pubkey[1]), deposit_fee_bps, withdraw_fee_bps,
                protocol_fee_receiver, chain_id)
    return SolDeployment(runner=runner, shielder=shielder, tree=tree,
                         shielder_address=SHIELDER_PROXY_ADDRESS,
                         tree_address=MERKLE_TREE_ADDRESS,
                         token=token, token_address=token_address)
