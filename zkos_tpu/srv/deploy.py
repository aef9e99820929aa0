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
