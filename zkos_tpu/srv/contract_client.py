"""Typed chain-interaction client — the shielder-contract crate analog.

``ShielderUser`` wraps one identity's calls to the Shielder with the
reference's call-mode strategy types (crates/shielder-contract/src/
call_type.rs:11-82 Call | Submit | DryRun | EstimateGas, api.rs facade):

- Call:        read-only views (merkle paths, nullifier registry);
- DryRun:      execute an entrypoint against a throwaway state copy;
- EstimateGas: DryRun that returns the sim's metered gas;
- Submit:      consume a signer nonce (NonceManager semantics, providers.rs)
               and mutate chain state, with SignerConflict classification.

Event decoding + nullifier-indexed state recovery live in srv.client
(recovery.rs analog); this module is the strategy/provider layer beneath
them.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from ..protocol.contract import ShielderSim
from .relayer import NonceManager, SignerConflict


@dataclass
class ShielderUser:
    """One signer's typed facade over a deployed Shielder (api.rs:24-35)."""

    sim: ShielderSim
    signer: int
    nonces: NonceManager = dc_field(default_factory=NonceManager)

    # -- Call (read-only views) --

    def get_merkle_path(self, index: int) -> list[int]:
        return self.sim.get_merkle_path(index)

    def current_merkle_root(self) -> int:
        return self.sim.get_merkle_path(0)[-1]

    def nullifier_block(self, h: int) -> int:
        return self.sim.nullifier_block(h)

    # -- DryRun / EstimateGas --

    def dry_run(self, method: str, **kwargs):
        result, _gas = self.sim.dry_run(method, **kwargs)
        return result

    def estimate_gas(self, method: str, **kwargs) -> int:
        _result, gas = self.sim.dry_run(method, **kwargs)
        return gas

    # -- Submit --

    def submit(self, method: str, **kwargs) -> int:
        """Nonce-consuming state mutation; raises SignerConflict on a race
        (classified like lib.rs:50-61), leaving chain state untouched."""
        nonce = self.nonces.next_nonce(self.signer)
        self.nonces.submit(self.signer, nonce)  # tx acceptance point
        try:
            return getattr(self.sim, method)(**kwargs)
        except Exception:
            # reverted txs still consumed the nonce (EVM semantics)
            raise

    def submit_with_retry(self, method: str, **kwargs) -> int:
        """One resync retry on SignerConflict (the taskmaster recovery)."""
        try:
            return self.submit(method, **kwargs)
        except SignerConflict:
            self.nonces.resync(self.signer)
            return self.submit(method, **kwargs)
