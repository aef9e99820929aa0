"""In-process contract-execution harness: the evm-utils analog.

The reference tests everything against an in-process EVM (revm):
`EvmRunner::aleph_evm` boots a chain with the ArbSys precompile mocked at
address 0x64, `create` deploys bytecode under a 96 kB size limit, and
`call`/`dry_run` execute with gas accounting and revert propagation
(`crates/evm-utils/src/evm_runner.rs:43-149`).  Deployment fixtures add a
REVERTING_ADDRESS whose code is `PUSH1 0 DUP1 REVERT`
(`crates/integration-tests/src/shielder/deploy.rs:62-65`).

There is no EVM here; the deployed artifacts are Python objects — the
contract simulator (protocol.contract.ShielderSim), the generated verifier
modules (proof.codegen), Poseidon2 — so this runner provides the same
harness surface over them: addressed deployment with a size gate,
metered call / estimate-gas dry-run on a snapshot, revert propagation, the
ArbSys block-number mock, and the always-reverting sentinel used by
transfer-failure tests.
"""

from __future__ import annotations

import copy
import inspect
from dataclasses import dataclass, field as dc_field

from ..protocol import contract as contract_mod

ARBSYS_ADDRESS = 0x64
#: transfer-failure sentinel (deploy.rs:62-65: code = PUSH1 0 DUP1 REVERT)
REVERTING_ADDRESS = 0xBAD


class Revert(Exception):
    """EVM revert with a reason payload (evm_runner.rs Error::Revert)."""


class DeployError(Exception):
    pass


MAX_CODE_SIZE = 0x17700  # = 96 000, evm_runner.rs:100 limit_contract_code_size


@dataclass
class CallResult:
    output: object
    gas_used: int


@dataclass
class ArbSys:
    """The Arbitrum system precompile mock: block numbers come from here."""

    runner: "EvmRunner"

    def arbBlockNumber(self) -> int:  # noqa: N802 — solidity casing
        return self.runner.block_number

    def measure_gas(self, *_a, **_k) -> int:
        return 0


@dataclass
class EvmRunner:
    """Deploy/call/dry_run over addressed Python contract objects AND
    interpreted .sol contracts (sol_interp.SolContract), with a native
    balance ledger, atomic revert rollback, and cross-contract dispatch
    (interface calls / native sends) between deployed artifacts."""

    contracts: dict = dc_field(default_factory=dict)
    balances: dict = dc_field(default_factory=dict)  # address -> wei
    block_number: int = 1
    next_address: int = 0x1000

    @classmethod
    def aleph_evm(cls) -> "EvmRunner":
        """Boot with the ArbSys mock at 0x64 (evm_runner.rs:56-67)."""
        r = cls()
        r.contracts[ARBSYS_ADDRESS] = ArbSys(r)
        return r

    # -- cross-contract dispatch (sol_interp extcall hook) --

    def fund(self, address: int, amount: int) -> None:
        self.balances[address] = self.balances.get(address, 0) + amount

    def _transfer_native(self, frm: int, to: int, amount: int) -> bool:
        if to == REVERTING_ADDRESS:
            return False  # PUSH1 0 DUP1 REVERT (deploy.rs:62-65)
        if self.balances.get(frm, 0) < amount:
            return False
        self.balances[frm] = self.balances.get(frm, 0) - amount
        self.balances[to] = self.balances.get(to, 0) + amount
        return True

    def extcall(self, src_addr: int):
        """The (addr, method, args, value) -> (ok, ret, gas) hook wired
        into deployed SolContracts."""
        from . import sol_interp

        def do(addr, method, args, value):
            if method == "__balance__":
                return True, self.balances.get(addr, 0), 100
            if method == "__send__":
                if value == 0 and addr != REVERTING_ADDRESS:
                    return True, b"", 0
                ok = self._transfer_native(src_addr, addr, value)
                return ok, b"", 0
            target = self.contracts.get(addr)
            if target is None or addr == REVERTING_ADDRESS:
                return False, b"no code", 0
            if value and not self._transfer_native(src_addr, addr, value):
                return False, b"insufficient balance", 0
            try:
                if isinstance(target, sol_interp.SolContract):
                    self._wire(target, addr)
                    out, gas = target.call(method, *args, meter_tx=False,
                                           sender=src_addr, value=value)
                    return True, out, gas
                fn = getattr(target, method, None)
                if fn is None:
                    return False, f"unknown method {method}".encode(), 0
                if "sender" in inspect.signature(fn).parameters:
                    out = fn(*args, sender=src_addr)
                else:
                    out = fn(*args)
                gas = getattr(target, "sol_gas", {}).get(method, 0)
                return True, out, gas
            except sol_interp.SolRevert as e:
                return False, str(e).encode(), 0

        return do

    def _wire(self, c, address: int) -> None:
        """Attach runner context to a deployed SolContract."""
        c.address = address
        c.block_number = self.block_number
        c.extcall = self.extcall(address)

    def create(self, artifact, address: int | None = None) -> int:
        """Deploy ``artifact`` at an address.

        Accepts any callable-bearing Python object OR a parsed
        ``sol_interp.SolContract`` (the committed .sol text, executed by
        the interpreter with real gas metering).  Enforces the 96 kB
        contract-size limit on the artifact's source — the analog of
        evm_runner.rs:95-104's bytecode-length gate (the generated
        verifiers are the only artifacts near the limit).
        """
        from . import sol_interp

        if isinstance(artifact, sol_interp.SolContract):
            size = artifact.source_size
        else:
            try:
                size = len(inspect.getsource(type(artifact)).encode())
            except (OSError, TypeError):
                size = 0
            if inspect.ismodule(artifact):
                try:
                    size = len(inspect.getsource(artifact).encode())
                except OSError:
                    size = 0
        if size > MAX_CODE_SIZE:
            raise DeployError(f"contract size {size} exceeds {MAX_CODE_SIZE}")
        if address is None:
            address = self.next_address
            self.next_address += 1
        if address in self.contracts:
            raise DeployError(f"address {address:#x} already occupied")
        self.contracts[address] = artifact
        return address

    def _execute(self, target, address: int, method: str, args, kwargs,
                 caller: int | None, value: int):
        from . import sol_interp

        if address == REVERTING_ADDRESS:
            raise Revert("REVERTING_ADDRESS")
        if isinstance(target, sol_interp.SolContract):
            # interpreted .sol artifact: execute the text, meter real gas
            if method not in target.funcs:
                raise Revert(f"unknown method {method}")
            self._wire(target, address)
            if value:
                # tx value is credited to the callee up front (the EOA's
                # funds are out of scope for the harness ledger)
                self.balances[address] = \
                    self.balances.get(address, 0) + value
            try:
                out, gas = target.call(method, *args, sender=caller or 0,
                                       value=value)
            except sol_interp.SolRevert as e:
                raise Revert(str(e) or "SolRevert") from e
            return out, gas
        fn = getattr(target, method, None)
        if fn is None or not callable(fn):
            raise Revert(f"unknown method {method}")
        # keep the sim's clock in step with ours (ShielderSim meters gas
        # and registers nullifiers against its own block_number)
        if isinstance(target, contract_mod.ShielderSim):
            target.block_number = self.block_number
            if caller is not None and "caller" in inspect.signature(fn).parameters:
                kwargs.setdefault("caller", caller)
            if value and "value" in inspect.signature(fn).parameters:
                kwargs.setdefault("value", value)
        out = fn(*args, **kwargs)
        if isinstance(target, contract_mod.ShielderSim):
            # last_gas already includes the 21k intrinsic (contract.py _meter)
            gas = target.last_gas
        else:
            gas = contract_mod.GAS_BASE_TX
        return out, gas

    # -- tx-atomic state snapshot (an EVM revert rolls back EVERYTHING;
    #    the interpreter itself has no journal, so the runner provides the
    #    transaction boundary semantics of revm)

    def _snapshot(self):
        from . import sol_interp

        state = {}
        for addr, target in self.contracts.items():
            if isinstance(target, sol_interp.SolContract):
                state[addr] = ("sol", copy.deepcopy(target.storage),
                               list(target.logs))
            elif isinstance(target, ArbSys) or inspect.ismodule(target) \
                    or not hasattr(target, "__dict__"):
                continue  # stateless / runner-backed
            else:
                # snapshot attributes, restore IN PLACE so outside handles
                # to the deployed object stay valid
                state[addr] = ("obj", copy.deepcopy(target.__dict__))
        return state, dict(self.balances), self.block_number

    def _restore(self, snap):
        state, balances, block_number = snap
        for addr, entry in state.items():
            if entry[0] == "sol":
                self.contracts[addr].storage = entry[1]
                self.contracts[addr].logs = entry[2]
            else:
                obj = self.contracts[addr]
                obj.__dict__.clear()
                obj.__dict__.update(entry[1])
        self.balances = balances
        self.block_number = block_number

    def call(self, address: int, method: str, *args, caller: int | None = None,
             value: int = 0, **kwargs) -> CallResult:
        """State-mutating call; advances the block (evm_runner.rs:106-127).
        A revert rolls the whole transaction back (state + ledger)."""
        target = self.contracts.get(address)
        if target is None:
            raise Revert(f"no code at {address:#x}")
        snap = self._snapshot()
        try:
            out, gas = self._execute(target, address, method, args, kwargs,
                                     caller, value)
        except Revert:
            self._restore(snap)
            raise
        except (contract_mod.ShielderError, ValueError, AssertionError) as e:
            self._restore(snap)
            raise Revert(str(e) or type(e).__name__) from e
        self.block_number += 1
        return CallResult(output=out, gas_used=gas)

    def dry_run(self, address: int, method: str, *args,
                caller: int | None = None, value: int = 0,
                **kwargs) -> CallResult:
        """EstimateGas semantics: execute, then discard ALL state changes
        (evm_runner.rs:129-149; shielder-contract CallType::DryRun)."""
        target = self.contracts.get(address)
        if target is None:
            raise Revert(f"no code at {address:#x}")
        snap = self._snapshot()
        try:
            out, gas = self._execute(target, address, method, args, kwargs,
                                     caller, value)
        except Revert:
            self._restore(snap)
            raise
        except (contract_mod.ShielderError, ValueError, AssertionError) as e:
            self._restore(snap)
            raise Revert(str(e) or type(e).__name__) from e
        self._restore(snap)
        return CallResult(output=out, gas_used=gas)
