"""In-process Shielder contract simulator — the EVM-analog test harness.

Plays the role of the reference's revm harness (crates/evm-utils +
contracts/Shielder.sol) for integration tests: the full entrypoint logic —
version gating, field-element checks, balance caps, protocol fees, keccak
commitments, Merkle tree + root history, nullifier registry — executed
against this framework's verifiers.  Semantics mirrored from
contracts/Shielder.sol (cites inline); errors carry the same names.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from ..ops import field_golden as G
from ..ops.keccak import keccak256
from . import consts, merkle

P = G.FR_MODULUS

MAX_TRANSACTION_AMOUNT = (1 << 112) - 1  # Shielder.sol:47
MAX_CONTRACT_BALANCE = MAX_TRANSACTION_AMOUNT  # Shielder.sol:53
CONTRACT_VERSION = 0x000101  # bytes3, Shielder.sol:39


class ShielderError(Exception):
    """Named like the contract's custom errors (Shielder.sol:104-115)."""


def _revert(name: str):
    raise ShielderError(name)


def _be32(x: int) -> bytes:
    return int(x).to_bytes(32, "big")


def new_account_commitment(caller: int, protocol_fee: int) -> int:
    """keccak(addr-as-u256 || fee) >> 4 (Shielder.sol:351-356)."""
    return int.from_bytes(
        keccak256(_be32(caller) + _be32(protocol_fee)), "big") >> 4


def deposit_commitment(caller: int, protocol_fee: int) -> int:
    """Same shape for deposit (Shielder.sol:504-519)."""
    return new_account_commitment(caller, protocol_fee)


def withdraw_commitment(withdrawal_address: int, relayer_address: int,
                        relayer_fee: int, chain_id: int, pocket_money: int,
                        protocol_fee: int, memo: bytes = b"") -> int:
    """keccak(version3 || addr || relayer || fee || chain || pocket ||
    protocolFee || memo) >> 4 (Shielder.sol:685-698)."""
    blob = (CONTRACT_VERSION.to_bytes(3, "big") + _be32(withdrawal_address)
            + _be32(relayer_address) + _be32(relayer_fee) + _be32(chain_id)
            + _be32(pocket_money) + _be32(protocol_fee) + memo)
    return int.from_bytes(keccak256(blob), "big") >> 4


@dataclass
class ShielderSim:
    """One deployed Shielder instance (native token only in the sim)."""

    verify_new_account: object  # (proof, pub_inputs) -> bool
    verify_deposit: object
    verify_withdraw: object
    ar_pubkey: tuple
    chain_id: int = 1
    deposit_fee_bps: int = 0
    withdraw_fee_bps: int = 0
    protocol_fee_receiver: int = 0xFEE
    tree_height: int = consts.TREE_HEIGHT
    paused: bool = False

    tree: merkle.MerkleTree = None
    nullifiers: dict = dc_field(default_factory=dict)
    balance: int = 0
    balances: dict = dc_field(default_factory=dict)  # address -> native funds
    block_number: int = 1
    events: list = dc_field(default_factory=list)

    def __post_init__(self):
        if self.tree is None:
            self.tree = merkle.MerkleTree(height=self.tree_height)

    # -- modifiers --

    def _check_version(self, expected: int):
        if expected != CONTRACT_VERSION:
            _revert("WrongContractVersion")

    def _field(self, *xs):
        for x in xs:
            if not 0 <= x < P:
                _revert("NotAFieldElement")

    def _not_paused(self):
        if self.paused:
            _revert("EnforcedPause")

    def _register_nullifier(self, h: int):
        # block+1 so "0 means unseen" (contracts/Nullifiers.sol:48-58)
        self.nullifiers[h] = self.block_number + 1
        self.block_number += 1

    # -- entrypoints (native variants; Shielder.sol:204-252, 383-431, 532-582) --

    def new_account_native(self, *, expected_version: int, caller: int,
                           amount: int, new_note: int, prenullifier: int,
                           sym_c1: tuple, sym_c2: tuple, mac_salt: int,
                           mac_commitment: int, proof: bytes,
                           memo: bytes = b"") -> int:
        self._not_paused()
        self._check_version(expected_version)
        if self.balance + amount > MAX_CONTRACT_BALANCE:
            _revert("ContractBalanceLimitReached")
        self._field(new_note, prenullifier, sym_c1[0], sym_c1[1], sym_c2[0],
                    sym_c2[1], mac_salt, mac_commitment)
        if self.nullifiers.get(prenullifier, 0) != 0:
            _revert("DuplicatedNullifier")
        protocol_fee = consts.protocol_fee_from_gross(amount, self.deposit_fee_bps)
        pub = [
            new_note, prenullifier, amount - protocol_fee,
            new_account_commitment(caller, protocol_fee), 0,
            self.ar_pubkey[0], self.ar_pubkey[1],
            sym_c1[0], sym_c1[1], sym_c2[0], sym_c2[1],
            mac_salt, mac_commitment,
        ]
        if not self.verify_new_account(proof, pub):
            _revert("NewAccountVerificationFailed")
        idx = self.tree.add_note(new_note)
        self._register_nullifier(prenullifier)
        self.balance += amount - protocol_fee
        self.balances[self.protocol_fee_receiver] = (
            self.balances.get(self.protocol_fee_receiver, 0) + protocol_fee)
        self.events.append(("NewAccount", new_note, idx, amount, protocol_fee,
                            memo))
        return idx

    def deposit_native(self, *, expected_version: int, caller: int,
                       amount: int, old_nullifier_hash: int, new_note: int,
                       merkle_root: int, mac_salt: int, mac_commitment: int,
                       proof: bytes, memo: bytes = b"") -> int:
        self._not_paused()
        self._check_version(expected_version)
        if amount == 0:
            _revert("ZeroAmount")
        if self.balance + amount > MAX_CONTRACT_BALANCE:
            _revert("ContractBalanceLimitReached")
        self._field(old_nullifier_hash, new_note, mac_salt, mac_commitment)
        if not self.tree.root_exists(merkle_root):
            _revert("MerkleRootDoesNotExist")
        if self.nullifiers.get(old_nullifier_hash, 0) != 0:
            _revert("DuplicatedNullifier")
        protocol_fee = consts.protocol_fee_from_gross(amount, self.deposit_fee_bps)
        pub = [
            merkle_root, old_nullifier_hash, new_note, amount - protocol_fee,
            deposit_commitment(caller, protocol_fee), 0,
            mac_salt, mac_commitment,
        ]
        if not self.verify_deposit(proof, pub):
            _revert("DepositVerificationFailed")
        idx = self.tree.add_note(new_note)
        self._register_nullifier(old_nullifier_hash)
        self.balance += amount - protocol_fee
        self.balances[self.protocol_fee_receiver] = (
            self.balances.get(self.protocol_fee_receiver, 0) + protocol_fee)
        self.events.append(("Deposit", new_note, idx, amount, protocol_fee,
                            memo))
        return idx

    def withdraw_native(self, *, expected_version: int, amount: int,
                        withdrawal_address: int, merkle_root: int,
                        old_nullifier_hash: int, new_note: int, proof: bytes,
                        relayer_address: int, relayer_fee: int, mac_salt: int,
                        mac_commitment: int, pocket_money: int = 0,
                        memo: bytes = b"") -> int:
        self._not_paused()
        self._check_version(expected_version)
        if amount == 0:
            _revert("ZeroAmount")
        if amount > MAX_TRANSACTION_AMOUNT:
            _revert("AmountTooHigh")
        protocol_fee = consts.protocol_fee_from_gross(amount, self.withdraw_fee_bps)
        if amount - protocol_fee <= relayer_fee:
            _revert("FeeHigherThanAmount")
        if not self.tree.root_exists(merkle_root):
            _revert("MerkleRootDoesNotExist")
        if self.nullifiers.get(old_nullifier_hash, 0) != 0:
            _revert("DuplicatedNullifier")
        self._field(old_nullifier_hash, new_note)
        pub = [
            merkle_root, old_nullifier_hash, new_note, amount, 0,
            withdraw_commitment(withdrawal_address, relayer_address,
                                relayer_fee, self.chain_id, pocket_money,
                                protocol_fee, memo),
            mac_salt, mac_commitment,
        ]
        if not self.verify_withdraw(proof, pub):
            _revert("WithdrawVerificationFailed")
        idx = self.tree.add_note(new_note)
        self._register_nullifier(old_nullifier_hash)
        if amount > self.balance:
            _revert("NativeTransferFailed")
        self.balance -= amount
        recv = amount - protocol_fee - relayer_fee
        self.balances[withdrawal_address] = (
            self.balances.get(withdrawal_address, 0) + recv)
        self.balances[relayer_address] = (
            self.balances.get(relayer_address, 0) + relayer_fee)
        self.balances[self.protocol_fee_receiver] = (
            self.balances.get(self.protocol_fee_receiver, 0) + protocol_fee)
        self.events.append(("Withdraw", new_note, idx, amount, protocol_fee,
                            memo))
        return idx

    # -- views (MerkleTree.sol:92-118, Nullifiers.sol:43-46) --

    def get_merkle_path(self, index: int) -> list[int]:
        return self.tree.get_merkle_path(index)

    def nullifier_block(self, h: int) -> int:
        return self.nullifiers.get(h, 0)
