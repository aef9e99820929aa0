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


# Gas model of the simulated EVM: per-entrypoint verifier costs are the
# reference's measured verification gas (crates/halo2-verifier/src/
# generator.rs:79-81); the rest are standard EVM cost anchors.  The sim
# meters every call so dry-run gas estimation and gas-regression tests
# behave like the reference's revm harness (evm-utils/src/evm_runner.rs,
# integration-tests/src/bin/gas_consumption.rs).
GAS_VERIFY = {"new_account": 642_011, "deposit": 831_764, "withdraw": 925_323}
GAS_BASE_TX = 21_000
GAS_POSEIDON_T8 = 5_300          # one Poseidon2T8Assembly call
GAS_SSTORE_NEW = 22_100          # nullifier + note slots
GAS_NATIVE_TRANSFER = 9_000
GAS_ERC20_TRANSFER = 27_000
GAS_LOG = 2_000
GAS_CALLDATA_BYTE = 16


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
    """One deployed Shielder instance: native + ERC20 entrypoints.

    ERC20 tokens live in an in-sim ledger (token_balances) with SafeERC20
    revert semantics; native funds in ``balances``.
    """

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
    token_balances: dict = dc_field(default_factory=dict)  # (token, addr) -> amt
    block_number: int = 1
    events: list = dc_field(default_factory=list)

    last_gas: int = 0

    def __post_init__(self):
        if self.tree is None:
            self.tree = merkle.MerkleTree(height=self.tree_height)
        self._check_ar_pubkey(self.ar_pubkey)

    @staticmethod
    def _check_ar_pubkey(pk: tuple) -> None:
        """Grumpkin on-curve gate at set-time: y^2 == x^3 - 17 over Fr
        (contracts/AnonymityRevoker.sol:38-59 validates before storing)."""
        x, y = int(pk[0]), int(pk[1])
        p = P
        if (y * y) % p != (x * x * x - 17) % p:
            raise ShielderError("AnonymityRevokerPubkeyNotOnCurve")

    def set_anonymity_revoker(self, new_pubkey: tuple) -> None:
        """Owner rotation of the AR key, with the same on-curve gate."""
        self._check_ar_pubkey(new_pubkey)
        self.ar_pubkey = (int(new_pubkey[0]), int(new_pubkey[1]))

    # -- gas metering + dry-run (the sim's eth_estimateGas) --

    def _meter(self, action: str, n_transfers_native: int = 0,
               n_transfers_erc20: int = 0, memo: bytes = b"",
               proof: bytes = b""):
        self.last_gas = (
            GAS_BASE_TX + GAS_VERIFY[action]
            + self.tree_height * GAS_POSEIDON_T8
            + 2 * GAS_SSTORE_NEW  # note slot + nullifier registry
            + n_transfers_native * GAS_NATIVE_TRANSFER
            + n_transfers_erc20 * GAS_ERC20_TRANSFER
            + GAS_LOG + GAS_CALLDATA_BYTE * (len(memo) + len(proof)))

    def dry_run(self, method: str, **kwargs) -> tuple:
        """EstimateGas semantics: execute against a throwaway copy.

        Returns (result, gas) or raises the revert — the analog of
        shielder-contract's CallType::EstimateGas (src/call_type.rs:11-82)
        on the in-process EVM (evm-utils/src/evm_runner.rs:129-149).
        """
        import copy

        snap = copy.deepcopy(self)
        out = getattr(snap, method)(**kwargs)
        return out, snap.last_gas

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
        self.events.append(dict(
            kind="NewAccount", note=new_note, index=idx, amount=amount,
            protocol_fee=protocol_fee, memo=memo, token=0, caller=caller,
            prenullifier=prenullifier, sym_c1=sym_c1, sym_c2=sym_c2,
            mac_salt=mac_salt, mac_commitment=mac_commitment))
        self._meter("new_account", n_transfers_native=1, memo=memo, proof=proof)
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
        self.events.append(dict(
            kind="Deposit", note=new_note, index=idx, amount=amount,
            protocol_fee=protocol_fee, memo=memo, token=0, caller=caller,
            mac_salt=mac_salt, mac_commitment=mac_commitment))
        self._meter("deposit", n_transfers_native=1, memo=memo, proof=proof)
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
        if amount > self.balance:
            _revert("NativeTransferFailed")  # atomic: no state mutated yet
        idx = self.tree.add_note(new_note)
        self._register_nullifier(old_nullifier_hash)
        self.balance -= amount
        recv = amount - protocol_fee - relayer_fee
        self.balances[withdrawal_address] = (
            self.balances.get(withdrawal_address, 0) + recv)
        self.balances[relayer_address] = (
            self.balances.get(relayer_address, 0) + relayer_fee)
        self.balances[self.protocol_fee_receiver] = (
            self.balances.get(self.protocol_fee_receiver, 0) + protocol_fee)
        self.events.append(dict(
            kind="Withdraw", note=new_note, index=idx, amount=amount,
            protocol_fee=protocol_fee, memo=memo, token=0,
            relayer=relayer_address, to=withdrawal_address,
            mac_salt=mac_salt, mac_commitment=mac_commitment))
        self._meter("withdraw", n_transfers_native=3, memo=memo, proof=proof)
        return idx

    # -- ERC20 ledger (the sim's stand-in for SafeERC20 token contracts) --

    CONTRACT_ADDR = 0x51E1D  # the sim's own address in the token ledger

    def erc20_mint(self, token: int, holder: int, amount: int):
        key = (token, holder)
        self.token_balances[key] = self.token_balances.get(key, 0) + amount

    def erc20_balance_of(self, token: int, holder: int) -> int:
        return self.token_balances.get((token, holder), 0)

    def _transfer_erc20(self, token: int, frm: int, to: int, amount: int):
        """safeTransferFrom semantics: revert on insufficient balance
        (Shielder.sol:723-734 via OpenZeppelin SafeERC20)."""
        if amount == 0:
            return
        key = (token, frm)
        if self.token_balances.get(key, 0) < amount:
            _revert("SafeERC20FailedOperation")
        self.token_balances[key] -= amount
        self.erc20_mint(token, to, amount)

    # -- ERC20 entrypoints (Shielder.sol:260-312, 430-494, 584-656) --

    def new_account_erc20(self, *, expected_version: int, caller: int,
                          token_address: int, amount: int, new_note: int,
                          prenullifier: int, sym_c1: tuple, sym_c2: tuple,
                          mac_salt: int, mac_commitment: int, proof: bytes,
                          memo: bytes = b"") -> int:
        self._not_paused()
        self._check_version(expected_version)
        if (amount > MAX_CONTRACT_BALANCE
                or self.erc20_balance_of(token_address, self.CONTRACT_ADDR)
                + amount > MAX_CONTRACT_BALANCE):
            _revert("ContractBalanceLimitReached")
        self._field(new_note, prenullifier, sym_c1[0], sym_c1[1], sym_c2[0],
                    sym_c2[1], mac_salt, mac_commitment, token_address)
        if self.nullifiers.get(prenullifier, 0) != 0:
            _revert("DuplicatedNullifier")
        protocol_fee = consts.protocol_fee_from_gross(amount, self.deposit_fee_bps)
        pub = [
            new_note, prenullifier, amount - protocol_fee,
            new_account_commitment(caller, protocol_fee), token_address,
            self.ar_pubkey[0], self.ar_pubkey[1],
            sym_c1[0], sym_c1[1], sym_c2[0], sym_c2[1],
            mac_salt, mac_commitment,
        ]
        if not self.verify_new_account(proof, pub):
            _revert("NewAccountVerificationFailed")
        # transfers first: a SafeERC20 revert must leave no state behind
        self._transfer_erc20(token_address, caller, self.CONTRACT_ADDR, amount)
        self._transfer_erc20(token_address, self.CONTRACT_ADDR,
                             self.protocol_fee_receiver, protocol_fee)
        idx = self.tree.add_note(new_note)
        self._register_nullifier(prenullifier)
        self.events.append(dict(
            kind="NewAccountERC20", note=new_note, index=idx, amount=amount,
            protocol_fee=protocol_fee, memo=memo, token=token_address,
            caller=caller, prenullifier=prenullifier, sym_c1=sym_c1,
            sym_c2=sym_c2, mac_salt=mac_salt, mac_commitment=mac_commitment))
        self._meter("new_account", n_transfers_erc20=2, memo=memo, proof=proof)
        return idx

    def deposit_erc20(self, *, expected_version: int, caller: int,
                      token_address: int, amount: int,
                      old_nullifier_hash: int, new_note: int,
                      merkle_root: int, mac_salt: int, mac_commitment: int,
                      proof: bytes, memo: bytes = b"") -> int:
        self._not_paused()
        self._check_version(expected_version)
        if amount == 0:
            _revert("ZeroAmount")
        if (amount > MAX_CONTRACT_BALANCE
                or self.erc20_balance_of(token_address, self.CONTRACT_ADDR)
                + amount > MAX_CONTRACT_BALANCE):
            _revert("ContractBalanceLimitReached")
        self._field(old_nullifier_hash, new_note, mac_salt, mac_commitment,
                    token_address)
        if not self.tree.root_exists(merkle_root):
            _revert("MerkleRootDoesNotExist")
        if self.nullifiers.get(old_nullifier_hash, 0) != 0:
            _revert("DuplicatedNullifier")
        protocol_fee = consts.protocol_fee_from_gross(amount, self.deposit_fee_bps)
        pub = [
            merkle_root, old_nullifier_hash, new_note, amount - protocol_fee,
            deposit_commitment(caller, protocol_fee), token_address,
            mac_salt, mac_commitment,
        ]
        if not self.verify_deposit(proof, pub):
            _revert("DepositVerificationFailed")
        self._transfer_erc20(token_address, caller, self.CONTRACT_ADDR, amount)
        self._transfer_erc20(token_address, self.CONTRACT_ADDR,
                             self.protocol_fee_receiver, protocol_fee)
        idx = self.tree.add_note(new_note)
        self._register_nullifier(old_nullifier_hash)
        self.events.append(dict(
            kind="DepositERC20", note=new_note, index=idx, amount=amount,
            protocol_fee=protocol_fee, memo=memo, token=token_address,
            caller=caller, mac_salt=mac_salt, mac_commitment=mac_commitment))
        self._meter("deposit", n_transfers_erc20=2, memo=memo, proof=proof)
        return idx

    def withdraw_erc20(self, *, expected_version: int, token_address: int,
                       amount: int, withdrawal_address: int, merkle_root: int,
                       old_nullifier_hash: int, new_note: int, proof: bytes,
                       relayer_address: int, relayer_fee: int, mac_salt: int,
                       mac_commitment: int, msg_value: int = 0,
                       memo: bytes = b"") -> int:
        """ERC20 withdraw; the relayer's msg.value becomes the recipient's
        native pocket money (Shielder.sol:599, 628)."""
        self._not_paused()
        self._check_version(expected_version)
        if amount == 0:
            _revert("ZeroAmount")
        if amount > MAX_TRANSACTION_AMOUNT:
            _revert("AmountTooHigh")
        pocket_money = msg_value
        protocol_fee = consts.protocol_fee_from_gross(amount, self.withdraw_fee_bps)
        if amount - protocol_fee <= relayer_fee:
            _revert("FeeHigherThanAmount")
        if not self.tree.root_exists(merkle_root):
            _revert("MerkleRootDoesNotExist")
        if self.nullifiers.get(old_nullifier_hash, 0) != 0:
            _revert("DuplicatedNullifier")
        self._field(old_nullifier_hash, new_note, token_address)
        pub = [
            merkle_root, old_nullifier_hash, new_note, amount, token_address,
            withdraw_commitment(withdrawal_address, relayer_address,
                                relayer_fee, self.chain_id, pocket_money,
                                protocol_fee, memo),
            mac_salt, mac_commitment,
        ]
        if not self.verify_withdraw(proof, pub):
            _revert("WithdrawVerificationFailed")
        recv = amount - protocol_fee - relayer_fee
        self._transfer_erc20(token_address, self.CONTRACT_ADDR,
                             withdrawal_address, recv)
        self._transfer_erc20(token_address, self.CONTRACT_ADDR,
                             relayer_address, relayer_fee)
        self._transfer_erc20(token_address, self.CONTRACT_ADDR,
                             self.protocol_fee_receiver, protocol_fee)
        idx = self.tree.add_note(new_note)
        self._register_nullifier(old_nullifier_hash)
        # native pocket money rides along from the relayer's msg.value
        self.balances[withdrawal_address] = (
            self.balances.get(withdrawal_address, 0) + pocket_money)
        self.events.append(dict(
            kind="WithdrawERC20", note=new_note, index=idx, amount=amount,
            protocol_fee=protocol_fee, memo=memo, token=token_address,
            relayer=relayer_address, to=withdrawal_address,
            mac_salt=mac_salt, mac_commitment=mac_commitment))
        self._meter("withdraw", n_transfers_erc20=3, n_transfers_native=1,
                    memo=memo, proof=proof)
        return idx

    # -- views (MerkleTree.sol:92-118, Nullifiers.sol:43-46) --

    def get_merkle_path(self, index: int) -> list[int]:
        return self.tree.get_merkle_path(index)

    def nullifier_block(self, h: int) -> int:
        return self.nullifiers.get(h, 0)
