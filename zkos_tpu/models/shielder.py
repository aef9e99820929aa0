"""The three Shielder relations: NewAccount, Deposit, Withdraw.

Public-input layouts are normative from the contract's array construction
(SURVEY.md A.1; contracts/Shielder.sol:346-367, 504-519, 679-700):

NewAccount (13): [hNote, prenullifier, initialDeposit, commitment,
  tokenAddress, arPubX, arPubY, C1x, C1y, C2x, C2y, macSalt, macCommitment]
Deposit (8): [merkleRoot, hNullifierOld, hNoteNew, value, commitment,
  tokenAddress, macSalt, macCommitment]
Withdraw (8): [merkleRoot, hNullifierOld, hNoteNew, value, tokenAddress,
  commitment, macSalt, macCommitment]

Advice fields mirror NewAccountProverKnowledge / DepositProverKnowledge /
WithdrawProverKnowledge (crates/shielder-account/src/call_data.rs:150-162,
282-292; crates/shielder_bindings/src/circuits/withdraw.rs:100-111).

Relation semantics (reconstructed where the external shielder-circuits crate
is not vendored; all hashing is Poseidon2 per SURVEY.md A.5):
- note = hash5(version=0, id, nullifier, balance, token)  (protocol.notes)
- prenullifier / hNullifierOld = hash1(id) / hash1(nullifier_old)
  (the nullifier-hash convention of shielder-cli/src/recovery.rs:31)
- viewing key = Grumpkin point with x = id ("on-curve id"); ElGamal to the
  AR pubkey with the ephemeral scalar bits from encryption_salt (A.4)
- macCommitment = hash2(macSalt, id)  (ar-cli/src/revoke.rs:33)
- Merkle membership: 7-ary tree, child ∈ siblings at each of `height`
  levels with hash7 per level (contracts/MerkleTree.sol:121-148)
- balances range-checked to 112 bits (MAX_TRANSACTION_AMOUNT = 2^112 - 1,
  contracts/Shielder.sol:47)

Salt scalars are restricted to 248 bits so bit recomposition cannot wrap the
field (documented framework choice).
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass

from ..ops import field_golden as G
from ..ops import grumpkin_golden as GR
from ..protocol import consts
from ..proof import plonk, srs as srs_mod
from . import gadgets as gd

P = G.FR_MODULUS
NOTE_VERSION = 0
SALT_BITS = 248
BALANCE_BITS = 112


def _cs_with_copies(k: int, b: gd.Builder) -> plonk.ConstraintSystem:
    cs = gd.build_constraint_system(k)
    cs.permutation_columns = (
        [plonk.Column("advice", i) for i in range(gd.NUM_ADVICE)]
        + [plonk.Column("instance", 0)])
    cs.copies = b.copies
    return cs


def _note_cell(b, id_cell, nullifier_cell, balance_cell, token_cell):
    version = b.constant_cell(NOTE_VERSION)
    return gd.poseidon_hash(
        b, [version, id_cell, nullifier_cell, balance_cell, token_cell])


def _merkle_cells(b, leaf_cell, path: list[list[int]]):
    """Constrain leaf ∈ tree with the given sibling levels; returns root cell.

    path: height lists of 7 sibling values (getMerklePath layout without the
    trailing root, protocol.merkle.path_to_matrix).
    """
    child = leaf_cell
    for level in path:
        sib_cells = [gd.witness_cell(b, v) for v in level]
        gd.one_hot_select7(b, sib_cells, child)
        child = gd.poseidon_hash(b, sib_cells)
    return child


# ---------------------------------------------------------------------------
# NewAccount
# ---------------------------------------------------------------------------

@dataclass
class NewAccountProverKnowledge:
    id: int
    nullifier: int
    initial_deposit: int
    commitment: int
    token_address: int
    encryption_salt: int  # < 2^248
    ar_pubkey: tuple  # grumpkin affine (x, y)
    mac_salt: int

    def public_input(self) -> list[int]:
        from ..ops.poseidon2 import hash_ints

        m = GR.lift_x(self.id)
        assert m is not None, "id is not an on-curve id"
        c1, c2 = GR.encrypt(m, self.ar_pubkey, self.encryption_salt)
        return [
            hash_ints([NOTE_VERSION, self.id, self.nullifier,
                       self.initial_deposit, self.token_address]),
            hash_ints([self.id]),
            self.initial_deposit,
            self.commitment,
            self.token_address,
            self.ar_pubkey[0], self.ar_pubkey[1],
            c1[0], c1[1], c2[0], c2[1],
            self.mac_salt,
            hash_ints([self.mac_salt, self.id]),
        ]


def build_new_account(k: int, pkn: NewAccountProverKnowledge) -> gd.Builder:
    b = gd.Builder(k=k)
    id_c = gd.witness_cell(b, pkn.id)
    nul_c = gd.witness_cell(b, pkn.nullifier)
    dep_c = gd.witness_cell(b, pkn.initial_deposit)
    com_c = gd.witness_cell(b, pkn.commitment)
    tok_c = gd.witness_cell(b, pkn.token_address)
    salt_c = gd.witness_cell(b, pkn.encryption_salt)
    mac_salt_c = gd.witness_cell(b, pkn.mac_salt)

    # [0] note; [1] prenullifier
    note_c = _note_cell(b, id_c, nul_c, dep_c, tok_c)
    pre_c = gd.poseidon_hash(b, [id_c])

    # range check the shielded amount (8-bit lookup table)
    gd.byte_decompose(b, dep_c, BALANCE_BITS)

    # viewing-key point M = (id, y) on curve, y as free witness
    m_pt = GR.lift_x(pkn.id)
    mx_c, my_c = gd.gr_witness_point(b, m_pt, on_curve_check=True)
    b.copy(id_c[0], id_c[1], mx_c[0], mx_c[1])

    # AR pubkey as witness cells (exposed as public inputs [5],[6])
    arx_c, ary_c = gd.gr_witness_point(b, pkn.ar_pubkey, on_curve_check=True)

    # ephemeral scalar bits (MSB-first for the mul gadget)
    salt_bits = gd.bit_decompose(b, salt_c, SALT_BITS)
    gen_c = gd.gr_witness_point(b, GR.GEN, pinned=True)
    c1_cells, c1_pt = gd.grumpkin_scalar_mul(b, salt_bits[::-1], gen_c)
    kpk_cells, _ = gd.grumpkin_scalar_mul(b, salt_bits[::-1], (arx_c, ary_c))
    c2_cells, c2_pt = gd.gr_add(b, (mx_c, my_c), kpk_cells)

    mac_c = gd.poseidon_hash(b, [mac_salt_c, id_c])

    for cell in (note_c, pre_c, dep_c, com_c, tok_c, arx_c, ary_c,
                 c1_cells[0], c1_cells[1], c2_cells[0], c2_cells[1],
                 mac_salt_c, mac_c):
        b.expose(*cell)
    return b


# ---------------------------------------------------------------------------
# Deposit / Withdraw (shared shape)
# ---------------------------------------------------------------------------

@dataclass
class DepositProverKnowledge:
    id: int
    nullifier_old: int
    account_old_balance: int
    token_address: int
    path: list  # height x 7 sibling values
    value: int
    commitment: int
    nullifier_new: int
    mac_salt: int

    def public_input(self, root: int) -> list[int]:
        from ..ops.poseidon2 import hash_ints

        new_balance = (self.account_old_balance + self.value) % P
        return [
            root,
            hash_ints([self.nullifier_old]),
            hash_ints([NOTE_VERSION, self.id, self.nullifier_new,
                       new_balance, self.token_address]),
            self.value,
            self.commitment,
            self.token_address,
            self.mac_salt,
            hash_ints([self.mac_salt, self.id]),
        ]


@dataclass
class WithdrawProverKnowledge:
    id: int
    nullifier_old: int
    account_old_balance: int
    token_address: int
    path: list
    withdrawal_value: int
    commitment: int
    nullifier_new: int
    mac_salt: int

    def public_input(self, root: int) -> list[int]:
        from ..ops.poseidon2 import hash_ints

        new_balance = (self.account_old_balance - self.withdrawal_value) % P
        return [
            root,
            hash_ints([self.nullifier_old]),
            hash_ints([NOTE_VERSION, self.id, self.nullifier_new,
                       new_balance, self.token_address]),
            self.withdrawal_value,
            self.token_address,
            self.commitment,
            self.mac_salt,
            hash_ints([self.mac_salt, self.id]),
        ]


def _build_transfer(k: int, pkn, value: int, new_balance: int,
                    is_withdraw: bool) -> gd.Builder:
    b = gd.Builder(k=k)
    id_c = gd.witness_cell(b, pkn.id)
    nul_old_c = gd.witness_cell(b, pkn.nullifier_old)
    bal_old_c = gd.witness_cell(b, pkn.account_old_balance)
    tok_c = gd.witness_cell(b, pkn.token_address)
    val_c = gd.witness_cell(b, value)
    com_c = gd.witness_cell(b, pkn.commitment)
    nul_new_c = gd.witness_cell(b, pkn.nullifier_new)
    mac_salt_c = gd.witness_cell(b, pkn.mac_salt)
    bal_new_c = gd.witness_cell(b, new_balance)

    # balance transition: new = old ± value (linear, enforced via a copy to
    # a SEL_CAP-free identity: use a one-hot-free arithmetic row)
    _balance_row(b, bal_old_c, val_c, bal_new_c, is_withdraw)

    # range checks: both balances and the moved value fit 112 bits
    # (byte decomposition against the 8-bit lookup table)
    gd.byte_decompose(b, bal_old_c, BALANCE_BITS)
    gd.byte_decompose(b, bal_new_c, BALANCE_BITS)
    gd.byte_decompose(b, val_c, BALANCE_BITS)

    # old note and membership
    old_note_c = _note_cell(b, id_c, nul_old_c, bal_old_c, tok_c)
    root_c = _merkle_cells(b, old_note_c, pkn.path)

    # nullifier hash, new note, mac
    h_nul_old_c = gd.poseidon_hash(b, [nul_old_c])
    new_note_c = _note_cell(b, id_c, nul_new_c, bal_new_c, tok_c)
    mac_c = gd.poseidon_hash(b, [mac_salt_c, id_c])

    if is_withdraw:
        expose = (root_c, h_nul_old_c, new_note_c, val_c, tok_c, com_c,
                  mac_salt_c, mac_c)
    else:
        expose = (root_c, h_nul_old_c, new_note_c, val_c, com_c, tok_c,
                  mac_salt_c, mac_c)
    for cell in expose:
        b.expose(*cell)
    return b


def _balance_row(b: gd.Builder, old_c, val_c, new_c, is_withdraw: bool):
    """new = old ± value via the SEL_BIT accumulation row trick is wrong —
    use a dedicated linear identity: reuse SEL_INIT's M_E row? Cleanest is a
    copy-based trick: constrain with the one-hot gate is overkill; instead
    we add the linear relation through the permutation by materializing
    old ± value in a SEL_LIN row."""
    row = b.alloc(1)
    b.fixed[gd.SEL_LIN][row] = 1
    sign = P - 1 if is_withdraw else 1
    b.fixed[gd.FIX_C[0]][row] = sign
    ov = b.advice[old_c[0]][old_c[1]]
    vv = b.advice[val_c[0]][val_c[1]]
    nv = b.advice[new_c[0]][new_c[1]]
    assert nv == (ov + sign * vv) % P
    b.advice[gd.ADV_S[0]][row] = ov
    b.advice[gd.ADV_S[1]][row] = vv
    b.advice[gd.ADV_S[2]][row] = nv
    b.copy(old_c[0], old_c[1], gd.ADV_S[0], row)
    b.copy(val_c[0], val_c[1], gd.ADV_S[1], row)
    b.copy(new_c[0], new_c[1], gd.ADV_S[2], row)


def build_deposit(k: int, pkn: DepositProverKnowledge) -> gd.Builder:
    new_balance = (pkn.account_old_balance + pkn.value) % P
    return _build_transfer(k, pkn, pkn.value, new_balance, is_withdraw=False)


def build_withdraw(k: int, pkn: WithdrawProverKnowledge) -> gd.Builder:
    new_balance = (pkn.account_old_balance - pkn.withdrawal_value) % P
    return _build_transfer(k, pkn, pkn.withdrawal_value, new_balance,
                           is_withdraw=True)


# ---------------------------------------------------------------------------
# circuit wrappers (the shielder_bindings Circuit<PK> shape, mod.rs:54-125)
# ---------------------------------------------------------------------------

@dataclass
class ShielderCircuit:
    """keygen-once, prove/verify-many wrapper for one relation."""

    kind: str  # "new_account" | "deposit" | "withdraw"
    k: int
    pk: object
    vk: object

    @classmethod
    def setup(cls, kind: str, k: int, srs: srs_mod.Srs, example_builder):
        cs = _cs_with_copies(k, example_builder)
        pk, vk = plonk.keygen(cs, srs, example_builder.fixed)
        return cls(kind=kind, k=k, pk=pk, vk=vk)

    def prove(self, builder: gd.Builder, public_input: list[int],
              seed: int = 0) -> bytes:
        return plonk.prove(self.pk, builder.advice, public_input,
                           rng=consts.blinding_rng(seed))

    def verify(self, proof: bytes, public_input: list[int]) -> bool:
        return plonk.verify(self.vk, proof, public_input)


def min_k_for(builder_rows: int, cs_template) -> int:
    """Smallest k whose usable-row budget fits the circuit.

    The analog of generate_keys_with_min_k's shrink loop
    (crates/shielder_bindings/src/circuits/mod.rs:74-86): usable rows are
    2^k - (blinding_factors + 1), and the builder keeps an 8-row guard.
    """
    bf = cs_template.blinding_factors()
    k = 1
    while (1 << k) - (bf + 1) - 8 < builder_rows:
        k += 1
    return k


def generate_keys_with_min_k(kind: str, srs: srs_mod.Srs, build_example,
                             max_k: int | None = None) -> "ShielderCircuit":
    """Keygen at the smallest k that fits the relation, shrinking the SRS.

    build_example: k -> gd.Builder for a representative witness (row count
    is witness-independent).  Mirrors generate_keys_with_min_k
    (shielder_bindings/src/circuits/mod.rs:74-86; SURVEY §2.1).
    """
    max_k = max_k or srs.k
    probe = build_example(max_k)
    k = min_k_for(probe.next_row, gd.build_constraint_system(max_k))
    assert k <= max_k, "circuit does not fit the SRS"
    shrunk = srs.shrink(k) if srs.k > k else srs
    return ShielderCircuit.setup(kind, k, shrunk, build_example(k))
