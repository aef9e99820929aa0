"""Circuit gadgets on the PLONK core: builder, Poseidon2 t=8, bits, Grumpkin.

The building blocks of the three Shielder relations.  Layout philosophy
(TPU-agnostic — this is the constraint side; witness generation batches on
device):

- 16 advice columns: 8 state lanes s0..s7 + 8 sbox intermediates v0..v7
  (v doubles as scratch for non-Poseidon gadgets);
- fixed columns: 8 round-constant lanes + per-gate selectors;
- all gates kept at degree <= 4 (cube intermediates split the alpha=7 sbox:
  v = u^3, out uses v^2*u), so the quotient has 3 pieces over a 4n extended
  domain — matching the reference circuits' moderate-degree style.

Poseidon2 spec source: poseidon2-solidity/generate_t8.py (SURVEY.md A.5) —
initial external mix, 4 full + 48 partial + 4 full rounds, capacity tag
N * 2^64 for hash::<N>.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from ..ops import field_golden as G
from ..ops import grumpkin_golden as GR
from ..ops.poseidon2_constants import C as P2_C, D as P2_D, M_E, ROUNDS_F, ROUNDS_P, T, CAPACITY_TAG_BASE
from ..proof import plonk

P = G.FR_MODULUS
HALF_F = ROUNDS_F // 2
N_ROUNDS = ROUNDS_F + ROUNDS_P

# column layout
NUM_STATE = T  # 8
ADV_S = list(range(0, 8))  # state lanes
ADV_V = list(range(8, 16))  # sbox cubes / scratch
ADV_BYTE = 16  # dedicated byte-lookup column: EVERY row is table-constrained
NUM_ADVICE = 17

# fixed columns: 0..7 round constants / generic constants, then selectors
FIX_C = list(range(0, 8))
SEL_INIT = 8      # initial external mix row
SEL_FULL = 9      # full round
SEL_PART = 10     # partial round
SEL_CAP = 11      # capacity/constant binding: s_j == c_j for flagged lanes (c8..)
FIX_CAPMASK = list(range(12, 20))  # per-lane 0/1 mask for SEL_CAP rows
SEL_BIT = 20      # booleanity of v columns + accumulation row
SEL_GR_DBLADD = 21  # grumpkin double-and-add step
SEL_GR_ADD = 22     # grumpkin plain incomplete addition row
SEL_ONCURVE = 23    # grumpkin on-curve check of (s0, s1)
SEL_ONEHOT7 = 24    # 7-way select: s7 = sum v_j * s_j, v one-hot
SEL_LIN = 25        # linear row: s2 = s0 + c0 * s1  (c0 = ±1 etc.)
FIX_RANGE = 26      # 8-bit range table: row i holds i for i < 256, else 0
SEL_BYTE = 27       # byte-decomposition accumulator row
NUM_FIXED = 28
RANGE_TABLE_BITS = 8


@dataclass
class Builder:
    """Row allocator + witness filler for the shared column layout."""

    k: int
    advice: list = None
    fixed: list = None
    copies: list = dc_field(default_factory=list)
    instance_map: list = dc_field(default_factory=list)  # [(col, row)] per pub input
    next_row: int = 0

    def __post_init__(self):
        n = 1 << self.k
        self.advice = [[0] * n for _ in range(NUM_ADVICE)]
        self.fixed = [[0] * n for _ in range(NUM_FIXED)]
        for i in range(min(1 << RANGE_TABLE_BITS, n)):
            self.fixed[FIX_RANGE][i] = i

    def alloc(self, rows: int) -> int:
        r = self.next_row
        self.next_row += rows
        assert self.next_row < (1 << self.k) - 8, "circuit out of rows"
        return r

    def copy(self, col_a: int, row_a: int, col_b: int, row_b: int):
        """Copy-constrain two advice cells."""
        self.copies.append((plonk.Column("advice", col_a), row_a,
                            plonk.Column("advice", col_b), row_b))

    def expose(self, col: int, row: int):
        """Bind an advice cell to the next public-input slot."""
        idx = len(self.instance_map)
        self.copies.append((plonk.Column("advice", col), row,
                            plonk.Column("instance", 0), idx))
        self.instance_map.append((col, row))

    # -- constants --

    def constant_cell(self, value: int) -> tuple[int, int]:
        """A cell pinned to `value` via a SEL_CAP row (returns (col, row))."""
        row = self._cap_row()
        lane = self._cap_lane[row]
        self.advice[ADV_S[lane]][row] = value % P
        self.fixed[FIX_C[lane]][row] = value % P
        self.fixed[FIX_CAPMASK[lane]][row] = 1
        self._cap_lane[row] += 1
        return (ADV_S[lane], row)

    _cap_row_cur: int = -1
    _cap_lane: dict = dc_field(default_factory=dict)

    def _cap_row(self) -> int:
        if (self._cap_row_cur < 0
                or self._cap_lane.get(self._cap_row_cur, 8) >= 8):
            self._cap_row_cur = self.alloc(1)
            self.fixed[SEL_CAP][self._cap_row_cur] = 1
            self._cap_lane[self._cap_row_cur] = 0
        return self._cap_row_cur


def _pow7(x: int) -> int:
    return pow(x, 7, P)


def poseidon_permutation(b: Builder, input_cells: list[tuple[int, int]],
                         cap_tag: int) -> tuple[int, int]:
    """Lay out one t=8 permutation; returns the digest cell (col, row).

    input_cells: up to 7 (col, row) advice cells for the rate lanes (missing
    lanes are constrained to zero via the capacity mask); cap_tag = N * 2^64.
    """
    assert len(input_cells) <= T - 1
    r0 = b.alloc(N_ROUNDS + 2)  # init row + 56 round rows + output row

    # row r0: initial state; lanes bound by copies (inputs) or SEL_CAP-style
    # masks (zero padding + capacity tag), then the init external mix
    state = []
    for j in range(T):
        if j < len(input_cells):
            src = input_cells[j]
            val = b.advice[src[0]][src[1]]
            b.advice[ADV_S[j]][r0] = val
            b.copy(src[0], src[1], ADV_S[j], r0)
        else:
            val = cap_tag if j == T - 1 else 0
            b.advice[ADV_S[j]][r0] = val
            b.fixed[FIX_C[j]][r0] = val
            b.fixed[FIX_CAPMASK[j]][r0] = 1
        state.append(b.advice[ADV_S[j]][r0])
    b.fixed[SEL_CAP][r0] = 1
    b.fixed[SEL_INIT][r0] = 1
    state = [sum(M_E[i][j] * state[j] for j in range(T)) % P for i in range(T)]
    for j in range(T):
        b.advice[ADV_S[j]][r0 + 1] = state[j]

    # rounds: row r0+1+r holds state entering round r; result on next row
    for r in range(N_ROUNDS):
        row = r0 + 1 + r
        is_full = r < HALF_F or r >= HALF_F + ROUNDS_P
        if is_full:
            b.fixed[SEL_FULL][row] = 1
            cs = [P2_C[T * r + j] for j in range(T)]
            for j in range(T):
                b.fixed[FIX_C[j]][row] = cs[j]
            u = [(state[j] + cs[j]) % P for j in range(T)]
            v = [pow(x, 3, P) for x in u]
            for j in range(T):
                b.advice[ADV_V[j]][row] = v[j]
            y = [v[j] * v[j] % P * u[j] % P for j in range(T)]
            state = [sum(M_E[i][j] * y[j] for j in range(T)) % P
                     for i in range(T)]
        else:
            b.fixed[SEL_PART][row] = 1
            c0 = P2_C[T * r]
            b.fixed[FIX_C[0]][row] = c0
            u0 = (state[0] + c0) % P
            v0 = pow(u0, 3, P)
            b.advice[ADV_V[0]][row] = v0
            w = [v0 * v0 % P * u0 % P] + state[1:]
            tot = sum(w) % P
            state = [(P2_D[j] * w[j] + tot) % P for j in range(T)]
        for j in range(T):
            b.advice[ADV_S[j]][row + 1] = state[j]

    return (ADV_S[0], r0 + 1 + N_ROUNDS)


def poseidon_hash(b: Builder, input_cells: list[tuple[int, int]]) -> tuple[int, int]:
    """hash::<N> gadget: capacity tag N * 2^64 (shielder_bindings utils.rs:14-30)."""
    n = len(input_cells)
    assert 1 <= n <= T - 1
    return poseidon_permutation(b, input_cells, n * CAPACITY_TAG_BASE)


def witness_cell(b: Builder, value: int, scratch_col: int = ADV_V[7]) -> tuple[int, int]:
    """A free advice cell holding `value` (allocated on a fresh row)."""
    row = b.alloc(1)
    b.advice[scratch_col][row] = value % P
    return (scratch_col, row)


def byte_decompose(b: Builder, value_cell: tuple[int, int], n_bits: int):
    """Range-check value < 2^n_bits via the 8-bit lookup table.

    One byte per row (MSB-first) in the dedicated ADV_BYTE column — which
    the ``byte_range`` lookup constrains to [0, 256) on EVERY row — with a
    base-256 running accumulator in s7:  acc' = 256*acc + byte.  Replaces
    the 9-constraint-per-row bit decomposition for balance range checks
    (the reference uses halo2 range-table lookups the same way).
    Requires k >= 9 (the table needs 256 usable rows).
    """
    assert n_bits % 8 == 0
    assert (1 << b.k) >= (1 << RANGE_TABLE_BITS) + 16, "k too small for table"
    n_bytes = n_bits // 8
    val = b.advice[value_cell[0]][value_cell[1]]
    assert val < (1 << n_bits), "value exceeds bit width"
    r0 = b.alloc(n_bytes + 1)
    b.advice[ADV_S[7]][r0] = 0
    b.fixed[FIX_C[7]][r0] = 0
    b.fixed[FIX_CAPMASK[7]][r0] = 1
    b.fixed[SEL_CAP][r0] = 1
    acc = 0
    for i in range(n_bytes):
        row = r0 + i
        byte = (val >> (8 * (n_bytes - 1 - i))) & 0xFF
        b.fixed[SEL_BYTE][row] = 1
        b.advice[ADV_BYTE][row] = byte
        acc = acc * 256 + byte
        b.advice[ADV_S[7]][row + 1] = acc % P
    b.copy(ADV_S[7], r0 + n_bytes, value_cell[0], value_cell[1])


def bit_decompose(b: Builder, value_cell: tuple[int, int], n_bits: int) -> list:
    """Constrain value = sum b_i 2^i with boolean b_i; returns bit cells.

    Layout: rows of 8 bits in v0..v7 under SEL_BIT, with running
    accumulator in s0: acc[row+1] = acc[row] * 256 + sum v_j 2^(7-j); the
    first acc is 0 (capmask) and the last acc is copy-tied to value_cell.
    MSB-first packing keeps the recomposition linear.
    """
    assert n_bits % 8 == 0
    n_rows = n_bits // 8
    val = b.advice[value_cell[0]][value_cell[1]]
    assert val < (1 << n_bits), "value exceeds bit width"
    bits = [(val >> i) & 1 for i in range(n_bits)]  # LSB first
    r0 = b.alloc(n_rows + 1)
    # acc starts at 0
    b.advice[ADV_S[0]][r0] = 0
    b.fixed[FIX_C[0]][r0] = 0
    b.fixed[FIX_CAPMASK[0]][r0] = 1
    b.fixed[SEL_CAP][r0] = 1
    bit_cells = [None] * n_bits
    acc = 0
    for i in range(n_rows):
        row = r0 + i
        b.fixed[SEL_BIT][row] = 1
        chunk = []
        for j in range(8):
            bit_idx = n_bits - 1 - (8 * i + j)  # MSB-first across rows
            bit = bits[bit_idx]
            b.advice[ADV_V[j]][row] = bit
            bit_cells[bit_idx] = (ADV_V[j], row)
            chunk.append(bit)
        acc = acc * 256 + sum(bv << (7 - j) for j, bv in enumerate(chunk))
        b.advice[ADV_S[0]][row + 1] = acc % P
    b.copy(ADV_S[0], r0 + n_rows, value_cell[0], value_cell[1])
    return bit_cells


def _offset_point():
    x = int.from_bytes(b"zkos_tpu/offset".ljust(32, b"\0"), "big") % P
    while (pt := GR.lift_x(x)) is None:
        x += 1
    return pt


OFFSET_H = _offset_point()


def gr_witness_point(b: Builder, pt, pinned: bool = False,
                     on_curve_check: bool = False) -> tuple:
    """A Grumpkin point as a pair of advice cells (s0, s1) on a fresh row.

    pinned: additionally constrain the coords to their values via SEL_CAP
    (for circuit constants like the generator).  on_curve_check: add the
    y^2 = x^3 - 17 constraint (for witness points like the viewing key).
    """
    row = b.alloc(1)
    b.advice[ADV_S[0]][row] = pt[0]
    b.advice[ADV_S[1]][row] = pt[1]
    if pinned:
        b.fixed[SEL_CAP][row] = 1
        for lane, vv in ((0, pt[0]), (1, pt[1])):
            b.fixed[FIX_C[lane]][row] = vv
            b.fixed[FIX_CAPMASK[lane]][row] = 1
    if on_curve_check:
        b.fixed[SEL_ONCURVE][row] = 1
    return (ADV_S[0], row), (ADV_S[1], row)


def gr_add(b: Builder, p_cells: tuple, q_cells: tuple):
    """One SEL_GR_ADD row: (s4, s5) = (s0, s1) + (s2, s3), incomplete.

    p_cells/q_cells: ((xc, xr), (yc, yr)) advice cell pairs.
    Returns the result cell pair and the affine point.
    """
    (pxc, pyc), (qxc, qyc) = p_cells, q_cells
    p_pt = (b.advice[pxc[0]][pxc[1]], b.advice[pyc[0]][pyc[1]])
    q_pt = (b.advice[qxc[0]][qxc[1]], b.advice[qyc[0]][qyc[1]])
    assert p_pt[0] != q_pt[0], "incomplete addition hit x1 == x2"
    out = GR.add(p_pt, q_pt)
    row = b.alloc(1)
    b.fixed[SEL_GR_ADD][row] = 1
    for col, vv in zip((ADV_S[0], ADV_S[1], ADV_S[2], ADV_S[3],
                        ADV_S[4], ADV_S[5]),
                       (p_pt[0], p_pt[1], q_pt[0], q_pt[1], out[0], out[1])):
        b.advice[col][row] = vv
    b.copy(pxc[0], pxc[1], ADV_S[0], row)
    b.copy(pyc[0], pyc[1], ADV_S[1], row)
    b.copy(qxc[0], qxc[1], ADV_S[2], row)
    b.copy(qyc[0], qyc[1], ADV_S[3], row)
    return ((ADV_S[4], row), (ADV_S[5], row)), out


def grumpkin_scalar_mul(b: Builder, bit_cells_msb: list, base_cells: tuple):
    """Double-and-add over Grumpkin with incomplete additions.

    bit_cells_msb: bit cells MSB-first; base_cells: ((xc,xr),(yc,yr)) advice
    cells of the base point B (constant bases are pinned via
    ``gr_witness_point(pinned=True)``).  The accumulator starts at the fixed
    offset H (avoids identity cases); the [2^n]H surplus is removed by a
    final SEL_GR_ADD row adding -[2^n]H.  Returns the result cell pair and
    the affine value [k]B.

    Soundness caveat (documented): incomplete formulas assume no x-coord
    collisions along the chain — negligible for random offsets/keys, same
    assumption style as the reference circuits' ElGamal gadget.
    """
    n = len(bit_cells_msb)
    (bxc, byc) = base_cells
    base_pt = (b.advice[bxc[0]][bxc[1]], b.advice[byc[0]][byc[1]])
    acc = OFFSET_H
    r0 = b.alloc(n + 1)
    b.advice[ADV_S[0]][r0] = acc[0]
    b.advice[ADV_S[1]][r0] = acc[1]
    b.fixed[SEL_CAP][r0] = 1
    for lane, vv in ((0, acc[0]), (1, acc[1])):
        b.fixed[FIX_C[lane]][r0] = vv
        b.fixed[FIX_CAPMASK[lane]][r0] = 1
    for i, bit_cell in enumerate(bit_cells_msb):
        row = r0 + i
        b.fixed[SEL_GR_DBLADD][row] = 1
        bit = b.advice[bit_cell[0]][bit_cell[1]]
        b.advice[ADV_V[0]][row] = bit
        b.copy(bit_cell[0], bit_cell[1], ADV_V[0], row)
        dbl = GR.add(acc, acc)
        added = GR.add(dbl, base_pt)
        assert dbl[0] != base_pt[0], "incomplete addition collision"
        b.advice[ADV_S[2]][row] = dbl[0]
        b.advice[ADV_S[3]][row] = dbl[1]
        b.advice[ADV_S[4]][row] = added[0]
        b.advice[ADV_S[5]][row] = added[1]
        b.advice[ADV_S[6]][row] = base_pt[0]
        b.advice[ADV_S[7]][row] = base_pt[1]
        b.copy(bxc[0], bxc[1], ADV_S[6], row)
        b.copy(byc[0], byc[1], ADV_S[7], row)
        acc = added if bit else dbl
        b.advice[ADV_S[0]][row + 1] = acc[0]
        b.advice[ADV_S[1]][row + 1] = acc[1]
    # remove the [2^n]H surplus
    surplus = GR.scalar_mul(pow(2, n, GR.SCALAR_ORDER), OFFSET_H)
    neg_cells = gr_witness_point(b, GR.neg(surplus), pinned=True)
    acc_cells = ((ADV_S[0], r0 + n), (ADV_S[1], r0 + n))
    return gr_add(b, acc_cells, neg_cells)


def one_hot_select7(b: Builder, sibling_cells: list, child_cell: tuple) -> None:
    """Constrain child ∈ {sibling_0..sibling_6} via a SEL_ONEHOT7 row.

    sibling_cells: 7 advice cells; child_cell: the value that must equal one
    of them.  The one-hot witness is derived from the actual values.
    """
    assert len(sibling_cells) == 7
    row = b.alloc(1)
    b.fixed[SEL_ONEHOT7][row] = 1
    child_val = b.advice[child_cell[0]][child_cell[1]]
    hot = None
    for j, cell in enumerate(sibling_cells):
        val = b.advice[cell[0]][cell[1]]
        b.advice[ADV_S[j]][row] = val
        b.copy(cell[0], cell[1], ADV_S[j], row)
        if hot is None and val == child_val:
            hot = j
    assert hot is not None, "child not among siblings"
    for j in range(7):
        b.advice[ADV_V[j]][row] = 1 if j == hot else 0
    b.advice[ADV_S[7]][row] = child_val
    b.copy(child_cell[0], child_cell[1], ADV_S[7], row)


def build_constraint_system(k: int) -> plonk.ConstraintSystem:
    """Gates for the shared layout (all degree <= 4)."""
    cs = plonk.ConstraintSystem(k=k, num_fixed=NUM_FIXED, num_advice=NUM_ADVICE)
    s = [plonk.Advice(i) for i in ADV_S]
    s_next = [plonk.Advice(i, rot=1) for i in ADV_S]
    v = [plonk.Advice(i) for i in ADV_V]
    c = [plonk.Fixed(i) for i in FIX_C]
    capmask = [plonk.Fixed(i) for i in FIX_CAPMASK]
    q_init = plonk.Fixed(SEL_INIT)
    q_full = plonk.Fixed(SEL_FULL)
    q_part = plonk.Fixed(SEL_PART)
    q_cap = plonk.Fixed(SEL_CAP)
    q_bit = plonk.Fixed(SEL_BIT)
    q_gr = plonk.Fixed(SEL_GR_DBLADD)

    # SEL_CAP: per-lane constant binding s_j == c_j
    cap_gate = [q_cap * capmask[j] * (s[j] - c[j]) for j in range(T)]
    cs.gates.append(("cap", cap_gate))

    # SEL_INIT: s_next = M_E * s  (after cap binding on the same row)
    init_gate = [
        q_init * (s_next[i] - sum(M_E[i][j] * s[j] for j in range(T)))
        for i in range(T)]
    cs.gates.append(("p2_init_mix", init_gate))

    # SEL_FULL: v_j = (s_j + c_j)^3; s_next = M_E * (v^2 * (s+c))
    u = [s[j] + c[j] for j in range(T)]
    full_gate = [q_full * (v[j] - u[j] * u[j] * u[j]) for j in range(T)]
    y = [v[j] * v[j] * u[j] for j in range(T)]
    full_gate += [
        q_full * (s_next[i] - sum(M_E[i][j] * y[j] for j in range(T)))
        for i in range(T)]
    cs.gates.append(("p2_full_round", full_gate))

    # SEL_PART: v_0 = (s_0 + c_0)^3; s_next via D-diag + total
    w0 = v[0] * v[0] * u[0]
    part_gate = [q_part * (v[0] - u[0] * u[0] * u[0])]
    tot = w0 + sum(s[j] for j in range(1, T))
    wvals = [w0] + [s[j] for j in range(1, T)]
    part_gate += [
        q_part * (s_next[i] - (P2_D[i] * wvals[i] + tot)) for i in range(T)]
    cs.gates.append(("p2_partial_round", part_gate))

    # SEL_BIT: booleanity of v_j and MSB-first byte accumulation into s0
    bit_gate = [q_bit * v[j] * (v[j] - 1) for j in range(8)]
    byte = sum((1 << (7 - j)) * v[j] for j in range(8))
    bit_gate.append(q_bit * (s_next[0] - (256 * s[0] + byte)))
    cs.gates.append(("bits", bit_gate))

    # SEL_GR_DBLADD: grumpkin double + conditional add (incomplete formulas)
    # NOTE the doubling slope square check is degree 4 only because the
    # squared tangent form (dx + 2ax)(2ay)^2 == (3ax^2)^2 is degree 3+1.
    ax, ay = s[0], s[1]
    dx, dy = s[2], s[3]
    addx, addy = s[4], s[5]
    bx, by = s[6], s[7]
    bit = v[0]
    ax_n, ay_n = s_next[0], s_next[1]
    gr_gate = [
        q_gr * ((dx + 2 * ax) * (2 * ay) * (2 * ay) - (3 * ax * ax) * (3 * ax * ax)),
        q_gr * ((dy + ay) * (2 * ay) - (3 * ax * ax) * (ax - dx)),
        q_gr * ((addx + dx + bx) * (bx - dx) * (bx - dx) - (by - dy) * (by - dy)),
        q_gr * ((addy + dy) * (bx - dx) - (by - dy) * (dx - addx)),
        q_gr * (ax_n - (bit * addx + (1 - bit) * dx)),
        q_gr * (ay_n - (bit * addy + (1 - bit) * dy)),
    ]
    cs.gates.append(("grumpkin_step", gr_gate))

    # SEL_GR_ADD: (s4, s5) = (s0, s1) + (s2, s3), incomplete
    q_add = plonk.Fixed(SEL_GR_ADD)
    px, py, qx, qy, rx, ry = s[0], s[1], s[2], s[3], s[4], s[5]
    cs.gates.append(("grumpkin_add", [
        q_add * ((rx + px + qx) * (qx - px) * (qx - px) - (qy - py) * (qy - py)),
        q_add * ((ry + py) * (qx - px) - (qy - py) * (px - rx)),
    ]))

    # SEL_ONCURVE: y^2 = x^3 - 17 for (s0, s1)
    q_oc = plonk.Fixed(SEL_ONCURVE)
    cs.gates.append(("grumpkin_on_curve", [
        q_oc * (s[1] * s[1] - (s[0] * s[0] * s[0] - 17))]))

    # SEL_ONEHOT7: v0..v6 boolean one-hot, s7 = sum v_j s_j (merkle select)
    q_oh = plonk.Fixed(SEL_ONEHOT7)
    oh_gate = [q_oh * v[j] * (v[j] - 1) for j in range(7)]
    oh_gate.append(q_oh * (sum(v[j] for j in range(7)) - 1))
    oh_gate.append(q_oh * (s[7] - sum(v[j] * s[j] for j in range(7))))
    cs.gates.append(("one_hot_select7", oh_gate))

    # SEL_LIN: s2 = s0 + c0 * s1
    q_lin = plonk.Fixed(SEL_LIN)
    cs.gates.append(("linear", [q_lin * (s[2] - (s[0] + c[0] * s[1]))]))

    # SEL_BYTE: base-256 accumulator; the byte column itself is constrained
    # to [0, 256) on every row by the range-table lookup
    q_byte = plonk.Fixed(SEL_BYTE)
    byte_col = plonk.Advice(ADV_BYTE)
    cs.gates.append(("byte_acc", [
        q_byte * (s_next[7] - (256 * s[7] + byte_col))]))
    cs.lookups.append(("byte_range", [byte_col], [plonk.Fixed(FIX_RANGE)]))
    return cs
