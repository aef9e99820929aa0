"""Poseidon2T8Assembly.sol emitter — the poseidon2-solidity analog.

The reference generates an inline-assembly Solidity library hashing
7-tuples of BN254-Fr elements on-chain (one call per Merkle level,
`poseidon2-solidity/generate_t8.py`, consumed by
`contracts/MerkleTree.sol:130-141`).  This emitter produces an
equivalent contract from this repo's own constants
(`ops/poseidon2_constants.py`) with a different architecture: the
permutation schedule is written ONCE against an abstract backend, and
two backends consume it —

- ``YulBackend`` renders the schedule as Solidity inline assembly
  (Yul functions for the shared pieces, scoped blocks for temps), and
- ``EvalBackend`` executes the very same schedule over python ints,

so the emitted artifact is *executable here*: the test oracle runs the
schedule through ``EvalBackend`` and compares against
``ops.poseidon2.hash_ints`` — no solc required, and any drift between
the rendered assembly and the hash semantics is caught because both
views come from one schedule.

Semantics contract (generate_t8.py:460-472 + utils.py): width T=8,
alpha=7, 8 full + 48 partial rounds, external mix = M4 blocks + cross
sums, partial mix = diag(D) + lane sum, capacity lane fixed to
7 * 2**64 — the contract is valid for 7-tuples only.
"""

from __future__ import annotations

from ..ops.poseidon2_constants import (ALPHA, C, CAPACITY_TAG_BASE, D,
                                       ROUNDS_F, ROUNDS_P, T)
from ..ops.field_golden import FR

P = FR.p
MASK256 = (1 << 256) - 1
_HALF_F = ROUNDS_F // 2
#: state lanes live in scratch memory; one extra slot for the lane sum
SLOT = [hex(0x20 * i) for i in range(T)]
SUM_SLOT = hex(0x20 * T)


# ---------------------------------------------------------------------------
# backends
# ---------------------------------------------------------------------------

class YulBackend:
    """Renders the schedule as inline-assembly source."""

    def __init__(self):
        self.lines: list[str] = []
        self.fn_defs: list[str] = []
        self._tmp = 0
        self._depth = 3

    # -- expressions (return yul source fragments) --
    def lit(self, v: int) -> str:
        return str(v)

    def arg(self, i: int) -> str:
        return f"mload(add(input, {hex(0x20 * i)}))"

    def mload(self, slot: str) -> str:
        return f"mload({slot})"

    def addmod(self, a: str, b: str) -> str:
        return f"addmod({a}, {b}, {P})"

    def mulmod(self, a: str, b: str) -> str:
        return f"mulmod({a}, {b}, {P})"

    # -- statements --
    def _emit(self, line: str) -> None:
        self.lines.append("    " * self._depth + line)

    def mstore(self, slot: str, expr: str) -> None:
        self._emit(f"mstore({slot}, {expr})")

    def let(self, expr: str) -> str:
        self._tmp += 1
        name = f"t{self._tmp}"
        self._emit(f"let {name} := {expr}")
        return name

    def block(self):
        be = self

        class _Block:
            def __enter__(self):
                be._emit("{")
                be._depth += 1

            def __exit__(self, *a):
                be._depth -= 1
                be._emit("}")

        return _Block()

    def def_fn(self, name: str, nargs: int, returns: bool, body) -> None:
        """Define a yul function whose body is built by ``body(be, args)``."""
        outer_lines, outer_depth = self.lines, self._depth
        self.lines, self._depth = [], 2
        args = [f"a{i}" for i in range(nargs)]
        ret = body(self, args)
        inner = self.lines
        self.lines, self._depth = outer_lines, outer_depth
        head = f"function {name}({', '.join(args)})"
        if returns:
            head += " -> r"
            inner.append("        r := " + ret)
        self.fn_defs.append(
            "            " + head + " {\n" +
            "\n".join("    " + ln for ln in inner) + "\n            }")

    def call(self, name: str, *args: str) -> str:
        return f"{name}({', '.join(args)})"

    def call_stmt(self, name: str, *args: str) -> None:
        self._emit(self.call(name, *args))


class EvalBackend:
    """Executes the schedule over python ints (the artifact's oracle).

    Models the EVM exactly: addmod/mulmod reduce mod P; a raw 256-bit
    add (not used by this schedule, but part of the backend contract)
    would wrap at 2**256.
    """

    def __init__(self, inputs: list[int]):
        assert len(inputs) == T - 1
        self.inputs = list(inputs)
        self.mem: dict[str, int] = {}
        self.fns: dict[str, tuple] = {}

    def lit(self, v: int) -> int:
        return v & MASK256

    def arg(self, i: int) -> int:
        return self.inputs[i]

    def mload(self, slot: str) -> int:
        return self.mem.get(slot, 0)

    def addmod(self, a: int, b: int) -> int:
        return (a + b) % P

    def mulmod(self, a: int, b: int) -> int:
        return a * b % P

    def mstore(self, slot: str, val: int) -> None:
        self.mem[slot] = val & MASK256

    def let(self, val: int) -> int:
        return val

    def block(self):
        class _Nop:
            def __enter__(self):
                pass

            def __exit__(self, *a):
                pass

        return _Nop()

    def def_fn(self, name: str, nargs: int, returns: bool, body) -> None:
        self.fns[name] = (body,)

    def call(self, name: str, *args: int):
        (body,) = self.fns[name]
        return body(self, list(args))

    def call_stmt(self, name: str, *args: int) -> None:
        self.call(name, *args)


# ---------------------------------------------------------------------------
# the schedule (single source of truth for both backends)
# ---------------------------------------------------------------------------

def _pow_alpha(be, x):
    """x^7 via square-square-multiply (alpha=7, utils.py pow7)."""
    assert ALPHA == 7
    x2 = be.let(be.mulmod(x, x))
    x4 = be.let(be.mulmod(x2, x2))
    return be.mulmod(be.mulmod(x4, x2), x)


def _define_helpers(be) -> None:
    def sbox_body(b, args):
        return _pow_alpha(b, args[0])

    be.def_fn("sbox7", 1, True, sbox_body)

    def quad_body(b, args):
        # M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] applied to the
        # four lanes at slots a0..a3 (the Poseidon2 external block),
        # using the standard 8-addition chain from the Poseidon2 paper.
        a = [b.let(b.mload(s)) for s in args]
        s01 = b.let(b.addmod(a[0], a[1]))              # a+b
        s23 = b.let(b.addmod(a[2], a[3]))              # c+d
        u = b.let(b.addmod(b.addmod(a[1], a[1]), s23))  # 2b+c+d
        v = b.let(b.addmod(b.addmod(a[3], a[3]), s01))  # a+b+2d
        w = b.let(b.addmod(b.addmod(b.addmod(s23, s23), s23),
                           b.addmod(s23, v)))           # a+b+4c+6d
        z = b.let(b.addmod(b.addmod(b.addmod(s01, s01), s01),
                           b.addmod(s01, u)))           # 4a+6b+c+d
        b.mstore(args[0], b.addmod(v, z))               # 5a+7b+c+3d
        b.mstore(args[1], z)
        b.mstore(args[2], b.addmod(u, w))               # a+3b+5c+7d
        b.mstore(args[3], w)
        return None

    be.def_fn("quad", 4, False, quad_body)

    def extmix_body(b, _args):
        # M_E = [[2*M4, M4], [M4, 2*M4]]: M4 per half, then add the
        # opposite half's matching lane to every lane.
        b.call_stmt("quad", *SLOT[:4])
        b.call_stmt("quad", *SLOT[4:])
        for i in range(4):
            cross = b.let(b.addmod(b.mload(SLOT[i]), b.mload(SLOT[i + 4])))
            b.mstore(SLOT[i], b.addmod(b.mload(SLOT[i]), cross))
            b.mstore(SLOT[i + 4], b.addmod(b.mload(SLOT[i + 4]), cross))
        return None

    be.def_fn("extmix", 0, False, extmix_body)

    def lanesum_body(b, _args):
        acc = b.mload(SLOT[0])
        for s in SLOT[1:]:
            acc = b.addmod(acc, b.mload(s))
        return acc

    be.def_fn("lanesum", 0, True, lanesum_body)


def schedule(be) -> None:
    """The full t=8 permutation over the 7 public inputs."""
    _define_helpers(be)
    for i in range(T - 1):
        be.mstore(SLOT[i], be.arg(i))
    # capacity tag: 7-tuples only (generate_t8.py init() constant)
    be.mstore(SLOT[T - 1], be.lit(7 * CAPACITY_TAG_BASE))
    be.call_stmt("extmix")

    def full_round(r: int) -> None:
        with be.block():
            for i in range(T):
                x = be.let(be.addmod(be.mload(SLOT[i]),
                                     be.lit(C[T * r + i])))
                be.mstore(SLOT[i], be.call("sbox7", x))
        be.call_stmt("extmix")

    def partial_round(r: int) -> None:
        with be.block():
            x = be.let(be.addmod(be.mload(SLOT[0]), be.lit(C[T * r])))
            be.mstore(SLOT[0], be.call("sbox7", x))
            be.mstore(SUM_SLOT, be.call("lanesum"))
            for i in range(T):
                be.mstore(SLOT[i], be.addmod(
                    be.mulmod(be.lit(D[i]), be.mload(SLOT[i])),
                    be.mload(SUM_SLOT)))

    for r in range(_HALF_F):
        full_round(r)
    for r in range(_HALF_F, _HALF_F + ROUNDS_P):
        partial_round(r)
    for r in range(_HALF_F + ROUNDS_P, ROUNDS_F + ROUNDS_P):
        full_round(r)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def evaluate(inputs: list[int]) -> int:
    """Run the emitted schedule over python ints (artifact oracle)."""
    be = EvalBackend([x % P for x in inputs])
    schedule(be)
    return be.mload(SLOT[0])


def render() -> str:
    """Render Poseidon2T8Assembly.sol."""
    be = YulBackend()
    schedule(be)
    body = "\n".join(be.fn_defs) + "\n\n" + "\n".join(be.lines)
    return f"""\
// SPDX-License-Identifier: Apache-2.0
// Generated by zkos_tpu.proof.poseidon2_sol — do not edit.
// Poseidon2 t=8 over BN254-Fr: alpha={ALPHA}, {ROUNDS_F} full + \
{ROUNDS_P} partial rounds.
pragma solidity 0.8.26;

library Poseidon2T8Assembly {{
    /*
     * Suitable only for 7-tuples: the capacity lane is fixed to
     * 7 * 2**64; other arities need a different initial state.
     */
    function hash(uint256[7] memory input) public pure returns (uint256 h) {{
        assembly {{
{body}
            h := mload({SLOT[0]})
        }}
    }}
}}
"""
