"""Execute the emitted Solidity verifier artifacts (evm-utils execution analog).

The reference deploys its generated Yul verifier to an in-process EVM and
runs it against real proofs with gas accounting
(crates/evm-utils/src/evm_runner.rs:43-149,
crates/integration-tests/src/verifier.rs:61-151); the committed gas numbers
642_011 / 831_764 / 925_323 come from those executions
(crates/halo2-verifier/src/generator.rs:79-81).  This environment has no
solc/revm, so this module closes the execution gap directly: it parses the
narrow Solidity subset that ``proof.solidity.render_solidity_verifier``
emits and EXECUTES the committed ``artifacts/*.sol`` text — the actual
on-chain artifact, not a Python twin — against real proof bytes.

Semantics covered (exactly the emitter's subset):
  contract constants, struct types, internal functions with named returns,
  memory arrays / bytes / structs (reference semantics), for/while/if,
  ternaries, tuple declaration/assignment, checked uint256 arithmetic,
  addmod/mulmod, keccak256, abi.encode/encodePacked/decode, the
  0x05/0x06/0x07/0x08 precompiles via staticcall, and the single
  ``assembly { x := mload(add(add(b, 0x20), off)) }`` bytes-word loader.

Gas: every evaluated operation charges its Ethereum cost (mulmod/addmod 8,
keccak 30+6/word, ecAdd 150, ecMul 6000, modexp per EIP-2565, pairing
45000+34000/pair, 3-gas word ops), plus the 21000 intrinsic and 16/4 per
calldata byte for external calls.  Interpreter overheads (stack frames,
memory expansion) are approximated with flat per-op costs, so totals are
an *executable estimate*, not a revm replay — but they are measured from
the real artifact's operation stream, unlike proof.gas's closed-form model.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from ..ops import curve_golden as CG
from ..ops import field_golden as FG
from ..ops import keccak as KK
from ..ops import pairing_golden as PG

Q = FG.FQ_MODULUS
WORD = 1 << 256


class SolRevert(Exception):
    """require() failure / precompile failure inside the interpreted code."""


class SolPanic(SolRevert):
    """Checked-arithmetic overflow / OOB — solc 0.8 Panic(uint256) reverts."""


# --- value wrappers (packed-encoding width carriers) -------------------------


class B32(int):
    """bytes32 value (encodePacked width 32, big-endian)."""


class U8(int):
    """uint8 value (encodePacked width 1)."""


# --- tokenizer ----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""(?P<ws>\s+|//[^\n]*|/\*.*?\*/)
      | (?P<hex>0x[0-9a-fA-F]+)
      | (?P<num>\d+)
      | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
      | (?P<str>"[^"]*")
      | (?P<punct>>>=|<<=|\*\*|\+\+|--|&&|\|\||==|!=|<=|>=|\+=|-=|\*=|/=|%=|:=
                  |<<|>>|[-+*/%&|^!~<>=?:;,.(){}\[\]])
    """,
    re.X | re.S,
)


def tokenize(src: str) -> list[tuple[str, object]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"bad token at {src[pos:pos+24]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "hex":
            toks.append(("num", int(text, 16)))
        elif kind == "num":
            toks.append(("num", int(text)))
        elif kind == "str":
            toks.append(("str", text[1:-1]))
        else:
            toks.append((kind, text))
    toks.append(("eof", None))
    return toks


# --- AST ----------------------------------------------------------------------
# Expressions and statements are plain tuples: ('num', v), ('name', n),
# ('bin', op, a, b), ('un', op, a), ('cond', c, t, f), ('call', fn, args),
# ('index', a, i), ('member', a, name), ('tuple', items), ('array', items),
# ('new_array', n_expr).
# Statements: ('block', stmts), ('if', c, s, s_else), ('for', init, c, post, s),
# ('while', c, s), ('expr', e), ('decl', type, name, init), ('tdecl', names, e),
# ('tassign', lvalues, e), ('assign', lv, op, e), ('ret', e), ('cont',),
# ('brk',), ('asm', target, e), ('incdec', lv, op).

ELEM_TYPES = {"uint256", "int256", "bool", "bytes32", "uint8", "address",
              "bytes", "string", "uint"}
_LOC = {"memory", "calldata", "storage"}


@dataclass
class FunctionDef:
    name: str
    params: list          # [(type, name)]
    returns: list         # [(type, name_or_None)]
    body: tuple
    external: bool = False


@dataclass
class StructDef:
    name: str
    fields: list          # [(type, name)]


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text):
        k, v = self.next()
        if v != text:
            raise SyntaxError(f"expected {text!r}, got {v!r} (#{self.i})")
        return v

    def accept(self, text):
        if self.peek()[1] == text:
            self.next()
            return True
        return False

    # -- top level
    def parse_contract(self, structs: dict):
        consts, funcs = {}, {}
        self.storage_decls = []   # [(type, name, init_expr_or_None)]
        self.events = {}          # name -> [(type, pname)]
        self.errors = set()
        self.interfaces = set()
        name = None
        while self.peek()[0] != "eof":
            k, v = self.peek()
            if v == "pragma":
                while self.next()[1] != ";":
                    pass
            elif v == "interface":
                # record the name, skip the body (interface calls dispatch
                # through the runner's address table, not these decls)
                self.next()
                self.interfaces.add(self.next()[1])
                self.expect("{")
                depth = 1
                while depth:
                    t = self.next()[1]
                    depth += t == "{"
                    depth -= t == "}"
            elif v == "contract":
                self.next()
                name = self.next()[1]
                self.expect("{")
                while not self.accept("}"):
                    self.parse_member(consts, funcs, structs)
            else:
                raise SyntaxError(f"unexpected top-level token {v!r}")
        return name, consts, funcs

    def parse_member(self, consts, funcs, structs):
        k, v = self.peek()
        if v == "event":
            self.next()
            ename = self.next()[1]
            self.expect("(")
            params = []
            while not self.accept(")"):
                ptype = self.parse_type()
                if self.peek()[1] == "indexed":
                    self.next()
                params.append((ptype, self.next()[1]))
                self.accept(",")
            self.expect(";")
            self.events[ename] = params
            return
        if v == "error":
            self.next()
            ename = self.next()[1]
            self.expect("(")
            while not self.accept(")"):
                self.parse_type()
                if self.peek()[1] not in (",", ")"):
                    self.next()
                self.accept(",")
            self.expect(";")
            self.errors.add(ename)
            return
        if v == "struct":
            self.next()
            sname = self.next()[1]
            self.expect("{")
            fields = []
            while not self.accept("}"):
                ftype = self.parse_type()
                fname = self.next()[1]
                self.expect(";")
                fields.append((ftype, fname))
            structs[sname] = StructDef(sname, fields)
            return
        if v == "function":
            self.next()
            fname = self.next()[1]
            self.expect("(")
            params = []
            while not self.accept(")"):
                ptype = self.parse_type()
                pname = self.next()[1]
                params.append((ptype, pname))
                self.accept(",")
            external = False
            rets = []
            while True:
                _, m = self.peek()
                if m in ("internal", "pure", "view", "private", "payable"):
                    self.next()
                elif m in ("external", "public"):
                    external = True
                    self.next()
                elif m == "returns":
                    self.next()
                    self.expect("(")
                    while not self.accept(")"):
                        rtype = self.parse_type()
                        rname = None
                        if self.peek()[0] == "name" and self.peek()[1] not in (",", ")"):
                            rname = self.next()[1]
                        rets.append((rtype, rname))
                        self.accept(",")
                else:
                    break
            body = self.parse_block()
            funcs[fname] = FunctionDef(fname, params, rets, body, external)
            return
        # constant:  uint256 internal constant NAME = expr;
        # state var: uint256 private name;  /  mapping(uint256 => T) name;
        ctype = self.parse_type()
        mods = []
        while self.peek()[1] in ("internal", "constant", "public", "private",
                                 "immutable"):
            mods.append(self.next()[1])
        cname = self.next()[1]
        if "constant" in mods:
            self.expect("=")
            e = self.parse_expr()
            self.expect(";")
            consts[cname] = (ctype, e)
            return
        init = None
        if self.accept("="):
            init = self.parse_expr()
        self.expect(";")
        self.storage_decls.append((ctype, cname, init))

    def parse_type(self):
        if self.peek()[1] == "mapping":
            self.next()
            self.expect("(")
            self.parse_type()
            self.expect("=")  # '=>' tokenizes as '=' '>'
            self.expect(">")
            vtype = self.parse_type()
            self.expect(")")
            return ("mapping", vtype)
        base = self.next()[1]
        dims = None
        if self.peek()[1] == "[":
            self.next()
            if self.peek()[1] == "]":
                dims = -1  # dynamic
            else:
                dims = self.next()[1]
            self.expect("]")
        if self.peek()[1] in _LOC:
            self.next()
        return (base, dims)

    def looks_like_type(self) -> bool:
        k, v = self.peek()
        return k == "name" and (v in ELEM_TYPES or v in self._struct_names)

    _struct_names: set = set()

    # -- statements
    def parse_block(self):
        self.expect("{")
        stmts = []
        while not self.accept("}"):
            stmts.append(self.parse_stmt())
        return ("block", stmts)

    def parse_stmt(self):
        k, v = self.peek()
        if v == "{":
            return self.parse_block()
        if v == "if":
            self.next()
            self.expect("(")
            c = self.parse_expr()
            self.expect(")")
            s = self.parse_stmt()
            s_else = None
            if self.accept("else"):
                s_else = self.parse_stmt()
            return ("if", c, s, s_else)
        if v == "for":
            self.next()
            self.expect("(")
            init = self.parse_simple_stmt(consume_semi=True)
            cond = self.parse_expr()
            self.expect(";")
            post = self.parse_simple_stmt(consume_semi=False)
            self.expect(")")
            body = self.parse_stmt()
            return ("for", init, cond, post, body)
        if v == "while":
            self.next()
            self.expect("(")
            c = self.parse_expr()
            self.expect(")")
            return ("while", c, self.parse_stmt())
        if v == "continue":
            self.next()
            self.expect(";")
            return ("cont",)
        if v == "break":
            self.next()
            self.expect(";")
            return ("brk",)
        if v == "return":
            self.next()
            if self.peek()[1] == ";":
                self.next()
                return ("ret", None)
            e = self.parse_expr()
            self.expect(";")
            return ("ret", e)
        if v == "emit":
            self.next()
            ename = self.next()[1]
            self.expect("(")
            args = []
            while not self.accept(")"):
                args.append(self.parse_expr())
                self.accept(",")
            self.expect(";")
            return ("emit", ename, args)
        if v == "revert":
            self.next()
            k2, v2 = self.peek()
            if k2 == "str":  # revert("reason")
                self.next()
                self.expect(";")
                return ("revert", None, [("str", v2)])
            ename = self.next()[1]
            self.expect("(")
            args = []
            while not self.accept(")"):
                args.append(self.parse_expr())
                self.accept(",")
            self.expect(";")
            return ("revert", ename, args)
        if v == "assembly":
            self.next()
            self.expect("{")
            target = self.next()[1]
            self.expect(":=")
            e = self.parse_asm_expr()
            self.expect("}")
            return ("asm", target, e)
        s = self.parse_simple_stmt(consume_semi=True)
        return s

    def parse_asm_expr(self):
        k, v = self.next()
        if k == "num":
            return ("num", v)
        if self.peek()[1] == "(":
            self.next()
            args = []
            while not self.accept(")"):
                args.append(self.parse_asm_expr())
                self.accept(",")
            return ("call", ("name", v), args)
        return ("name", v)

    def parse_simple_stmt(self, consume_semi: bool):
        k, v = self.peek()
        # declaration?
        if k == "name" and (v in ELEM_TYPES or v in self._struct_names):
            ty = self.parse_type()
            name = self.next()[1]
            init = None
            if self.accept("="):
                init = self.parse_expr()
            if consume_semi:
                self.expect(";")
            return ("decl", ty, name, init)
        # tuple decl / tuple assignment?
        if v == "(":
            # decide by looking at the token after '('
            nk, nv = self.peek(1)
            if nk == "name" and (nv in ELEM_TYPES or nv in self._struct_names):
                self.next()  # (
                names = []
                while not self.accept(")"):
                    self.parse_type()
                    names.append(self.next()[1])
                    self.accept(",")
                self.expect("=")
                e = self.parse_expr()
                if consume_semi:
                    self.expect(";")
                return ("tdecl", names, e)
            # tuple assignment: parse lvalues as expressions
            self.next()  # (
            lvs = []
            while not self.accept(")"):
                lvs.append(self.parse_expr())
                self.accept(",")
            self.expect("=")
            e = self.parse_expr()
            if consume_semi:
                self.expect(";")
            return ("tassign", lvs, e)
        # expression / assignment / incdec
        e = self.parse_expr()
        nk, nv = self.peek()
        if nv in ("=", "+=", "-=", "*=", "/=", "%=", ">>=", "<<="):
            self.next()
            rhs = self.parse_expr()
            if consume_semi:
                self.expect(";")
            return ("assign", e, nv, rhs)
        if nv in ("++", "--"):
            self.next()
            if consume_semi:
                self.expect(";")
            return ("incdec", e, nv)
        if consume_semi:
            self.expect(";")
        return ("expr", e)

    # -- expressions (Solidity precedence: bitwise binds tighter than
    #    comparisons, unlike C — docs.soliditylang.org order of precedence)
    _BIN_LEVELS = [
        ["||"],
        ["&&"],
        ["==", "!="],
        ["<", ">", "<=", ">="],
        ["|"],
        ["^"],
        ["&"],
        ["<<", ">>"],
        ["+", "-"],
        ["*", "/", "%"],
        ["**"],
    ]

    def parse_expr(self):
        return self.parse_ternary()

    def parse_ternary(self):
        c = self.parse_bin(0)
        if self.peek()[1] == "?":
            self.next()
            t = self.parse_expr()
            self.expect(":")
            f = self.parse_expr()
            return ("cond", c, t, f)
        return c

    def parse_bin(self, level):
        if level >= len(self._BIN_LEVELS):
            return self.parse_unary()
        ops = self._BIN_LEVELS[level]
        e = self.parse_bin(level + 1)
        while self.peek()[1] in ops:
            op = self.next()[1]
            rhs = self.parse_bin(level + 1)
            e = ("bin", op, e, rhs)
        return e

    def parse_unary(self):
        k, v = self.peek()
        if v in ("-", "!", "~"):
            self.next()
            return ("un", v, self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            k, v = self.peek()
            if v == "{" and e[0] == "member" and e[2] == "call":
                # call options:  to.call{value: v}("")
                self.next()
                opts = {}
                while not self.accept("}"):
                    oname = self.next()[1]
                    self.expect(":")
                    opts[oname] = self.parse_expr()
                    self.accept(",")
                self.expect("(")
                args = []
                while not self.accept(")"):
                    args.append(self.parse_expr())
                    self.accept(",")
                e = ("lowcall", e[1], opts, args)
            elif v == "(":
                self.next()
                args = []
                while not self.accept(")"):
                    args.append(self.parse_expr())
                    self.accept(",")
                e = ("call", e, args)
            elif v == "[":
                self.next()
                idx = self.parse_expr()
                self.expect("]")
                e = ("index", e, idx)
            elif v == ".":
                self.next()
                e = ("member", e, self.next()[1])
            else:
                return e

    def parse_primary(self):
        k, v = self.next()
        if k == "num":
            return ("num", v)
        if k == "str":
            return ("str", v)
        if v == "(":
            items = [self.parse_expr()]
            while self.accept(","):
                items.append(self.parse_expr())
            self.expect(")")
            return items[0] if len(items) == 1 else ("tuple", items)
        if v == "[":
            items = []
            while not self.accept("]"):
                items.append(self.parse_expr())
                self.accept(",")
            return ("array", items)
        if v == "new":
            self.parse_type()  # element type (only uint256[] emitted)
            self.expect("(")
            n = self.parse_expr()
            self.expect(")")
            return ("new_array", n)
        if v == "true":
            return ("num", 1)
        if v == "false":
            return ("num", 0)
        if k == "name":
            return ("name", v)
        raise SyntaxError(f"unexpected token {v!r} in expression")


# --- gas schedule ---------------------------------------------------------------

GAS_INTRINSIC = 21_000
GAS_CALLDATA_NZ = 16
GAS_CALLDATA_Z = 4
GAS_VERYLOW = 3       # add/sub/shift/compare/mload-style ops
GAS_LOW = 5           # mul/div/mod
GAS_MODARITH = 8      # addmod/mulmod
GAS_KECCAK = 30
GAS_KECCAK_WORD = 6
GAS_STATICCALL = 100
GAS_ECADD = 150
GAS_ECMUL = 6_000
GAS_PAIRING_BASE = 45_000
GAS_PAIRING_PAIR = 34_000
GAS_JUMPDEST_CALL = 30  # per internal function call (jump + frame setup)
GAS_MEM_WORD = 3
GAS_SLOAD_COLD = 2_100
GAS_SLOAD_WARM = 100
GAS_SSTORE_NEW = 20_000   # zero -> nonzero
GAS_SSTORE_UPDATE = 5_000  # XXX simplified: no refunds
GAS_CALL_COLD = 2_600
GAS_CALL_VALUE = 9_000
GAS_LOG_BASE = 375
GAS_LOG_TOPIC = 375
GAS_LOG_BYTE = 8


def modexp_gas(base_len: int, exp: int, mod_len: int) -> int:
    """EIP-2565 pricing for the 0x05 precompile."""
    words = -(-max(base_len, mod_len) // 8)
    mult = words * words
    it = max(exp.bit_length() - 1, 0)
    return max(200, mult * max(it, 1) // 3)


# --- control-flow signals -------------------------------------------------------


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Continue(Exception):
    pass


class _Break(Exception):
    pass


# --- interpreter ---------------------------------------------------------------


@dataclass
class SolContract:
    """A parsed, executable Solidity artifact.

    Stateful contracts (storage vars, mappings, events) persist their
    storage in ``self.storage`` across calls; the hosting EvmRunner sets
    ``address``, ``block_number`` and the ``extcall`` hook used for
    interface calls / native sends to other deployed contracts.
    """

    source: str
    name: str = ""
    consts: dict = dc_field(default_factory=dict)
    funcs: dict = dc_field(default_factory=dict)
    structs: dict = dc_field(default_factory=dict)
    gas: int = 0
    gas_cat: dict = dc_field(default_factory=dict)
    storage: dict = dc_field(default_factory=dict)
    events_def: dict = dc_field(default_factory=dict)
    errors: set = dc_field(default_factory=set)
    interfaces: set = dc_field(default_factory=set)
    logs: list = dc_field(default_factory=list)
    address: int = 0
    extcall: object = None   # (addr, method, args, value) -> (ok, ret, gas)
    block_number: int = 1
    msg_sender: int = 0
    msg_value: int = 0

    def __post_init__(self):
        structs: dict = {}
        Parser._struct_names = set()
        # two-pass: collect struct names first so declarations parse
        for m in re.finditer(r"\bstruct\s+([A-Za-z_$][\w$]*)", self.source):
            Parser._struct_names.add(m.group(1))
        p = Parser(tokenize(self.source))
        self.name, const_exprs, self.funcs = p.parse_contract(structs)
        self.structs = structs
        # resolve constants (may reference earlier constants)
        env = {}
        for cname, (ctype, e) in const_exprs.items():
            env[cname] = self._eval_const(e, env)
        self.consts = env
        self.events_def = p.events
        self.errors = p.errors
        self.interfaces = p.interfaces
        for sty, sname, init in p.storage_decls:
            if sty[0] == "mapping":
                self.storage[sname] = {}
            elif init is not None:
                self.storage[sname] = self._eval_const(init, env)
            else:
                self.storage[sname] = self._default(sty)
        self._warm: set = set()

    def charge(self, n: int, cat: str) -> None:
        self.gas += n
        self.gas_cat[cat] = self.gas_cat.get(cat, 0) + n

    def _eval_const(self, e, env):
        kind = e[0]
        if kind == "num":
            return e[1]
        if kind == "name":
            return env[e[1]]
        if kind == "un" and e[1] == "-":
            return -self._eval_const(e[2], env)
        if kind == "bin":
            a = self._eval_const(e[2], env)
            b = self._eval_const(e[3], env)
            return {"+": a + b, "-": a - b, "*": a * b}[e[1]]
        raise SolPanic(f"unsupported constant expr {e!r}")

    @property
    def source_size(self) -> int:
        return len(self.source.encode())

    # -- public entry point
    def call(self, fn_name: str, *args, meter_tx: bool = True,
             sender: int = 0, value: int = 0):
        """Execute ``fn_name`` with python values; returns (result, gas_used).

        External bytes/uint256[] params accept python bytes / list[int].
        Gas includes the intrinsic tx cost + calldata bytes when the target
        is external and meter_tx is set (evm_runner.rs call semantics).
        ``sender``/``value`` populate msg.sender / msg.value.
        """
        fn = self.funcs[fn_name]
        self.gas = 0
        self.gas_cat = {}
        self.msg_sender = sender
        self.msg_value = value
        self._warm = set()
        if fn.external and meter_tx:
            self.charge(GAS_INTRINSIC + self._calldata_gas(args), "tx")
        result = self._invoke(fn, list(args))
        return result, self.gas

    def _calldata_gas(self, args) -> int:
        data = b"\x00" * 4  # selector
        for a in args:
            if isinstance(a, (bytes, bytearray)):
                data += len(a).to_bytes(32, "big") + bytes(a)
                data += b"\x00" * ((-len(a)) % 32)
            elif isinstance(a, list):
                data += len(a).to_bytes(32, "big")
                for w in a:
                    data += int(w).to_bytes(32, "big")
            else:
                data += int(a).to_bytes(32, "big")
        return sum(GAS_CALLDATA_Z if b == 0 else GAS_CALLDATA_NZ for b in data)

    # -- execution
    def _invoke(self, fn: FunctionDef, args: list):
        self.charge(GAS_JUMPDEST_CALL, "frames")
        scope = {}
        if len(args) != len(fn.params):
            raise SolPanic(f"{fn.name}: arg count")
        for (ptype, pname), val in zip(fn.params, args):
            scope[pname] = val
        named_rets = []
        for rtype, rname in fn.returns:
            if rname:
                scope[rname] = self._default(rtype)
                named_rets.append(rname)
        try:
            self._exec(fn.body, scope)
        except _Return as r:
            if r.value is not None:
                return r.value
        if named_rets:
            vals = tuple(scope[n] for n in named_rets)
            return vals[0] if len(vals) == 1 else vals
        return None

    def _default(self, ty):
        base, dims = ty
        if dims is not None:
            return []
        if base in ("bytes", "string"):
            return b""
        if base in self.structs:
            return {fname: self._default(ftype)
                    for ftype, fname in self.structs[base].fields}
        return 0

    def _exec(self, stmt, scope):
        kind = stmt[0]
        if kind == "block":
            inner = dict(scope)
            for s in stmt[1]:
                self._exec(s, inner)
            # propagate writes to pre-existing names (solidity scoping keeps
            # declarations local to the block, assignments visible outside)
            for k in scope:
                scope[k] = inner[k]
        elif kind == "expr":
            self._eval(stmt[1], scope)
        elif kind == "decl":
            _, ty, name, init = stmt
            scope[name] = (self._eval(init, scope) if init is not None
                           else self._default(ty))
            self.gas += GAS_VERYLOW
        elif kind == "tdecl":
            _, names, e = stmt
            vals = self._eval(e, scope)
            for n, v in zip(names, vals):
                scope[n] = v
            self.gas += GAS_VERYLOW * len(names)
        elif kind == "tassign":
            _, lvs, e = stmt
            vals = self._eval(e, scope)
            for lv, v in zip(lvs, vals):
                self._store(lv, v, scope)
        elif kind == "assign":
            _, lv, op, rhs = stmt
            v = self._eval(rhs, scope)
            if op != "=":
                cur = self._eval(lv, scope)
                v = self._binop(op[:-1], cur, v)
            self._store(lv, v, scope)
        elif kind == "incdec":
            _, lv, op = stmt
            cur = self._eval(lv, scope)
            v = self._binop("+" if op == "++" else "-", cur, 1)
            self._store(lv, v, scope)
        elif kind == "if":
            _, c, s, s_else = stmt
            if self._eval(c, scope):
                self._exec(s, scope)
            elif s_else is not None:
                self._exec(s_else, scope)
        elif kind == "for":
            _, init, cond, post, body = stmt
            inner = dict(scope)
            self._exec(init, inner)
            while self._eval(cond, inner):
                try:
                    self._exec(body, inner)
                except _Continue:
                    pass
                except _Break:
                    break
                self._exec(post, inner)
            for k in scope:
                scope[k] = inner[k]
        elif kind == "while":
            _, c, body = stmt
            while self._eval(c, scope):
                try:
                    self._exec(body, scope)
                except _Continue:
                    pass
                except _Break:
                    break
        elif kind == "emit":
            _, ename, arg_exprs = stmt
            if ename not in self.events_def:
                raise SolPanic(f"unknown event {ename}")
            vals = [self._eval(a, scope) for a in arg_exprs]
            names = [pn for _t, pn in self.events_def[ename]]
            self.logs.append((ename, dict(zip(names, vals))))
            self.gas += (GAS_LOG_BASE + GAS_LOG_TOPIC
                         + GAS_LOG_BYTE * 32 * len(vals))
        elif kind == "revert":
            _, ename, arg_exprs = stmt
            if ename is None:
                raise SolRevert(self._eval(arg_exprs[0], scope))
            if ename not in self.errors:
                raise SolPanic(f"unknown error {ename}")
            raise SolRevert(ename)
        elif kind == "cont":
            raise _Continue()
        elif kind == "brk":
            raise _Break()
        elif kind == "ret":
            raise _Return(self._eval(stmt[1], scope)
                          if stmt[1] is not None else None)
        elif kind == "asm":
            _, target, e = stmt
            scope[target] = B32(self._eval_asm(e, scope))
            self.gas += GAS_VERYLOW
        else:
            raise SolPanic(f"unknown statement {kind}")

    def _eval_asm(self, e, scope):
        """Yul mini-eval: bytes vars are (obj, base_off) pointers at 0x20."""
        kind = e[0]
        if kind == "num":
            return e[1]
        if kind == "name":
            v = scope.get(e[1], self.consts.get(e[1]))
            if isinstance(v, (bytes, bytearray)):
                # EVM layout: [b] = length word, data at b+0x20; base addr 0
                return ("ptr", bytes(v), 0)
            return v
        if kind == "call":
            fname = e[1][1]
            args = [self._eval_asm(a, scope) for a in e[2]]
            if fname == "add":
                a, b = args
                if isinstance(a, tuple) and a[0] == "ptr":
                    return ("ptr", a[1], a[2] + b)
                if isinstance(b, tuple) and b[0] == "ptr":
                    return ("ptr", b[1], b[2] + a)
                self.gas += GAS_VERYLOW
                return a + b
            if fname == "mload":
                self.gas += GAS_VERYLOW
                (tag, obj, off) = args[0]
                assert tag == "ptr"
                chunk = obj[off - 0x20 : off - 0x20 + 32]
                return int.from_bytes(chunk.ljust(32, b"\x00"), "big")
            raise SolPanic(f"unsupported asm builtin {fname}")
        raise SolPanic(f"bad asm expr {e!r}")

    # -- lvalue store
    def _sstore_gas(self, was, now):
        self.gas += (GAS_SSTORE_NEW if (not was and now)
                     else GAS_SSTORE_UPDATE)

    def _store(self, lv, v, scope):
        self.gas += GAS_VERYLOW
        kind = lv[0]
        if kind == "name":
            if lv[1] in scope:
                scope[lv[1]] = v
            elif lv[1] in self.storage:
                self._sstore_gas(self.storage[lv[1]], v)
                self.storage[lv[1]] = v
            else:
                raise SolPanic(f"assign to undeclared {lv[1]}")
        elif kind == "index":
            arr = self._eval(lv[1], scope)
            idx = self._eval(lv[2], scope)
            if isinstance(arr, dict):  # storage mapping
                self._sstore_gas(arr.get(idx, 0), v)
                arr[idx] = v
                return
            if idx >= len(arr):
                raise SolPanic("array index out of bounds")
            arr[idx] = v
        elif kind == "member":
            obj = self._eval(lv[1], scope)
            obj[lv[2]] = v
        else:
            raise SolPanic(f"bad lvalue {kind}")

    # -- expression evaluation
    def _eval(self, e, scope):
        kind = e[0]
        if kind == "num":
            return e[1]
        if kind == "str":
            return e[1]
        if kind == "name":
            n = e[1]
            if n in scope:
                self.charge(GAS_VERYLOW, "vm")
                return scope[n]
            if n in self.consts:
                self.charge(GAS_VERYLOW, "vm")
                return self.consts[n]
            if n in self.storage:
                self.gas += (GAS_SLOAD_WARM if n in self._warm
                             else GAS_SLOAD_COLD)
                self._warm.add(n)
                return self.storage[n]
            if n == "this":
                return self.address
            raise SolPanic(f"unknown name {n}")
        if kind == "bin":
            op = e[1]
            if op == "&&":
                return bool(self._eval(e[2], scope)) and bool(self._eval(e[3], scope))
            if op == "||":
                return bool(self._eval(e[2], scope)) or bool(self._eval(e[3], scope))
            a = self._eval(e[2], scope)
            b = self._eval(e[3], scope)
            return self._binop(op, a, b)
        if kind == "un":
            v = self._eval(e[2], scope)
            self.gas += GAS_VERYLOW
            if e[1] == "-":
                return -v          # int256 negation (only on signed values)
            if e[1] == "!":
                return not v
            if e[1] == "~":
                return v ^ (WORD - 1)
        if kind == "cond":
            return (self._eval(e[2], scope) if self._eval(e[1], scope)
                    else self._eval(e[3], scope))
        if kind == "tuple":
            return tuple(self._eval(x, scope) for x in e[1])
        if kind == "array":
            self.gas += GAS_MEM_WORD * len(e[1])
            return [self._eval(x, scope) for x in e[1]]
        if kind == "new_array":
            n = self._eval(e[1], scope)
            self.gas += GAS_MEM_WORD * n
            return [0] * n
        if kind == "index":
            arr = self._eval(e[1], scope)
            idx = self._eval(e[2], scope)
            self.charge(GAS_VERYLOW, "vm")
            if isinstance(arr, dict):  # storage mapping: absent slot = 0
                key = (e[1][1], idx) if e[1][0] == "name" else id(arr)
                self.gas += (GAS_SLOAD_WARM if key in self._warm
                             else GAS_SLOAD_COLD)
                self._warm.add(key)
                return arr.get(idx, 0)
            if idx >= len(arr):
                raise SolPanic("array index out of bounds")
            return arr[idx]
        if kind == "lowcall":
            # to.call{value: v}(data): native send through the runner
            addr = self._eval(e[1], scope)
            value = (self._eval(e[2]["value"], scope)
                     if "value" in e[2] else 0)
            ok, ret, gas = self._do_extcall(addr, "__send__", [], value)
            self.gas += gas
            return (ok, ret)
        if kind == "member":
            base, mname = e[1], e[2]
            if base == ("name", "msg"):
                self.gas += GAS_VERYLOW
                if mname == "sender":
                    return self.msg_sender
                if mname == "value":
                    return self.msg_value
                raise SolPanic(f"msg.{mname} unsupported")
            if base == ("name", "block"):
                self.gas += GAS_VERYLOW
                if mname == "number":
                    return self.block_number
                raise SolPanic(f"block.{mname} unsupported")
            if base == ("name", "abi"):
                raise SolPanic("abi member used without call")
            obj = self._eval(base, scope)
            if mname == "balance" and isinstance(obj, int) \
                    and not isinstance(obj, bool):
                ok, ret, gas = self._do_extcall(obj, "__balance__", [], 0)
                self.gas += gas
                return ret
            if mname == "length":
                self.gas += GAS_VERYLOW
                return len(obj)
            if isinstance(obj, dict):
                self.gas += GAS_VERYLOW
                return obj[mname]
            raise SolPanic(f"unknown member {mname}")
        if kind == "call":
            return self._call(e[1], e[2], scope)
        raise SolPanic(f"bad expression {e!r}")

    def _binop(self, op, a, b):
        self.charge(GAS_MODARITH if op in ("addmod", "mulmod") else (
            GAS_LOW if op in ("*", "/", "%", "**") else GAS_VERYLOW),
            "arith")
        if op == "+":
            r = a + b
        elif op == "-":
            r = a - b
            # solc 0.8 checked arithmetic: uint256 underflow is a Panic.
            # Negative operands can only originate from int256 expressions
            # (negative literals / unary minus, e.g. ROT_LAST), where a
            # negative result is legitimate signed arithmetic.
            if r < 0 and a >= 0 and b >= 0:
                raise SolPanic("uint256 underflow")
        elif op == "*":
            r = a * b
        elif op == "/":
            if b == 0:
                raise SolPanic("division by zero")
            r = a // b
        elif op == "%":
            if b == 0:
                raise SolPanic("mod by zero")
            r = a % b
        elif op == "**":
            r = pow(a, b)
        elif op == "<<":
            r = (a << b) & (WORD - 1)
        elif op == ">>":
            r = a >> b
        elif op == "&":
            r = a & b
        elif op == "|":
            r = a | b
        elif op == "^":
            r = a ^ b
        elif op == "==":
            return a == b
        elif op == "!=":
            return a != b
        elif op == "<":
            return a < b
        elif op == ">":
            return a > b
        elif op == "<=":
            return a <= b
        elif op == ">=":
            return a >= b
        else:
            raise SolPanic(f"bad operator {op}")
        if isinstance(r, int) and r >= WORD:
            raise SolPanic("uint256 overflow")
        return r

    # -- calls (builtins, casts, precompiles, internal functions)
    def _call(self, fn_expr, arg_exprs, scope):
        # abi.* and address(..).staticcall need the unevaluated callee
        if fn_expr[0] == "member":
            base, mname = fn_expr[1], fn_expr[2]
            # interface call:  IFace(addr).method(args)
            if base[0] == "call" and base[1][0] == "name" \
                    and base[1][1] in self.interfaces:
                addr = self._eval(base[2][0], scope)
                args = [self._eval(a, scope) for a in arg_exprs]
                ok, ret, gas = self._do_extcall(addr, mname, args, 0)
                self.gas += gas
                if not ok:
                    raise SolRevert(f"{base[1][1]}.{mname} reverted: {ret}")
                return ret
            if base == ("name", "abi"):
                if mname == "encodePacked":
                    return self._encode_packed(
                        [self._eval(a, scope) for a in arg_exprs])
                if mname == "encode":
                    return self._abi_encode(
                        [self._eval(a, scope) for a in arg_exprs])
                if mname == "decode":
                    # second arg is a type tuple — recover names syntactically
                    data = self._eval(arg_exprs[0], scope)
                    tspec = arg_exprs[1]
                    names = ([t[1] for t in tspec[1]]
                             if tspec[0] == "tuple" else [tspec[1]])
                    vals = tuple(
                        int.from_bytes(data[32 * i : 32 * i + 32], "big")
                        for i in range(len(names)))
                    self.gas += GAS_VERYLOW * len(names)
                    return vals[0] if len(vals) == 1 else vals
                raise SolPanic(f"abi.{mname} unsupported")
            if mname == "staticcall":
                addr = self._eval(base, scope)
                payload = self._eval(arg_exprs[0], scope)
                return self._precompile(addr, payload)
            raise SolPanic(f"member call .{mname} unsupported")

        if fn_expr[0] != "name":
            raise SolPanic(f"uncallable {fn_expr!r}")
        fname = fn_expr[1]

        # casts
        if fname in ("uint256", "uint"):
            v = self._eval(arg_exprs[0], scope)
            if isinstance(v, B32):
                return int(v)
            v = int(v)
            return v % WORD if v < 0 else v
        if fname == "int256":
            v = int(self._eval(arg_exprs[0], scope))
            return v - WORD if v >= WORD // 2 else v
        if fname == "bytes32":
            return B32(int(self._eval(arg_exprs[0], scope)))
        if fname == "uint8":
            return U8(int(self._eval(arg_exprs[0], scope)) & 0xFF)
        if fname == "uint160":
            return int(self._eval(arg_exprs[0], scope)) & ((1 << 160) - 1)
        if fname in ("address", "payable"):
            return int(self._eval(arg_exprs[0], scope))
        if fname == "bool":
            return bool(self._eval(arg_exprs[0], scope))

        # builtins
        if fname == "require":
            cond = self._eval(arg_exprs[0], scope)
            if not cond:
                msg = (self._eval(arg_exprs[1], scope)
                       if len(arg_exprs) > 1 else "")
                raise SolRevert(msg)
            return None
        if fname in ("addmod", "mulmod"):
            a = self._eval(arg_exprs[0], scope)
            b = self._eval(arg_exprs[1], scope)
            m = self._eval(arg_exprs[2], scope)
            self.charge(GAS_MODARITH, "arith")
            if m == 0:
                raise SolPanic("mod by zero")
            return (a + b) % m if fname == "addmod" else (a * b) % m
        if fname == "keccak256":
            data = self._eval(arg_exprs[0], scope)
            self.charge(GAS_KECCAK + GAS_KECCAK_WORD * (-(-len(data) // 32)),
                        "keccak")
            return B32(int.from_bytes(KK.keccak256(bytes(data)), "big"))

        # internal function
        fn = self.funcs.get(fname)
        if fn is None:
            raise SolPanic(f"unknown function {fname}")
        args = [self._eval(a, scope) for a in arg_exprs]
        return self._invoke(fn, args)

    # -- external calls (interface calls, native sends)
    def _do_extcall(self, addr: int, method: str, args: list, value: int):
        """Dispatch to another deployed contract through the runner hook.

        Returns (ok, ret, gas).  Without a hook (standalone artifact
        execution, e.g. the verifier tests) only precompile addresses
        work — anything else is a deployment error.
        """
        gas = GAS_CALL_COLD + (GAS_CALL_VALUE if value else 0)
        if self.extcall is None:
            raise SolPanic(f"no runner: external call to {addr:#x}")
        ok, ret, callee_gas = self.extcall(addr, method, args, value)
        return ok, ret, gas + callee_gas

    # -- abi helpers
    def _encode_packed(self, args) -> bytes:
        out = b""
        for a in args:
            if isinstance(a, (bytes, bytearray)):
                out += bytes(a)
            elif isinstance(a, U8):
                out += bytes([int(a) & 0xFF])
            elif isinstance(a, (B32, int)):
                out += int(a).to_bytes(32, "big")
            else:
                raise SolPanic(f"encodePacked: {type(a)}")
        self.charge(GAS_MEM_WORD * (-(-len(out) // 32)), "mem")
        return out

    def _abi_encode(self, args) -> bytes:
        out = b""
        for a in args:
            if isinstance(a, list):  # static uint256[K] array encodes inline
                for w in a:
                    out += int(w).to_bytes(32, "big")
            else:
                out += int(a).to_bytes(32, "big")
        self.charge(GAS_MEM_WORD * (-(-len(out) // 32)), "mem")
        return out

    # -- precompiles (Ethereum addresses 0x05..0x08)
    def _precompile(self, addr: int, payload: bytes):
        self.charge(GAS_STATICCALL, "staticcall")
        words = [int.from_bytes(payload[i : i + 32], "big")
                 for i in range(0, len(payload), 32)]
        try:
            if addr == 0x05:  # modexp
                blen, elen, mlen = words[0], words[1], words[2]
                off = 96
                base = int.from_bytes(payload[off : off + blen], "big")
                exp = int.from_bytes(payload[off + blen : off + blen + elen], "big")
                mod = int.from_bytes(
                    payload[off + blen + elen : off + blen + elen + mlen], "big")
                self.charge(modexp_gas(blen, exp, mlen), "modexp")
                if mod == 0:
                    return (True, b"\x00" * mlen)
                return (True, pow(base, exp, mod).to_bytes(mlen, "big"))
            if addr == 0x06:  # ecAdd
                self.charge(GAS_ECADD, "ecadd")
                p1 = self._read_g1(words[0], words[1])
                p2 = self._read_g1(words[2], words[3])
                r = CG.add(p1, p2)
                return (True, self._write_g1(r))
            if addr == 0x07:  # ecMul
                self.charge(GAS_ECMUL, "ecmul")
                p = self._read_g1(words[0], words[1])
                r = CG.scalar_mul(words[2], p)
                return (True, self._write_g1(r))
            if addr == 0x08:  # pairing
                k = len(words) // 6
                self.charge(GAS_PAIRING_BASE + GAS_PAIRING_PAIR * k,
                            "pairing")
                pairs = []
                for i in range(k):
                    g1 = self._read_g1(words[6 * i], words[6 * i + 1])
                    xi, xr = words[6 * i + 2], words[6 * i + 3]
                    yi, yr = words[6 * i + 4], words[6 * i + 5]
                    g2 = None if (xi | xr | yi | yr) == 0 else \
                        ((xr, xi), (yr, yi))
                    pairs.append((g1, g2))
                ok = PG.pairing_check(pairs)
                return (True, (1 if ok else 0).to_bytes(32, "big"))
        except SolPanic:
            raise
        except Exception:
            return (False, b"")
        return (False, b"")

    @staticmethod
    def _read_g1(x: int, y: int):
        if x == 0 and y == 0:
            return None
        # EIP-196/197 input validation: coordinates >= p are an invalid
        # encoding and the precompile fails — reducing mod p here would
        # accept non-canonical (malleable) proof encodings revm rejects.
        if x >= Q or y >= Q:
            raise ValueError("coordinate out of range")  # precompile failure
        pt = (x, y)
        if not CG.is_on_curve(pt):
            raise ValueError("not on curve")  # precompile failure
        return pt

    @staticmethod
    def _write_g1(pt) -> bytes:
        if pt is None:
            return b"\x00" * 64
        return pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def load(path: str) -> SolContract:
    with open(path) as f:
        return SolContract(f.read())
