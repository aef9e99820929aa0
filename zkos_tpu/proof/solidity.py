"""Solidity verifier emission — the deployable twin of codegen's artifact.

Renders a standalone Solidity contract for a compiled circuit, structurally
mirroring the reference's generated verifier
(crates/halo2-verifier/templates/Halo2Verifier.sol): embedded verifying-key
constants, Keccak256 Fiat-Shamir transcript replay over the proof bytes,
on-curve and field-range checks on every read, the gate + permutation +
lookup quotient numerator *specialized into straight-line mulmod/addmod
code* (the Evaluator's role), x^n quotient-commitment folding, and the
BDFG21 rotation-set pairing inputs — EC arithmetic through the 0x06/0x07
precompiles, inversions through modexp (0x05), and the final check through
the 0x08 pairing precompile.

The Python artifact (proof.codegen) is the executable twin used as the
acceptance oracle in tests; this module emits the on-chain form.  Both are
rendered from the same VerifyingKey, and the test suite asserts constant
and schedule parity between the two artifacts.  (This framework carries no
EVM, so gas is not measured here; the reference's measured verification
gas lives in the sim's gas model, protocol.contract.GAS_VERIFY.)
"""

from __future__ import annotations

from . import plonk

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = plonk.P


def _sol_expr(e) -> str:
    """Expr -> solidity mulmod/addmod source over the eval arrays."""
    if isinstance(e, plonk.Constant):
        return hex(e.value)
    if isinstance(e, plonk.Fixed):
        return f"f[{_fq_slot(e.index, e.rot)}]"
    if isinstance(e, plonk.Advice):
        return f"a[{_aq_slot(e.index, e.rot)}]"
    if isinstance(e, plonk.Instance):
        return "instanceEval"
    if isinstance(e, plonk.Sum):
        return f"addmod({_sol_expr(e.a)}, {_sol_expr(e.b)}, R)"
    if isinstance(e, plonk.Prod):
        return f"mulmod({_sol_expr(e.a)}, {_sol_expr(e.b)}, R)"
    if isinstance(e, plonk.Scaled):
        return f"mulmod({_sol_expr(e.e)}, {hex(e.k % R)}, R)"
    raise TypeError(e)


_AQ: list = []
_FQ: list = []


def _aq_slot(idx, rot):
    return _AQ.index((idx, rot))


def _fq_slot(idx, rot):
    return _FQ.index((idx, rot))


def _sub(a: str, b: str) -> str:
    return f"addmod({a}, R - {b}, R)"


def _render_zs_prepass(sets):
    out = [f'        uint256[] memory zsArr = new uint256[]({len(sets)});']
    for si, (rots, _keys) in enumerate(sets):
        out.append('        {')
        out.append('            uint256 zp_ = 1;')
        for rot in rots:
            out.append(f'            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, {rot}), R), R);')
        out.append(f'            zsArr[{si}] = zp_;')
        out.append('        }')
    out.append('        uint256[] memory zsInvArr = batchInv(zsArr);')
    return chr(10).join(out)


def render_solidity_verifier(vk: plonk.VerifyingKey,
                             name: str = "Halo2Verifier") -> str:
    """Render the specialized Solidity verifier for this verifying key."""
    global _AQ, _FQ
    cs = vk.cs
    d = vk.domain
    n = d.n
    nz = cs.num_permutation_zs()
    n_lk = len(cs.lookups)
    num_q = cs.num_quotients()
    rot_last = cs.rotation_last()
    _AQ = cs.advice_queries()
    _FQ = cs.fixed_queries()
    chunk_len = cs.permutation_chunk_len()
    chunks = [cs.permutation_columns[i : i + chunk_len]
              for i in range(0, len(cs.permutation_columns), chunk_len)]

    # --- quotient numerator rows, specialized (evaluator.rs) ---
    rows = []
    for _gname, exprs in cs.gates:
        for e in exprs:
            rows.append(_sol_expr(e))
    if nz:
        rows.append(f"mulmod(l0, {_sub('1', 'z[0]')}, R)")
        zl = f"z[{3 * (nz - 1)}]"
        rows.append(f"mulmod(lLast, {_sub(f'mulmod({zl}, {zl}, R)', zl)}, R)")
        for j in range(1, nz):
            rows.append(
                f"mulmod(l0, {_sub(f'z[{3 * j}]', f'z[{3 * (j - 1) + 2}]')}, R)")
        col_offset = 0
        for ci, chunk in enumerate(chunks):
            lhs = f"z[{3 * ci + 1}]"
            rhs = f"z[{3 * ci}]"
            for j, col in enumerate(chunk):
                if col.kind == "fixed":
                    v = f"f[{_fq_slot(col.index, 0)}]"
                elif col.kind == "advice":
                    v = f"a[{_aq_slot(col.index, 0)}]"
                else:
                    v = "instanceEval"
                gi = col_offset + j
                tagk = pow(plonk.dom.DELTA, gi, R)
                lhs = (f"mulmod({lhs}, addmod(addmod({v}, "
                       f"mulmod(beta, s[{gi}], R), R), gamma, R), R)")
                rhs = (f"mulmod({rhs}, addmod(addmod({v}, "
                       f"mulmod(mulmod(beta, {hex(tagk)}, R), x, R), R), "
                       f"gamma, R), R)")
            rows.append(f"mulmod({_sub(lhs, rhs)}, active, R)")
            col_offset += len(chunk)
    for li, (_lname, ins, tabs) in enumerate(cs.lookups):
        def comp(exprs):
            acc = _sol_expr(exprs[0])
            for e in exprs[1:]:
                acc = f"addmod(mulmod({acc}, theta, R), {_sol_expr(e)}, R)"
            return acc

        z0 = f"lk[{5 * li}]"
        zn = f"lk[{5 * li + 1}]"
        pin = f"lk[{5 * li + 2}]"
        pprev = f"lk[{5 * li + 3}]"
        ptab = f"lk[{5 * li + 4}]"
        rows.append(f"mulmod(l0, {_sub('1', z0)}, R)")
        rows.append(f"mulmod(lLast, {_sub(f'mulmod({z0}, {z0}, R)', z0)}, R)")
        lhs = (f"mulmod({zn}, mulmod(addmod({pin}, beta, R), "
               f"addmod({ptab}, gamma, R), R), R)")
        rhs = (f"mulmod({z0}, mulmod(addmod({comp(ins)}, beta, R), "
               f"addmod({comp(tabs)}, gamma, R), R), R)")
        rows.append(f"mulmod({_sub(lhs, rhs)}, active, R)")
        rows.append(f"mulmod(l0, {_sub(pin, ptab)}, R)")
        rows.append(f"mulmod(mulmod({_sub(pin, ptab)}, "
                    f"{_sub(pin, pprev)}, R), active, R)")

    numer_lines = "\n".join(
        f"        numer = addmod(mulmod(numer, y, R), {row}, R);"
        for row in rows)

    # --- BDFG21 rotation-set structure (static at generation time) ---
    keyed = plonk._open_queries(
        cs,
        [("advice", i) for i in range(cs.num_advice)],
        [("perm_z", i) for i in range(nz)],
        [("sigma", i) for i in range(len(vk.permutation_comms))],
        [("fixed", i) for i in range(cs.num_fixed)],
        ("quotient", 0), ("random", 0),
        lookup_zs=[("lookup_z", i) for i in range(n_lk)],
        lookup_pins=[("lookup_pin", i) for i in range(n_lk)],
        lookup_ptabs=[("lookup_ptab", i) for i in range(n_lk)])
    sets = plonk._rotation_sets(keyed)

    def comm_expr(key) -> str:
        kind, i = key
        return {
            "advice": lambda: f"(adv[{2 * i}], adv[{2 * i + 1}])",
            "perm_z": lambda: f"(zc[{2 * i}], zc[{2 * i + 1}])",
            "sigma": lambda: f"({vk.permutation_comms[i][0]}, "
                             f"{vk.permutation_comms[i][1]})",
            "fixed": lambda: (f"({vk.fixed_comms[i][0]}, "
                              f"{vk.fixed_comms[i][1]})"
                              if vk.fixed_comms[i] else "(0, 0)"),
            "quotient": lambda: "(qcX, qcY)",
            "random": lambda: "(randX, randY)",
            "lookup_z": lambda: f"(lkz[{2 * i}], lkz[{2 * i + 1}])",
            "lookup_pin": lambda: f"(lkp[{4 * i}], lkp[{4 * i + 1}])",
            "lookup_ptab": lambda: f"(lkp[{4 * i + 2}], lkp[{4 * i + 3}])",
        }[kind]()

    def eval_expr(key, rot) -> str:
        kind, i = key
        if kind == "advice":
            return f"a[{_aq_slot(i, rot)}]"
        if kind == "fixed":
            return f"f[{_fq_slot(i, rot)}]"
        if kind == "sigma":
            return f"s[{i}]"
        if kind == "perm_z":
            return f"z[{3 * i + {0: 0, 1: 1, rot_last: 2}[rot]}]"
        if kind == "quotient":
            return "quotientEval"
        if kind == "random":
            return "randomEval"
        if kind == "lookup_z":
            return f"lk[{5 * i + {0: 0, 1: 1}[rot]}]"
        if kind == "lookup_pin":
            return f"lk[{5 * i + {0: 2, -1: 3}[rot]}]"
        if kind == "lookup_ptab":
            return f"lk[{5 * i + 4}]"
        raise KeyError(key)

    zs_prepass = _render_zs_prepass(sets)
    set_blocks = []
    for si, (rots, keys) in enumerate(sets):
        m = len(rots)
        lines = [f"        // rotation set {si}: rotations {rots}"]
        lines.append("        {")
        # Fused scalar accumulation: each commitment is multiplied ONCE by
        # its final scalar scale_s * zeta^k (scale_s = nu^s * z0(mu)/zs(mu))
        # and added straight into F — no per-set combined point, no second
        # ecMul by scale (one precompile call saved per rotation set, and
        # set 0's first scalar is exactly 1, which ecMul short-circuits).
        # The set evals carry the same scale (interpAt is linear), so
        # rTotal needs no scale factor either.
        lines.append("            uint256 zp = mulmod(nuPow, "
                     f"mulmod(z0Mu, zsInvArr[{si}], R), R);")
        lines.append(f"            uint256[] memory ce = new uint256[]({m});")
        lines.append(f"            uint256[] memory pts = new uint256[]({m});")
        for ri, rot in enumerate(rots):
            lines.append(f"            pts[{ri}] = rotPoint(x, {rot});")
        for key in keys:
            lines.append(f"            (tx_, ty_) = {comm_expr(key)};")
            lines.append("            (tx_, ty_) = ecMul(tx_, ty_, zp);")
            lines.append("            (fX, fY) = ecAdd(fX, fY, tx_, ty_);")
            for ri, rot in enumerate(rots):
                lines.append(
                    f"            ce[{ri}] = addmod(ce[{ri}], "
                    f"mulmod(zp, {eval_expr(key, rot)}, R), R);")
            lines.append("            zp = mulmod(zp, zeta, R);")
        lines.append("            rTotal = addmod(rTotal, "
                     "interpAt(pts, ce, mu), R);")
        lines.append("            nuPow = mulmod(nuPow, nu, R);")
        lines.append("        }")
        set_blocks.append("\n".join(lines))
    z0_rots = sets[0][0] if sets else []
    z0_lines = "\n".join(
        f"        z0Mu = mulmod(z0Mu, addmod(mu, R - rotPoint(x, {rot}), R), R);"
        for rot in z0_rots)

    fixed_comm_consts = "\n".join(
        f"    uint256 internal constant FIXED_X_{i} = "
        f"{c[0] if c else 0};\n"
        f"    uint256 internal constant FIXED_Y_{i} = {c[1] if c else 0};"
        for i, c in enumerate(vk.fixed_comms))

    src = f'''// SPDX-License-Identifier: MIT
// GENERATED VERIFIER — do not edit.
// Rendered by zkos_tpu.proof.solidity.render_solidity_verifier from the
// same VerifyingKey as the executable Python twin (proof.codegen); the
// structure mirrors crates/halo2-verifier/templates/Halo2Verifier.sol.
pragma solidity ^0.8.26;

contract {name} {{
    uint256 internal constant R = {R};       // BN254 scalar field
    uint256 internal constant Q = {Q};       // BN254 base field
    uint256 internal constant N = {n};
    uint256 internal constant N_INV = {pow(n, R - 2, R)};
    uint256 internal constant OMEGA = {d.omega};
    uint256 internal constant OMEGA_INV = {d.omega_inv};
    uint256 internal constant VK_DIGEST = {vk.vk_digest};
    uint256 internal constant NUM_ADVICE = {cs.num_advice};
    uint256 internal constant NUM_Z = {nz};
    uint256 internal constant NUM_LOOKUPS = {n_lk};
    uint256 internal constant NUM_QUOTIENTS = {num_q};
    int256  internal constant ROT_LAST = {rot_last};
    uint256 internal constant G2_X0 = {vk.g2[0][0]};
    uint256 internal constant G2_X1 = {vk.g2[0][1]};
    uint256 internal constant G2_Y0 = {vk.g2[1][0]};
    uint256 internal constant G2_Y1 = {vk.g2[1][1]};
    uint256 internal constant SG2_X0 = {vk.s_g2[0][0]};
    uint256 internal constant SG2_X1 = {vk.s_g2[0][1]};
    uint256 internal constant SG2_Y0 = {vk.s_g2[1][0]};
    uint256 internal constant SG2_Y1 = {vk.s_g2[1][1]};
{fixed_comm_consts}

    // --- precompile helpers (Halo2Verifier.sol ec_* / pairing wrappers) ---
    function ecAdd(uint256 ax, uint256 ay, uint256 bx, uint256 by)
        internal view returns (uint256, uint256) {{
        if (ax == 0 && ay == 0) return (bx, by);
        if (bx == 0 && by == 0) return (ax, ay);
        (bool ok, bytes memory out) = address(0x06).staticcall(
            abi.encode(ax, ay, bx, by));
        require(ok, "ecAdd");
        return abi.decode(out, (uint256, uint256));
    }}

    function ecMul(uint256 px, uint256 py, uint256 k)
        internal view returns (uint256, uint256) {{
        if (k == 0 || (px == 0 && py == 0)) return (0, 0);
        if (k == 1) return (px, py);
        (bool ok, bytes memory out) = address(0x07).staticcall(
            abi.encode(px, py, k));
        require(ok, "ecMul");
        return abi.decode(out, (uint256, uint256));
    }}

    function inv(uint256 v) internal view returns (uint256) {{
        (bool ok, bytes memory out) = address(0x05).staticcall(
            abi.encode(32, 32, 32, v, R - 2, R));
        require(ok, "modexp");
        return abi.decode(out, (uint256));
    }}

    function rotPoint(uint256 x, int256 rot)
        internal view returns (uint256) {{
        uint256 w = rot >= 0 ? OMEGA : OMEGA_INV;
        uint256 e = uint256(rot >= 0 ? rot : -rot);
        uint256 acc = x;
        for (uint256 i = 0; i < e; i++) acc = mulmod(acc, w, R);
        return acc;
    }}

    // l_i(x) = zh * w^i * N_INV / (x - w^i); the caller supplies w^i
    // (built incrementally) and the batch-inverted denominator — the
    // O(i) omega loop + per-value modexp of the naive form cost ~300k
    // gas at k=11 (template :399-471 batches exactly like this)
    function lagW(uint256 zh, uint256 wi, uint256 dinv)
        internal pure returns (uint256) {{
        return mulmod(mulmod(zh, wi, R), mulmod(N_INV, dinv, R), R);
    }}

    // Montgomery batch inversion: one modexp for any number of values
    function batchInv(uint256[] memory v)
        internal view returns (uint256[] memory) {{
        uint256 m = v.length;
        uint256[] memory pre = new uint256[](m);
        uint256 acc = 1;
        for (uint256 i = 0; i < m; i++) {{
            pre[i] = acc;
            acc = mulmod(acc, v[i], R);
        }}
        uint256 ai = inv(acc);
        uint256[] memory out = new uint256[](m);
        for (uint256 i = m; i > 0; i--) {{
            out[i - 1] = mulmod(ai, pre[i - 1], R);
            ai = mulmod(ai, v[i - 1], R);
        }}
        return out;
    }}

    function interpAt(uint256[] memory pts, uint256[] memory vals,
                      uint256 mu) internal view returns (uint256) {{
        if (pts.length == 1) return vals[0];
        uint256 acc;
        uint256[] memory dens = new uint256[](pts.length);
        for (uint256 i = 0; i < pts.length; i++) {{
            uint256 den = 1;
            for (uint256 j = 0; j < pts.length; j++) {{
                if (i == j) continue;
                den = mulmod(den, addmod(pts[i], R - pts[j], R), R);
            }}
            dens[i] = den;
        }}
        uint256[] memory dinv = batchInv(dens);
        for (uint256 i = 0; i < pts.length; i++) {{
            uint256 num = 1;
            for (uint256 j = 0; j < pts.length; j++) {{
                if (i == j) continue;
                num = mulmod(num, addmod(mu, R - pts[j], R), R);
            }}
            acc = addmod(acc, mulmod(vals[i],
                mulmod(num, dinv[i], R), R), R);
        }}
        return acc;
    }}

    // --- transcript (Keccak256 FS; Halo2Verifier.sol:104-124) ---
    struct T {{ bytes buf; uint256 cptr; bytes proof; }}

    function squeeze(T memory t) internal pure returns (uint256 c) {{
        bytes32 h = keccak256(t.buf);
        t.buf = abi.encodePacked(h);
        c = uint256(h) % R;
    }}

    function squeezeCont(T memory t) internal pure returns (uint256 c) {{
        bytes32 h = keccak256(abi.encodePacked(t.buf, uint8(1)));
        t.buf = abi.encodePacked(h);
        c = uint256(h) % R;
    }}

    function readScalar(T memory t) internal pure returns (uint256 v) {{
        v = uint256(bytes32(slice(t.proof, t.cptr)));
        require(v < R, "scalar range");
        t.cptr += 32;
        t.buf = abi.encodePacked(t.buf, bytes32(v));
    }}

    function readPoint(T memory t)
        internal pure returns (uint256 px, uint256 py) {{
        px = uint256(bytes32(slice(t.proof, t.cptr)));
        py = uint256(bytes32(slice(t.proof, t.cptr + 32)));
        t.cptr += 64;
        require(px < Q && py < Q, "coord range");
        require(mulmod(py, py, Q) ==
                addmod(mulmod(px, mulmod(px, px, Q), Q), 3, Q), "on curve");
        t.buf = abi.encodePacked(t.buf, bytes32(px), bytes32(py));
    }}

    function slice(bytes memory b, uint256 off)
        internal pure returns (bytes32 out) {{
        assembly {{ out := mload(add(add(b, 0x20), off)) }}
    }}

    // --- the verification algorithm ---
    function verifyProof(bytes calldata proof, uint256[] calldata instances)
        external view returns (bool) {{
        T memory t;
        t.proof = proof;
        t.buf = abi.encodePacked(bytes32(uint256(VK_DIGEST)));
        for (uint256 i = 0; i < instances.length; i++) {{
            require(instances[i] < R, "instance range");
            t.buf = abi.encodePacked(t.buf, bytes32(instances[i]));
        }}

        uint256[] memory adv = new uint256[](2 * NUM_ADVICE);
        for (uint256 i = 0; i < NUM_ADVICE; i++)
            (adv[2 * i], adv[2 * i + 1]) = readPoint(t);
        uint256 theta = squeeze(t);
        uint256[] memory lkp = new uint256[](4 * NUM_LOOKUPS);
        for (uint256 i = 0; i < NUM_LOOKUPS; i++) {{
            (lkp[4 * i], lkp[4 * i + 1]) = readPoint(t);
            (lkp[4 * i + 2], lkp[4 * i + 3]) = readPoint(t);
        }}
        uint256 beta = NUM_LOOKUPS > 0 ? squeeze(t) : squeezeCont(t);
        uint256 gamma = squeezeCont(t);
        uint256[] memory zc = new uint256[](2 * NUM_Z);
        for (uint256 i = 0; i < NUM_Z; i++)
            (zc[2 * i], zc[2 * i + 1]) = readPoint(t);
        uint256[] memory lkz = new uint256[](2 * NUM_LOOKUPS);
        for (uint256 i = 0; i < NUM_LOOKUPS; i++)
            (lkz[2 * i], lkz[2 * i + 1]) = readPoint(t);
        (uint256 randX, uint256 randY) = readPoint(t);
        uint256 y = squeeze(t);
        uint256[] memory qc2 = new uint256[](2 * NUM_QUOTIENTS);
        for (uint256 i = 0; i < NUM_QUOTIENTS; i++)
            (qc2[2 * i], qc2[2 * i + 1]) = readPoint(t);
        uint256 x = squeeze(t);

        uint256[] memory a = new uint256[]({len(_AQ)});
        for (uint256 i = 0; i < {len(_AQ)}; i++) a[i] = readScalar(t);
        uint256[] memory f = new uint256[]({len(_FQ)});
        for (uint256 i = 0; i < {len(_FQ)}; i++) f[i] = readScalar(t);
        uint256 randomEval = readScalar(t);
        uint256[] memory s = new uint256[]({len(vk.permutation_comms)});
        for (uint256 i = 0; i < {len(vk.permutation_comms)}; i++)
            s[i] = readScalar(t);
        uint256[] memory z = new uint256[](3 * NUM_Z);
        for (uint256 i = 0; i < NUM_Z; i++) {{
            z[3 * i] = readScalar(t);
            z[3 * i + 1] = readScalar(t);
            if (i < NUM_Z - 1) z[3 * i + 2] = readScalar(t);
        }}
        uint256[] memory lk = new uint256[](5 * NUM_LOOKUPS);
        for (uint256 i = 0; i < 5 * NUM_LOOKUPS; i++) lk[i] = readScalar(t);

        // Lagrange/instance machinery (template :399-471)
        uint256 xN = 1;
        {{
            uint256 base = x; uint256 expn = N;
            while (expn > 0) {{
                if (expn & 1 == 1) xN = mulmod(xN, base, R);
                base = mulmod(base, base, R); expn >>= 1;
            }}
        }}
        uint256 zh = addmod(xN, R - 1, R);
        uint256 instanceEval;
        uint256 l0; uint256 lLast; uint256 lBlind; uint256 zhInv;
        {{
            // rows 0..n_inst-1 use w^i (incremental); the last/blinding
            // rows n-bl..n-1 use w^{{-k}} = OMEGA_INV^k — no O(n) loops
            uint256 bl = uint256(-ROT_LAST);
            uint256 m = instances.length + bl + 1;
            uint256[] memory dens = new uint256[](m);
            uint256[] memory ws = new uint256[](m);
            uint256 wi = 1;
            for (uint256 i = 0; i < instances.length; i++) {{
                ws[i] = wi;
                dens[i] = addmod(x, R - wi, R);
                wi = mulmod(wi, OMEGA, R);
            }}
            wi = OMEGA_INV;
            for (uint256 i = 0; i < bl; i++) {{
                ws[instances.length + i] = wi;
                dens[instances.length + i] = addmod(x, R - wi, R);
                wi = mulmod(wi, OMEGA_INV, R);
            }}
            dens[m - 1] = zh;
            uint256[] memory dinv = batchInv(dens);
            zhInv = dinv[m - 1];
            l0 = lagW(zh, ws[0], dinv[0]);
            for (uint256 i = 0; i < instances.length; i++)
                instanceEval = addmod(instanceEval, mulmod(instances[i],
                    lagW(zh, ws[i], dinv[i]), R), R);
            // descending rows n-1 .. n-bl: the last one is L_last
            lLast = lagW(zh, ws[m - 2], dinv[m - 2]);
            for (uint256 i = 0; i < bl - 1; i++)
                lBlind = addmod(lBlind, lagW(zh,
                    ws[instances.length + i],
                    dinv[instances.length + i]), R);
        }}
        uint256 active = addmod(1, R - addmod(lLast, lBlind, R), R);

        // quotient numerator, y-Horner (evaluator.rs order)
        uint256 numer;
{numer_lines}
        uint256 quotientEval = mulmod(numer, zhInv, R);

        // fold quotient commitment by x^n (template :496-514)
        uint256 qcX = qc2[2 * (NUM_QUOTIENTS - 1)];
        uint256 qcY = qc2[2 * (NUM_QUOTIENTS - 1) + 1];
        for (uint256 i = NUM_QUOTIENTS - 1; i > 0; i--) {{
            (qcX, qcY) = ecMul(qcX, qcY, xN);
            (qcX, qcY) = ecAdd(qcX, qcY, qc2[2 * (i - 1)], qc2[2 * i - 1]);
        }}

        // BDFG21 (pcs/bdfg21.rs)
        uint256 zeta = squeeze(t);
        uint256 nu = squeezeCont(t);
        (uint256 wX, uint256 wY) = readPoint(t);
        uint256 mu = squeeze(t);
        (uint256 wpX, uint256 wpY) = readPoint(t);
        require(t.cptr == proof.length, "proof length");

        uint256 fX; uint256 fY; uint256 rTotal; uint256 nuPow = 1;
        uint256 tx_; uint256 ty_;
        uint256 z0Mu = 1;
{z0_lines}
{zs_prepass}
{chr(10).join(set_blocks)}

        // F - rTotal*G - z0Mu*W + mu*W'
        (tx_, ty_) = ecMul(1, 2, rTotal);
        (fX, fY) = ecAdd(fX, fY, tx_, ty_ == 0 ? 0 : Q - ty_);
        (tx_, ty_) = ecMul(wX, wY, z0Mu);
        (fX, fY) = ecAdd(fX, fY, tx_, ty_ == 0 ? 0 : Q - ty_);
        (tx_, ty_) = ecMul(wpX, wpY, mu);
        (fX, fY) = ecAdd(fX, fY, tx_, ty_);

        return pairing(fX, fY, wpX, wpY);
    }}

    function pairing(uint256 lx, uint256 ly, uint256 wx, uint256 wy)
        internal view returns (bool) {{
        // e(LHS, G2) * e(W', -s*G2) == 1 (template ec_pairing :204-224)
        uint256[12] memory input = [
            lx, ly, G2_X1, G2_X0, G2_Y1, G2_Y0,
            wx, wy, SG2_X1, SG2_X0, Q - SG2_Y1, Q - SG2_Y0
        ];
        (bool ok, bytes memory out) = address(0x08).staticcall(
            abi.encode(input));
        require(ok, "pairing");
        return abi.decode(out, (uint256)) == 1;
    }}
}}
'''
    return src


def generate_solidity_verifier(vk: plonk.VerifyingKey, path: str,
                               name: str = "Halo2Verifier") -> str:
    src = render_solidity_verifier(vk, name)
    with open(path, "w") as f:
        f.write(src)
    return src
