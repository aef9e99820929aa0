"""Verifier code generation — the crates/halo2-verifier analog.

Renders a **standalone verifier module** for a compiled circuit: all
verifying-key constants embedded as literals and the gate/permutation
quotient evaluation *specialized into generated code* (the role
codegen/evaluator.rs plays for Yul).  The artifact implements the full
verification algorithm — transcript replay, Lagrange/instance evaluation,
quotient reconstruction, commitment folding, BDFG21 pairing inputs — and
links only against the "precompile" layer (keccak256 and the BN254
curve/pairing ops), exactly as the generated Solidity verifier links
against EVM precompiles.

``encode_calldata`` mirrors verifier_contract::encode_calldata
(src/lib/verifier_contract.rs:14-20): 4-byte selector ++ ABI-ish payload.
"""

from __future__ import annotations

from ..ops.keccak import keccak256
from . import plonk


def _render_expr(e) -> str:
    """Expr -> python source over the generated verifier's eval tables."""
    if isinstance(e, plonk.Constant):
        return str(e.value)
    if isinstance(e, plonk.Fixed):
        return f"F[({e.index},{e.rot})]"
    if isinstance(e, plonk.Advice):
        return f"A[({e.index},{e.rot})]"
    if isinstance(e, plonk.Instance):
        return "IE"
    if isinstance(e, plonk.Sum):
        return f"({_render_expr(e.a)}+{_render_expr(e.b)})"
    if isinstance(e, plonk.Prod):
        return f"({_render_expr(e.a)}*{_render_expr(e.b)})"
    if isinstance(e, plonk.Scaled):
        return f"({_render_expr(e.e)}*{e.k})"
    raise TypeError(e)


def render_verifier(vk: plonk.VerifyingKey, name: str = "Verifier") -> str:
    """Generate the standalone verifier source for this verifying key."""
    cs = vk.cs
    d = vk.domain
    nz = cs.num_permutation_zs()
    chunk_len = cs.permutation_chunk_len()
    chunks = [cs.permutation_columns[i : i + chunk_len]
              for i in range(0, len(cs.permutation_columns), chunk_len)]
    rot_last = cs.rotation_last()

    gate_lines = []
    for _name, exprs in cs.gates:
        for e in exprs:
            gate_lines.append(f"        {_render_expr(e)} % P,")

    # permutation rows, specialized (evaluator.rs permutation_computations)
    perm_lines = []
    if nz:
        perm_lines.append("        l_0 * (1 - Z[0][0]) % P,")
        perm_lines.append(f"        l_last * (Z[{nz-1}][0]*Z[{nz-1}][0]"
                          f" - Z[{nz-1}][0]) % P,")
        for j in range(1, nz):
            perm_lines.append(f"        l_0 * (Z[{j}][0] - Z[{j-1}][2]) % P,")
        col_offset = 0
        for ci, chunk in enumerate(chunks):
            lhs = f"Z[{ci}][1]"
            rhs = f"Z[{ci}][0]"
            for j, col in enumerate(chunk):
                if col.kind == "fixed":
                    v = f"F[({col.index},0)]"
                elif col.kind == "advice":
                    v = f"A[({col.index},0)]"
                else:
                    v = "IE"
                gi = col_offset + j
                lhs = f"{lhs} * (({v} + beta*S[{gi}] + gamma) % P)"
                rhs = (f"{rhs} * (({v} + beta*{pow(plonk.dom.DELTA, gi, plonk.P)}"
                       f"*x + gamma) % P)")
            perm_lines.append(
                f"        (({lhs}) - ({rhs})) * (1 - (l_last + l_blind)) % P,")
            col_offset += len(chunk)

    # lookup rows, specialized (evaluator.rs lookup_computations)
    lk_lines = []
    for li, (_lname, ins, tabs) in enumerate(cs.lookups):
        def _compress(exprs):
            acc = _render_expr(exprs[0])
            for e in exprs[1:]:
                acc = f"(({acc})*theta + {_render_expr(e)})"
            return acc

        a_c = _compress(ins)
        s_c = _compress(tabs)
        z, zn, pin, pprev, ptab = (f"LK[{li}][0]", f"LK[{li}][1]",
                                   f"LK[{li}][2]", f"LK[{li}][3]",
                                   f"LK[{li}][4]")
        lk_lines.append(f"        l_0 * (1 - {z}) % P,")
        lk_lines.append(f"        l_last * ({z}*{z} - {z}) % P,")
        lk_lines.append(
            f"        ({zn}*(({pin}+beta)%P)%P*(({ptab}+gamma)%P)"
            f" - {z}*((({a_c})+beta)%P)%P*((({s_c})+gamma)%P))"
            f" * (1 - (l_last + l_blind)) % P,")
        lk_lines.append(f"        l_0 * ({pin} - {ptab}) % P,")
        lk_lines.append(
            f"        (({pin} - {ptab}) * ({pin} - {pprev}) % P)"
            f" * (1 - (l_last + l_blind)) % P,")

    fixed_evals_needed = cs.fixed_queries()
    advice_queries = cs.advice_queries()

    src = f'''"""GENERATED VERIFIER — do not edit.

Standalone verifier with embedded verifying key, produced by
zkos_tpu.proof.codegen.render_verifier (the crates/halo2-verifier analog).
Links only against the precompile layer (keccak / BN254 curve + pairing).
"""

from zkos_tpu.ops.curve_golden import add as _ec_add, neg as _ec_neg, \\
    scalar_mul as _ec_mul, GEN as _G1
from zkos_tpu.ops.pairing_golden import g2_neg as _g2_neg, \\
    pairing_check as _pairing_check
from zkos_tpu.proof.transcript import TranscriptRead

P = {plonk.P}
K = {cs.k}
N = {1 << cs.k}
OMEGA = {d.omega}
OMEGA_INV = {d.omega_inv}
VK_DIGEST = {vk.vk_digest}
NUM_ADVICE = {cs.num_advice}
NUM_Z = {nz}
NUM_LOOKUPS = {len(cs.lookups)}
NUM_QUOTIENTS = {cs.num_quotients()}
ROT_LAST = {rot_last}
ADVICE_QUERIES = {advice_queries!r}
FIXED_QUERIES = {fixed_evals_needed!r}
FIXED_COMMS = {vk.fixed_comms!r}
PERMUTATION_COMMS = {vk.permutation_comms!r}
G2 = {vk.g2!r}
S_G2 = {vk.s_g2!r}
def _rot_point(x, rot):
    w = OMEGA if rot >= 0 else OMEGA_INV
    return x * pow(w, abs(rot), P) % P


def _quotient_rows(A, F, IE, Z, S, LK, x, theta, beta, gamma,
                   l_0, l_last, l_blind):
    """Specialized gate+permutation+lookup numerator rows (y-Horner)."""
    return [
{chr(10).join(gate_lines)}
{chr(10).join(perm_lines)}
{chr(10).join(lk_lines)}
    ]


def verify(proof: bytes, instances: list) -> bool:
    try:
        return _verify(proof, instances)
    except (AssertionError, KeyError, IndexError):
        return False


def _verify(proof: bytes, instances: list) -> bool:
    tr = TranscriptRead(proof, vk_digest=VK_DIGEST)
    for v in instances:
        assert 0 <= v < P
        tr.common_scalar(v)
    advice_comms = [tr.read_point() for _ in range(NUM_ADVICE)]
    theta = tr.squeeze_challenge()
    lk_perm_comms = [(tr.read_point(), tr.read_point())
                     for _ in range(NUM_LOOKUPS)]
    beta = (tr.squeeze_challenge() if NUM_LOOKUPS
            else tr.squeeze_challenge_cont())
    gamma = tr.squeeze_challenge_cont()
    z_comms = [tr.read_point() for _ in range(NUM_Z)]
    lk_z_comms = [tr.read_point() for _ in range(NUM_LOOKUPS)]
    random_comm = tr.read_point()
    y = tr.squeeze_challenge()
    q_comms = [tr.read_point() for _ in range(NUM_QUOTIENTS)]
    x = tr.squeeze_challenge()

    A = {{q: tr.read_scalar() for q in ADVICE_QUERIES}}
    F = {{q: tr.read_scalar() for q in FIXED_QUERIES}}
    random_eval = tr.read_scalar()
    S = [tr.read_scalar() for _ in PERMUTATION_COMMS]
    Z = []
    for i in range(NUM_Z):
        e0 = tr.read_scalar(); e1 = tr.read_scalar()
        e2 = tr.read_scalar() if i < NUM_Z - 1 else None
        Z.append((e0, e1, e2))
    LK = [tuple(tr.read_scalar() for _ in range(5))
          for _ in range(NUM_LOOKUPS)]

    x_n = pow(x, N, P)
    zh = (x_n - 1) % P
    u = N + ROT_LAST
    n_inv = pow(N, P - 2, P)

    def lag(i):
        wi = pow(OMEGA, i % N, P)
        return zh * wi % P * n_inv % P * pow((x - wi) % P, P - 2, P) % P

    l_0 = lag(0)
    l_last = lag(u)
    l_blind = sum(lag(i) for i in range(u + 1, N)) % P
    IE = sum(v * lag(i) for i, v in enumerate(instances)) % P

    numer = 0
    for row in _quotient_rows(A, F, IE, Z, S, LK, x, theta, beta, gamma,
                              l_0, l_last, l_blind):
        numer = (numer * y + row) % P
    quotient_eval = numer * pow(zh, P - 2, P) % P

    qc = q_comms[-1]
    for comm in reversed(q_comms[:-1]):
        qc = _ec_add(_ec_mul(x_n, qc), comm)

    zeta = tr.squeeze_challenge()
    nu = tr.squeeze_challenge_cont()
    w = tr.read_point()
    mu = tr.squeeze_challenge()
    w_prime = tr.read_point()
    assert tr.done()

    # BDFG21 (rotation sets + pairing; bdfg21.rs semantics)
    vq = []
    for idx, rot in ADVICE_QUERIES:
        vq.append((("advice", idx), rot, advice_comms[idx], A[(idx, rot)]))
    for i in range(NUM_Z):
        vq.append((("perm_z", i), 0, z_comms[i], Z[i][0]))
        vq.append((("perm_z", i), 1, z_comms[i], Z[i][1]))
    for i in range(NUM_Z - 2, -1, -1):
        vq.append((("perm_z", i), ROT_LAST, z_comms[i], Z[i][2]))
    for i in range(NUM_LOOKUPS):
        vq.append((("lookup_z", i), 0, lk_z_comms[i], LK[i][0]))
        vq.append((("lookup_pin", i), 0, lk_perm_comms[i][0], LK[i][2]))
        vq.append((("lookup_ptab", i), 0, lk_perm_comms[i][1], LK[i][4]))
        vq.append((("lookup_pin", i), -1, lk_perm_comms[i][0], LK[i][3]))
        vq.append((("lookup_z", i), 1, lk_z_comms[i], LK[i][1]))
    for idx, rot in FIXED_QUERIES:
        vq.append((("fixed", idx), rot, FIXED_COMMS[idx], F[(idx, rot)]))
    for i, comm in enumerate(PERMUTATION_COMMS):
        vq.append((("sigma", i), 0, comm, S[i]))
    vq.append((("quotient", 0), 0, qc, quotient_eval))
    vq.append((("random", 0), 0, random_comm, random_eval))

    comm_queries = []
    for key, rot, comm, ev in vq:
        for entry in comm_queries:
            if entry[0] == key:
                entry[2][rot] = ev
                break
        else:
            comm_queries.append((key, comm, {{rot: ev}}))
    sets = []
    for key, comm, rotmap in comm_queries:
        rots = sorted(rotmap)
        evals = [rotmap[r] for r in rots]
        for s in sets:
            if s[0] == rots:
                s[1].append(comm); s[2].append(evals)
                break
        else:
            sets.append((rots, [comm], [evals]))

    def interp_at_mu(pts, vals):
        acc = 0
        for i, (xi, yi) in enumerate(zip(pts, vals)):
            num, den = 1, 1
            for j2, xj in enumerate(pts):
                if i == j2:
                    continue
                num = num * ((mu - xj) % P) % P
                den = den * ((xi - xj) % P) % P
            acc = (acc + yi * num % P * pow(den, P - 2, P)) % P
        return acc

    z0_mu = 1
    for rot in sets[0][0]:
        z0_mu = z0_mu * ((mu - _rot_point(x, rot)) % P) % P

    f_comm = None
    r_total = 0
    nu_pow = 1
    for rots, comms, evalss in sets:
        pts = [_rot_point(x, rot) for rot in rots]
        zs_mu = 1
        for pt in pts:
            zs_mu = zs_mu * ((mu - pt) % P) % P
        d_s = z0_mu * pow(zs_mu, P - 2, P) % P
        comb = None
        zpow = 1
        comb_evals = [0] * len(pts)
        for comm, evs in zip(comms, evalss):
            comb = _ec_add(comb, _ec_mul(zpow, comm))
            for i2, ev in enumerate(evs):
                comb_evals[i2] = (comb_evals[i2] + zpow * ev) % P
            zpow = zpow * zeta % P
        scale = nu_pow * d_s % P
        f_comm = _ec_add(f_comm, _ec_mul(scale, comb))
        r_total = (r_total + scale * interp_at_mu(pts, comb_evals)) % P
        nu_pow = nu_pow * nu % P

    lhs = _ec_add(f_comm, _ec_neg(_ec_mul(r_total, _G1)))
    lhs = _ec_add(lhs, _ec_neg(_ec_mul(z0_mu, w)))
    lhs = _ec_add(lhs, _ec_mul(mu, w_prime))
    return _pairing_check([(lhs, G2), (w_prime, _g2_neg(S_G2))])
'''
    return src


def generate_verifier(vk: plonk.VerifyingKey, path: str) -> str:
    """Render + write the verifier artifact; returns the source."""
    src = render_verifier(vk)
    with open(path, "w") as f:
        f.write(src)
    return src


def encode_calldata(proof: bytes, instances: list[int],
                    selector: bytes = b"\x1e\x8e\x1e\x13") -> bytes:
    """selector ++ len(instances) ++ instances (BE words) ++ proof
    (verifier_contract.rs:14-20 shape)."""
    out = bytearray(selector)
    out += len(instances).to_bytes(32, "big")
    for v in instances:
        out += int(v).to_bytes(32, "big")
    out += proof
    return bytes(out)


def decode_calldata(data: bytes) -> tuple[bytes, list[int]]:
    n = int.from_bytes(data[4:36], "big")
    instances = [int.from_bytes(data[36 + 32 * i : 68 + 32 * i], "big")
                 for i in range(n)]
    return data[36 + 32 * n :], instances


def vk_digest_check(vk: plonk.VerifyingKey) -> int:
    """Artifact identity: keccak over the rendered source."""
    return int.from_bytes(keccak256(render_verifier(vk).encode()), "big")
