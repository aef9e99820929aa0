"""MAX_K=13 domain headroom: keygen + prove + verify at k=13.

The reference's verifier generator runs keygen at MAX_K=13 against the
full powers-of-tau (crates/halo2-verifier/src/generator.rs:20-24;
resources/ ships the k=13 ptau per .MISSING_LARGE_BLOBS) — until round 5
this repo had only exercised domains up to k=11, leaving the 2^13
evaluation/2^15 extended domain of SURVEY §1-L1 untested.

Runs against the committed synthetic-tau SRS cache
(artifacts/synthetic_srs_k13.bin — proof.srs.synthetic_srs, the dev-mode
``generate_setup_params`` analog); the host-golden engine proves a copy-
constrained mul-chain relation over the full 8192-row domain and the
verifier accepts it (and rejects a mutated public input).
"""

import random

from zkos_tpu.proof import plonk, srs as srs_mod


def _mul_chain_circuit(k: int, chain: int):
    n = 1 << k
    q = plonk.Fixed(0)
    a, b, c = plonk.Advice(0), plonk.Advice(1), plonk.Advice(2)
    cs = plonk.ConstraintSystem(k=k, num_fixed=1, num_advice=3)
    cs.gates.append(("mul", [q * (a * b - c)]))
    col_a, col_c = plonk.Column("advice", 0), plonk.Column("advice", 2)
    col_i = plonk.Column("instance", 0)
    cs.permutation_columns = [col_a, col_c, col_i]
    for r in range(chain - 1):
        cs.copies.append((col_c, r, col_a, r + 1))
    cs.copies.append((col_c, chain - 1, col_i, 0))
    qv = [1 if r < chain else 0 for r in range(n)]
    av, bv, cv = [0] * n, [0] * n, [0] * n
    cur = 3
    rngv = random.Random(5)
    for r in range(chain):
        av[r] = cur
        bv[r] = rngv.randrange(1, plonk.P)
        cv[r] = cur * bv[r] % plonk.P
        cur = cv[r]
    return cs, [qv], [av, bv, cv], [cur]


def test_prove_verify_at_max_k13():
    srs = srs_mod.synthetic_srs(k=13)
    assert len(srs.g1) == 1 << 13
    cs, fixed, advice, pub = _mul_chain_circuit(13, chain=16)
    pk, vk = plonk.keygen(cs, srs, fixed, engine="host")
    assert vk.domain.n == 1 << 13
    proof = plonk.prove(pk, advice, pub, rng=random.Random(7), engine="host")
    assert plonk.verify(vk, proof, pub)
    assert not plonk.verify(vk, proof, [(pub[0] + 1) % plonk.P])
