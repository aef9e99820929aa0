"""Device-engine prover: byte-exactness against the host-golden engine.

The device engine (zkos_tpu/proof/engine.py) is the production default;
these tests prove it emits byte-identical proofs to the python-int host
engine for the same blinding stream — keygen commitments included — and
that lookups flow through both engines identically.

Gated behind ZKOS_SLOW_TESTS=1: the six jitted phase graphs take many
minutes to compile on the 2-vCPU XLA:CPU test backend (they are cached in
.jax_cache afterwards).  The TPU bench drives the device engine end-to-end
on real hardware every round.
"""

import os
import random

import pytest

from zkos_tpu.proof import plonk, srs as srs_mod

slow = pytest.mark.skipif(
    os.environ.get("ZKOS_SLOW_TESTS") != "1",
    reason="device-engine compile is minutes on the CPU backend; "
           "set ZKOS_SLOW_TESTS=1 (the default suite still runs "
           "test_device_engine_minimal_default_suite)")

P = plonk.P
K = 5
N = 1 << K
CHAIN = 8


@pytest.fixture(scope="module")
def srs():
    return srs_mod.synthetic_srs(k=K)


def _mul_chain_cs():
    q = plonk.Fixed(0)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    c = plonk.Advice(2)
    cs = plonk.ConstraintSystem(k=K, num_fixed=1, num_advice=3)
    cs.gates.append(("mul", [q * (a * b - c)]))
    col_a = plonk.Column("advice", 0)
    col_c = plonk.Column("advice", 2)
    col_i = plonk.Column("instance", 0)
    cs.permutation_columns = [col_a, col_c, col_i]
    for r in range(CHAIN - 1):
        cs.copies.append((col_c, r, col_a, r + 1))
    cs.copies.append((col_c, CHAIN - 1, col_i, 0))
    return cs


def _assign(x0, bs):
    a = [0] * N
    b = [0] * N
    c = [0] * N
    q = [0] * N
    cur = x0
    for r in range(CHAIN):
        q[r] = 1
        a[r] = cur
        b[r] = bs[r]
        c[r] = cur * bs[r] % P
        cur = c[r]
    return q, [a, b, c], cur


@slow
def test_device_engine_byte_identical(srs):
    cs = _mul_chain_cs()
    rng = random.Random(5)
    bs = [rng.randrange(1, P) for _ in range(CHAIN)]
    qv, advice, result = _assign(3, bs)
    pk_h, vk_h = plonk.keygen(cs, srs, [qv], engine="host")
    pk_d, vk_d = plonk.keygen(cs, srs, [qv], engine="device")
    assert vk_h.fixed_comms == vk_d.fixed_comms
    assert vk_h.permutation_comms == vk_d.permutation_comms
    assert vk_h.vk_digest == vk_d.vk_digest

    proof_h = plonk.prove(pk_h, advice, [result], rng=random.Random(7),
                          engine="host")
    proof_d = plonk.prove(pk_h, advice, [result], rng=random.Random(7),
                          engine="device")
    assert proof_h == proof_d, "engines diverge"
    assert plonk.verify(vk_h, proof_d, [result])


@slow
def test_device_engine_lookup_byte_identical(srs):
    q = plonk.Fixed(0)
    t = plonk.Fixed(1)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    cs = plonk.ConstraintSystem(k=K, num_fixed=2, num_advice=2)
    cs.gates.append(("copy_b", [q * (b - a)]))
    cs.lookups.append(("range16", [q * a], [t]))
    cs.permutation_columns = [plonk.Column("advice", 0),
                              plonk.Column("instance", 0)]
    cs.copies.append((plonk.Column("advice", 0), 0,
                      plonk.Column("instance", 0), 0))
    qv = [0] * N
    tv = [0] * N
    av = [0] * N
    bv = [0] * N
    for i in range(16):
        tv[i] = i
    values = [1, 5, 15, 0, 7, 7, 7]
    for r, v in enumerate(values):
        qv[r] = 1
        av[r] = v
        bv[r] = v
    pk, vk = plonk.keygen(cs, srs, [qv, tv], engine="host")
    proof_h = plonk.prove(pk, [av, bv], [1], rng=random.Random(9),
                          engine="host")
    proof_d = plonk.prove(pk, [av, bv], [1], rng=random.Random(9),
                          engine="device")
    assert proof_h == proof_d, "lookup engines diverge"
    assert plonk.verify(vk, proof_d, [1])


# --------------------------------------------------------------------------
# UN-GATED minimal device-engine proof (VERDICT r3 #7): runs in the default
# suite so the device path can never go a whole round unexercised when the
# TPU bench dies.  k=4, 2-step chain, no lookups — the smallest circuit
# that drives all six phase graphs.  Cold compile on the 2-vCPU XLA:CPU
# backend is minutes ONCE; the persistent .jax_cache makes every later
# run seconds.
# --------------------------------------------------------------------------

def test_device_engine_minimal_default_suite():
    import random as _random

    k4 = 4
    n4 = 1 << k4
    srs4 = srs_mod.synthetic_srs(k=k4)
    q = plonk.Fixed(0)
    a = plonk.Advice(0)
    b = plonk.Advice(1)
    c = plonk.Advice(2)
    cs = plonk.ConstraintSystem(k=k4, num_fixed=1, num_advice=3)
    cs.gates.append(("mul", [q * (a * b - c)]))
    col_a = plonk.Column("advice", 0)
    col_c = plonk.Column("advice", 2)
    col_i = plonk.Column("instance", 0)
    cs.permutation_columns = [col_a, col_c, col_i]
    chain = 2
    for r in range(chain - 1):
        cs.copies.append((col_c, r, col_a, r + 1))
    cs.copies.append((col_c, chain - 1, col_i, 0))
    av = [0] * n4
    bv = [0] * n4
    cv = [0] * n4
    qv = [0] * n4
    cur = 3
    rng = random.Random(5)
    for r in range(chain):
        qv[r] = 1
        av[r] = cur
        bv[r] = rng.randrange(1, P)
        cv[r] = cur * bv[r] % P
        cur = cv[r]
    pk, vk = plonk.keygen(cs, srs4, [qv], engine="host")
    proof_h = plonk.prove(pk, [av, bv, cv], [cur], rng=random.Random(7),
                          engine="host")
    proof_d = plonk.prove(pk, [av, bv, cv], [cur], rng=random.Random(7),
                          engine="device")
    assert proof_h == proof_d, "device engine diverges from host"
    assert plonk.verify(vk, proof_d, [cur])
