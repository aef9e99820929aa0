"""Device-engine components vs host-golden, DEFAULT-RUN.

The full six-phase-graph byte-exactness tests (test_engine_device.py)
cost ~10 min of tracing+compile on the 2-vCPU CPU backend, so they stay
behind ZKOS_SLOW_TESTS; these tests cover the same device code paths
component by component with small, fast-compiling jits, so every
default run byte-checks the engine's arithmetic against the python-int
host engine: batched commits, basis conversions, extended-coset
transforms, evaluation/division kernels, and the batch-inverse /
prefix-product primitives the phase graphs are made of.
"""

import random

import numpy as np
import pytest

from zkos_tpu.ops import field_golden as G
from zkos_tpu.proof import domain as dom
from zkos_tpu.proof import engine as eng
from zkos_tpu.proof import plonk, srs as srs_mod

P = plonk.P
K = 4
N = 1 << K


@pytest.fixture(scope="module")
def srs():
    return srs_mod.synthetic_srs(k=K)


@pytest.fixture(scope="module")
def rng():
    return random.Random(11)


def test_commit_table_matches_host_commit(srs, rng):
    """Device batched MSM commit == host python-int Pippenger, including
    a zero polynomial riding in the batch (identity window sums)."""
    polys = [[rng.randrange(P) for _ in range(N)] for _ in range(3)]
    polys.append([0] * N)
    table = eng.srs_affine_table(srs, N)
    coeff = eng.F.to_mont(eng.FR, eng.ints_to_device(polys))
    wsums = eng.commit_table(table, coeff)
    got = [eng.M.fold_windows_host(np.asarray(wsums[i]), eng.msm_c(N))
           for i in range(len(polys))]
    want = [plonk._commit(srs, p) for p in polys]
    assert got == want


def test_lagrange_to_coeff_many_matches_domain(rng):
    d = dom.Domain(K, quotient_degree=2)
    cols = [[rng.randrange(P) for _ in range(N)] for _ in range(4)]
    got = eng.lagrange_to_coeff_many([list(c) for c in cols], N)
    want = [d.lagrange_to_coeff(list(c)) for c in cols]
    assert got == want


def test_device_extended_coset_matches_domain(rng):
    """_to_ext (coset scale + padded NTT) == domain.coeff_to_extended_coset,
    through a real DeviceProverKey's tables."""
    srs = srs_mod.synthetic_srs(k=K)
    q, a = plonk.Fixed(0), plonk.Advice(0)
    cs = plonk.ConstraintSystem(k=K, num_fixed=1, num_advice=1)
    cs.gates.append(("g", [q * a]))
    pk, _ = plonk.keygen(cs, srs, [[1] * N], engine="host")
    dpk = eng.device_prover_key(pk)
    coeffs = [rng.randrange(P) for _ in range(N)]
    dev = dpk.jitted("ext1", lambda c: dpk._to_ext(c))(
        eng.F.to_mont(eng.FR, eng.ints_to_device([coeffs])))
    got = eng.device_to_ints(eng.F.from_mont(eng.FR, dev[:, :, 0]))
    assert got == pk.vk.domain.coeff_to_extended_coset(list(coeffs))
    # and back: _from_ext inverts it
    back = dpk.jitted("unext1", lambda e: dpk._from_ext(e))(dev)
    got_back = eng.device_to_ints(eng.F.from_mont(eng.FR, back[:, :, 0]))
    want_back = list(coeffs) + [0] * (dpk.ext_n - N)
    assert got_back == want_back


def test_eval_and_divide_linear_match_host(rng):
    coeffs = [rng.randrange(P) for _ in range(N)]
    z = rng.randrange(1, P)
    zm = eng._mont_scalar(z)
    cm = eng.F.to_mont(eng.FR, eng.ints_to_device([coeffs]))[:, :, 0]
    got_eval = G.from_limbs(np.asarray(
        eng.F.from_mont(eng.FR, eng.eval_at_dev(cm, zm))))
    assert got_eval == dom.poly_eval(coeffs, z)
    # synthetic division: (f(X) - f(z)) / (X - z) has remainder zero
    qdev = eng.divide_linear_dev(cm, zm,
                                 eng._mont_scalar(pow(z, P - 2, P)))
    q_ints = eng.device_to_ints(eng.F.from_mont(eng.FR, qdev))
    # check q * (X - z) + f(z) == f  (python ints)
    recon = [0] * N
    for i, qc in enumerate(q_ints):       # q has degree N-2; index < N-1
        recon[i + 1] = (recon[i + 1] + qc) % P
        recon[i] = (recon[i] - qc * z) % P
    recon[0] = (recon[0] + got_eval) % P
    assert recon == [c % P for c in coeffs]


def test_batch_inverse_and_prefix_product(rng):
    vals = [rng.randrange(1, P) for _ in range(32)]
    vm = eng.F.to_mont(eng.FR, eng.ints_to_device([vals]))[:, :, 0]
    # reshape to the (18, n) layout the helpers expect
    inv = eng.device_to_ints(eng.F.from_mont(eng.FR,
                                             eng.batch_inverse(vm)))
    assert inv == [pow(v, P - 2, P) for v in vals]
    pp = eng.device_to_ints(eng.F.from_mont(eng.FR,
                                            eng.prefix_product(vm)))
    want, acc = [], 1
    for v in vals:
        acc = acc * v % P
        want.append(acc)
    assert pp == want
