"""Sharded kernels on the virtual 8-device CPU mesh vs golden oracles."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkos_tpu.ops import curve as C
from zkos_tpu.ops import curve_golden as cg
from zkos_tpu.ops import field as F
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import msm as M
from zkos_tpu.ops import ntt as NTT
from zkos_tpu.ops import poseidon2 as P2
from zkos_tpu.parallel import mesh as mesh_mod
from zkos_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh():
    return mesh_mod.data_mesh(8)


def test_sharded_hash_matches_golden(mesh):
    random.seed(1)
    vals = [[random.randrange(G.FR_MODULUS) for _ in range(7)] for _ in range(16)]
    arr = np.stack(
        [np.stack([F.to_limbs(vals[b][i]) for b in range(16)], axis=-1)
         for i in range(7)], axis=1)
    out = sharded.sharded_hash_n(mesh, jnp.asarray(arr, dtype=jnp.uint32))
    got = [F.from_limbs(np.asarray(out)[:, b]) for b in range(16)]
    assert got == [P2.hash_ints(v) for v in vals]


def test_sharded_msm_matches_golden(mesh):
    random.seed(2)
    n = 64
    sc = [random.randrange(G.FR_MODULUS) for _ in range(n)]
    pts = [cg.scalar_mul(random.randrange(1, 1 << 40), cg.GEN) for _ in range(n)]
    out = sharded.sharded_msm(
        mesh, jnp.asarray(C.point_from_affine_ints(pts)),
        jnp.asarray(F.to_limbs(sc)), c=6)
    assert C.point_to_affine_ints(out) == cg.msm(sc, pts)


@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_ntt_matches_plain(mesh, inverse):
    random.seed(3)
    n1 = n2 = 16
    n = n1 * n2
    vals = [random.randrange(G.FR_MODULUS) for _ in range(n)]
    a = jnp.asarray(F.to_limbs(vals), dtype=jnp.uint32)
    am = F.to_mont(F.FR, a)

    mat = sharded.coeffs_to_matrix(am, n1, n2)
    d = sharded.sharded_ntt_4step(mesh, mat, inverse=inverse)
    got_m = sharded.matrix_to_naturals(d)
    got = F.from_limbs(np.asarray(F.from_mont(F.FR, got_m)))

    exp_m = NTT.ntt_mont(F.FR, am, inverse=inverse)
    exp = F.from_limbs(np.asarray(F.from_mont(F.FR, exp_m)))
    assert got == exp


def test_sharded_msm_v2_window_sums(rng):
    """Sorted prefix-scan MSM sharded over the mesh: per-window partials
    all_gathered + folded equal the golden full MSM."""
    from zkos_tpu.ops import field_golden as G

    mesh = mesh_mod.data_mesh(8)
    pts = cg.random_points(rng, 16)
    sc = [int.from_bytes(rng.bytes(32), "little") % G.FR_MODULUS
          for _ in range(16)]
    parr = jnp.asarray(M.points_to_affine_limbs(pts))
    sarr = jnp.asarray(F.to_limbs(sc), dtype=jnp.uint32)
    ws = sharded.sharded_msm_window_sums(mesh, parr, sarr, c=8, steps=2)
    got = M.fold_windows_host(np.asarray(ws), 8)
    assert got == cg.msm(sc, pts)


def _eq_circuit():
    from zkos_tpu.proof import plonk, srs as srs_mod

    k = 5
    n = 1 << k
    srs = srs_mod.synthetic_srs(k=k)
    q = plonk.Fixed(0)
    a, b = plonk.Advice(0), plonk.Advice(1)
    cs = plonk.ConstraintSystem(k=k, num_fixed=1, num_advice=2)
    cs.gates.append(("eq", [q * (b - a)]))
    cs.permutation_columns = [plonk.Column("advice", 0),
                              plonk.Column("instance", 0)]
    cs.copies.append((plonk.Column("advice", 0), 0,
                      plonk.Column("instance", 0), 0))
    qv = [1 if r < 4 else 0 for r in range(n)]
    av = [7 if 0 < r < 4 else 0 for r in range(n)]
    pk, vk = plonk.keygen(cs, srs, [qv], engine="host")
    return pk, vk, av


def test_sharded_device_engine_byte_identical(mesh):
    """A full PLONK proof through the MESHED DEVICE ENGINE — the six
    fused phase graphs GSPMD-partitioned over the mesh, grand products /
    quotient / opens / evals all on device — is byte-identical to the
    host engine and verifies (BASELINE config 5)."""
    import random

    from zkos_tpu.parallel import prover as shp
    from zkos_tpu.proof import plonk

    pk, vk, av = _eq_circuit()
    proof = shp.prove_sharded(pk, [list(av), list(av)], [0], mesh,
                              rng=random.Random(2))
    host = plonk.prove(pk, [list(av), list(av)], [0],
                       rng=random.Random(2), engine="host")
    assert proof == host
    assert plonk.verify(vk, proof, [0])


def test_sharded_hooks_prover_byte_identical(mesh):
    """The host-driven hook path (points-sharded commits + meshed
    quotient via plonk.prove(commit_fn/phase3_fn)) stays byte-identical
    and verifies."""
    import random

    from zkos_tpu.parallel import prover as shp
    from zkos_tpu.proof import plonk

    pk, vk, av = _eq_circuit()
    proof = shp.prove_sharded_hooks(pk, [list(av), list(av)], [0], mesh,
                                    rng=random.Random(2))
    host = plonk.prove(pk, [list(av), list(av)], [0],
                       rng=random.Random(2), engine="host")
    assert proof == host
    assert plonk.verify(vk, proof, [0])


def test_sharded_coset_extension_matches_domain(mesh):
    import random

    from zkos_tpu.parallel import prover as shp
    from zkos_tpu.proof import plonk, srs as srs_mod

    k = 5
    srs = srs_mod.synthetic_srs(k=k)
    cs = plonk.ConstraintSystem(k=k, num_fixed=1, num_advice=1)
    q, a = plonk.Fixed(0), plonk.Advice(0)
    cs.gates.append(("z", [q * a]))
    pk, _ = plonk.keygen(cs, srs, [[0] * (1 << k)], engine="host")
    sp = shp.ShardedProver(pk, mesh)
    rng = random.Random(4)
    coeffs = [rng.randrange(plonk.P) for _ in range(1 << k)]
    assert sp.coset_extended_eval(coeffs) == \
        pk.vk.domain.coeff_to_extended_coset(list(coeffs))
