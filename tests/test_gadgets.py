"""Circuit gadgets: Poseidon2 hash in-circuit vs golden; bits; grumpkin."""

import random

import pytest

from zkos_tpu.models import gadgets as gd
from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.proof import plonk, srs as srs_mod

P = G.FR_MODULUS


@pytest.fixture(scope="module")
def srs7():
    return srs_mod.synthetic_srs(k=7)


def _prove_verify(k, srs, build_fn, instances):
    b = gd.Builder(k=k)
    build_fn(b)
    cs = gd.build_constraint_system(k)
    cs.permutation_columns = (
        [plonk.Column("advice", i) for i in range(gd.NUM_ADVICE)]
        + [plonk.Column("instance", 0)])
    cs.copies = b.copies
    pk, vk = plonk.keygen(cs, srs, b.fixed)
    proof = plonk.prove(pk, b.advice, instances, rng=random.Random(3))
    assert plonk.verify(vk, proof, instances)
    return vk, proof


def test_poseidon_hash_gadget(srs7):
    random.seed(1)
    inputs = [random.randrange(P) for _ in range(5)]
    expected = hash_ints(inputs)

    def build(b):
        cells = [gd.witness_cell(b, v) for v in inputs]
        digest = gd.poseidon_hash(b, cells)
        assert b.advice[digest[0]][digest[1]] == expected, "witness mismatch"
        b.expose(*digest)

    vk, proof = _prove_verify(7, srs7, build, [expected])
    assert not plonk.verify(vk, proof, [(expected + 1) % P])


def test_bit_decompose_gadget(srs7):
    val = 0xDEADBEEFCAFE

    def build(b):
        cell = gd.witness_cell(b, val)
        bits = gd.bit_decompose(b, cell, 48)
        got = sum(b.advice[c][r] << i for i, (c, r) in enumerate(bits))
        assert got == val
        b.expose(*cell)

    _prove_verify(7, srs7, build, [val])


def test_grumpkin_mul_gadget(srs7):
    k_scalar = 0xA5A5A5
    expected = GR.scalar_mul(k_scalar, GR.GEN)

    def build(b):
        cell = gd.witness_cell(b, k_scalar)
        bits = gd.bit_decompose(b, cell, 24)
        base = gd.gr_witness_point(b, GR.GEN, pinned=True)
        res_cells, res_pt = gd.grumpkin_scalar_mul(b, bits[::-1], base)
        assert res_pt == expected
        b.expose(*res_cells[0])
        b.expose(*res_cells[1])

    _prove_verify(7, srs7, build, [expected[0], expected[1]])
