"""EvmRunner harness + static gas model (the evm-utils analog).

The reference deploys contracts to an in-process EVM and measures gas
(`crates/evm-utils/src/evm_runner.rs:43-149`); here the runner hosts the
Python contract objects behind addresses with the same deploy/call/dry_run
surface, and `proof.gas.estimate` derives verification gas statically from
the verifying key (regression constants: generator.rs:79-81).
"""

from zkos_tpu.ops.grumpkin_golden import GEN as GRUMPKIN_GEN
import pytest

from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.proof import gas, plonk, srs as srs_mod
from zkos_tpu.protocol import contract
from zkos_tpu.srv import evm_runner as ev

VERSION = contract.CONTRACT_VERSION
OK = lambda proof, pub: proof == b"ok"
CALLER = 0xAA


@pytest.fixture()
def runner_and_addr():
    r = ev.EvmRunner.aleph_evm()
    sim = contract.ShielderSim(
        verify_new_account=OK, verify_deposit=OK, verify_withdraw=OK,
        ar_pubkey=GRUMPKIN_GEN, tree_height=3)
    addr = r.create(sim)
    return r, addr


def _na_kwargs(note=111):
    return dict(expected_version=VERSION, caller=CALLER, amount=10_000,
                new_note=note, prenullifier=hash_ints([note]), sym_c1=(1, 1),
                sym_c2=(2, 2), mac_salt=1, mac_commitment=2, proof=b"ok")


def test_arbsys_precompile_serves_block_number(runner_and_addr):
    r, _ = runner_and_addr
    assert r.call(ev.ARBSYS_ADDRESS, "arbBlockNumber").output == 1
    # calls advance the chain (evm_runner.rs:106-127)
    assert r.call(ev.ARBSYS_ADDRESS, "arbBlockNumber").output == 2


def test_call_mutates_and_meters(runner_and_addr):
    r, addr = runner_and_addr
    res = r.call(addr, "new_account_native", **_na_kwargs())
    assert res.output == 0  # first leaf index
    assert res.gas_used > contract.GAS_VERIFY["new_account"]
    sim = r.contracts[addr]
    assert sim.balance == 10_000


def test_dry_run_discards_state(runner_and_addr):
    r, addr = runner_and_addr
    blk = r.block_number
    res = r.dry_run(addr, "new_account_native", **_na_kwargs())
    assert res.gas_used > 0
    assert r.contracts[addr].balance == 0  # snapshot discarded
    assert r.block_number == blk  # dry runs do not advance the chain


def test_revert_propagates_reason(runner_and_addr):
    r, addr = runner_and_addr
    with pytest.raises(ev.Revert, match="WrongContractVersion"):
        r.call(addr, "new_account_native",
               **{**_na_kwargs(), "expected_version": 0})


def test_reverting_address_sentinel(runner_and_addr):
    r, _ = runner_and_addr
    r.contracts[ev.REVERTING_ADDRESS] = object()
    with pytest.raises(ev.Revert, match="REVERTING_ADDRESS"):
        r.call(ev.REVERTING_ADDRESS, "anything")


def test_address_collision_and_missing_code(runner_and_addr):
    r, addr = runner_and_addr
    with pytest.raises(ev.DeployError, match="occupied"):
        r.create(object(), address=addr)
    with pytest.raises(ev.Revert, match="no code"):
        r.call(0xDEAD, "foo")


# --------------------------------------------------------------------------
# static gas model
# --------------------------------------------------------------------------

K = 5
N = 1 << K


def _keygen(with_lookup: bool, extra_gates: int = 0):
    srs = srs_mod.synthetic_srs(k=K)
    q, t = plonk.Fixed(0), plonk.Fixed(1)
    a, b = plonk.Advice(0), plonk.Advice(1)
    cs = plonk.ConstraintSystem(k=K, num_fixed=2, num_advice=2)
    cs.gates.append(("copy_b", [q * (b - a)]))
    for i in range(extra_gates):
        cs.gates.append((f"g{i}", [q * (a * a - b)]))
    if with_lookup:
        cs.lookups.append(("range16", [q * a], [t]))
    cs.permutation_columns = [plonk.Column("advice", 0),
                              plonk.Column("instance", 0)]
    cs.copies.append((plonk.Column("advice", 0), 0,
                      plonk.Column("instance", 0), 0))
    tv = [i if i < 16 else 0 for i in range(N)]
    _, vk = plonk.keygen(cs, srs, [[0] * N, tv], engine="host")
    return vk


def test_gas_breakdown_sums_and_scale():
    vk = _keygen(with_lookup=False)
    bd = gas.estimate(vk)
    assert bd.verify_call == (bd.calldata + bd.transcript + bd.field_ops
                              + bd.inversions + bd.ec_msm + bd.pairing
                              + bd.dispatch)
    assert bd.tx == bd.verify_call + gas.G_TX
    # one 2-pair pairing, always
    assert bd.pairing == 113_000
    # the reference's measured constants are 642k-925k; a tiny 2-column
    # circuit must land well below, in the same order of magnitude
    assert 150_000 < bd.verify_call < 650_000


def test_gas_monotone_in_circuit_size():
    small = gas.estimate(_keygen(with_lookup=False))
    lookup = gas.estimate(_keygen(with_lookup=True))
    big = gas.estimate(_keygen(with_lookup=True, extra_gates=6))
    # a lookup adds 3 commitments + 5 evals -> strictly more gas
    assert lookup.verify_call > small.verify_call
    assert lookup.ec_msm > small.ec_msm
    assert big.field_ops > lookup.field_ops


def test_gas_layout_matches_proof_bytes():
    """proof_layout's byte math must equal the real serialized proof.

    The witness must be non-degenerate: with an all-zero selector the
    quotient's top piece is identically zero and proving fails with
    "points at infinity", exactly like halo2 (KZG commitments are
    unblinded; see proof/transcript.py common_point).
    """
    vk = _keygen(with_lookup=True)
    commits, evals, _ = gas.proof_layout(vk.cs)
    import random

    srs = srs_mod.synthetic_srs(k=K)
    q = [1 if r < 16 else 0 for r in range(N)]
    tv = [i if i < 16 else 0 for i in range(N)]
    cs = vk.cs
    pk, vk2 = plonk.keygen(cs, srs, [q, tv], engine="host")
    # gate q*(b-a)=0, lookup q*a in [0..15], copy a[0]==instance[0]==0
    a = [r if r < 16 else 0 for r in range(N)]
    adv = [list(a), list(a)]
    proof = plonk.prove(pk, adv, [0], rng=random.Random(1), engine="host")
    assert len(proof) == 64 * commits + 32 * evals
    assert plonk.verify(vk2, proof, [0])


def test_degenerate_circuit_rejects_identity_commitment():
    """All-zero fixed/advice => zero quotient piece => clean ValueError
    (halo2's "cannot write points at infinity"), not a crash."""
    import random

    vk = _keygen(with_lookup=True)
    srs = srs_mod.synthetic_srs(k=K)
    tv = [i if i < 16 else 0 for i in range(N)]
    pk, _ = plonk.keygen(vk.cs, srs, [[0] * N, tv], engine="host")
    with pytest.raises(ValueError, match="points at infinity"):
        plonk.prove(pk, [[0] * N, [0] * N], [0],
                    rng=random.Random(1), engine="host")


def test_gwc19_layout_differs():
    vk = _keygen(with_lookup=False)
    b_commits, b_evals, _ = gas.proof_layout(vk.cs, pcs="bdfg21")
    g_commits, g_evals, _ = gas.proof_layout(vk.cs, pcs="gwc19")
    assert b_evals == g_evals
    assert g_commits != b_commits  # one W per rotation vs fixed {W, W'}


def test_gwc19_layout_matches_proof_bytes_with_lookup():
    """gwc19 + lookup: the permuted-input opening at rotation -1 adds a
    W commitment (plonk.py gwc19 arm); layout math must count it."""
    import random

    vk = _keygen(with_lookup=True)
    commits, evals, _ = gas.proof_layout(vk.cs, pcs="gwc19")
    srs = srs_mod.synthetic_srs(k=K)
    q = [1 if r < 16 else 0 for r in range(N)]
    tv = [i if i < 16 else 0 for i in range(N)]
    pk, vk2 = plonk.keygen(vk.cs, srs, [q, tv], engine="host")
    a = [r if r < 16 else 0 for r in range(N)]
    proof = plonk.prove(pk, [list(a), list(a)], [0],
                        rng=random.Random(1), engine="host", pcs="gwc19")
    assert len(proof) == 64 * commits + 32 * evals
