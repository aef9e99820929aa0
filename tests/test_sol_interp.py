"""Execute the committed Solidity verifier artifacts against real proofs.

Reference analog: integration-tests deploys the generated Yul verifier to an
in-process EVM and drives it with fresh proofs, corrupted proofs, and
perturbed public inputs (crates/integration-tests/src/verifier.rs:61-151),
with gas pinned by crates/halo2-verifier/src/generator.rs:79-81.  Here the
committed artifacts/*.sol TEXT is executed by the sol_interp subset
interpreter — the artifact itself, not its Python twin.
"""

import json
import os
import random

import pytest

from zkos_tpu.srv import sol_interp as SI

ART = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


# --- interpreter micro-tests -------------------------------------------------

MICRO = """
pragma solidity ^0.8.26;

contract Micro {
    uint256 internal constant R = 97;
    int256  internal constant NEG = -3;

    struct S { bytes buf; uint256 n; }

    function horner(uint256[] memory cs, uint256 x)
        internal pure returns (uint256 acc) {
        for (uint256 i = 0; i < cs.length; i++)
            acc = addmod(mulmod(acc, x, R), cs[i], R);
    }

    function pick(uint256 a, uint256 b) internal pure returns (uint256) {
        return a > b ? a - b : b - a;
    }

    function pow2(uint256 e) internal pure returns (uint256 r) {
        r = 1;
        uint256 b = 2;
        while (e > 0) {
            if (e & 1 == 1) r = mulmod(r, b, R);
            b = mulmod(b, b, R);
            e >>= 1;
        }
    }

    function sliceWord(bytes memory b, uint256 off)
        internal pure returns (bytes32 out) {
        assembly { out := mload(add(add(b, 0x20), off)) }
    }

    function run(bytes calldata data, uint256[] calldata xs)
        external pure returns (uint256) {
        S memory s;
        s.buf = data;
        s.n = uint256(NEG >= 0 ? NEG : -NEG);
        uint256[] memory cs = new uint256[](3);
        (cs[0], cs[1], cs[2]) = (3, 5, 7);
        uint256 h = horner(cs, xs[0]);
        uint256 w = uint256(sliceWord(s.buf, 0));
        require(xs.length > 0, "need xs");
        return addmod(addmod(h, pick(2, 9), R),
            addmod(pow2(s.n), w % R, R), R);
    }
}
"""


def test_micro_contract_semantics():
    c = SI.SolContract(MICRO)
    data = (42).to_bytes(32, "big")
    out, gas = c.call("run", data, [11])
    # horner: ((0*11+3)*11+5)*11+7 mod 97 = (3*11+5=38; 38*11+7=425) mod 97
    h = 425 % 97
    expect = (h + 7 + pow(2, 3, 97) + 42 % 97) % 97
    assert out == expect
    assert gas > SI.GAS_INTRINSIC  # metered external call


def test_micro_require_reverts():
    c = SI.SolContract(MICRO)
    with pytest.raises(SI.SolRevert):
        c.call("run", b"\x00" * 32, [])


def test_precompile_ecadd_ecmul_roundtrip():
    from zkos_tpu.ops import curve_golden as CG

    src = """
contract P {
    function mulAdd(uint256 px, uint256 py, uint256 k)
        external view returns (uint256, uint256) {
        (bool ok, bytes memory out) = address(0x07).staticcall(
            abi.encode(px, py, k));
        require(ok, "mul");
        (uint256 ax, uint256 ay) = abi.decode(out, (uint256, uint256));
        (bool ok2, bytes memory out2) = address(0x06).staticcall(
            abi.encode(ax, ay, px, py));
        require(ok2, "add");
        return abi.decode(out2, (uint256, uint256));
    }
}
"""
    c = SI.SolContract(src)
    (x, y), gas = c.call("mulAdd", 1, 2, 5)
    assert (x, y) == CG.scalar_mul(6, CG.GEN)
    assert gas >= SI.GAS_ECMUL + SI.GAS_ECADD


# --- the committed artifact, executed ----------------------------------------


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "deposit_pk.bin")),
    reason="pronto key artifacts not generated (generate_pronto_keys.py)")
def test_deposit_sol_artifact_executes_real_proof():
    """artifacts/DepositVerifier.sol verifies a fresh real proof, rejects a
    corrupted one, and meters gas in the reference's regime."""
    from test_artifacts import _deposit_knowledge
    from zkos_tpu.models import shielder as sh
    from zkos_tpu.proof import plonk, serialize, srs as srs_mod

    meta = json.load(open(os.path.join(ART, "deposit_meta.json")))
    srs = srs_mod.read(k=meta["k"])
    pkn, root = _deposit_knowledge()
    builder = sh.build_deposit(meta["k"], pkn)
    cs = sh._cs_with_copies(meta["k"], builder)
    pk = serialize.unmarshall_pk(
        open(os.path.join(ART, "deposit_pk.bin"), "rb").read(), cs, srs)
    pub = pkn.public_input(root)
    proof = plonk.prove(pk, builder.advice, pub,
                        rng=random.Random(13), engine="host")

    sol = SI.load(os.path.join(ART, "DepositVerifier.sol"))
    assert sol.name == "DepositVerifier"
    assert sol.consts["VK_DIGEST"] == meta["vk_digest"]

    ok, gas = sol.call("verifyProof", proof, list(pub))
    assert ok is True
    # Pinned gas ceiling, the reference's convention: generator.rs:79-81
    # fails CI when measured gas exceeds 110% of the pinned per-circuit
    # value.  Pin = the fused-emission measurement (artifacts/
    # gas_report.json, measure_gas.py enforces all three); reference revm
    # deposit = 831_764.  The floor guards against mis-metering (a
    # pairing + dozens of ecMuls cannot cost under 500k).
    assert 500_000 < gas <= int(1.10 * 801_741), gas

    # corrupted proof byte -> on-curve / pairing failure -> revert
    bad = bytearray(proof)
    bad[7] ^= 1
    with pytest.raises(SI.SolRevert):
        sol.call("verifyProof", bytes(bad), list(pub))

    # perturbed public input -> quotient mismatch -> pairing returns false
    bad_pub = [pub[0] ^ 1] + list(pub[1:])
    ok2, _ = sol.call("verifyProof", proof, bad_pub)
    assert ok2 is False

    # truncated proof -> explicit length check
    with pytest.raises(SI.SolRevert):
        sol.call("verifyProof", proof[:-32], list(pub))


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "NewAccountVerifier.sol")),
    reason="artifacts not generated")
def test_all_sol_artifacts_parse_and_gate_size():
    """All three committed verifiers parse, carry their meta constants, and
    fit the reference's 96 kB code-size gate (evm_runner.rs:100)."""
    from zkos_tpu.srv.evm_runner import MAX_CODE_SIZE

    for name, fname in (("newaccount", "NewAccountVerifier"),
                        ("deposit", "DepositVerifier"),
                        ("withdraw", "WithdrawVerifier")):
        sol = SI.load(os.path.join(ART, f"{fname}.sol"))
        meta = json.load(open(os.path.join(ART, f"{name}_meta.json")))
        assert sol.consts["VK_DIGEST"] == meta["vk_digest"]
        assert sol.consts["N"] == 1 << meta["k"]
        assert "verifyProof" in sol.funcs
        assert sol.source_size <= MAX_CODE_SIZE


def test_evm_runner_hosts_sol_contracts():
    """EvmRunner deploys parsed .sol artifacts and routes calls through the
    interpreter with its gas metering (evm_runner.rs create/call surface)."""
    from zkos_tpu.srv.evm_runner import EvmRunner, Revert

    runner = EvmRunner.aleph_evm()
    addr = runner.create(SI.SolContract(MICRO))
    r = runner.call(addr, "run", (7).to_bytes(32, "big"), [3])
    assert isinstance(r.output, int)
    assert r.gas_used > 21_000  # intrinsic + metered ops
    with pytest.raises(Revert):
        runner.call(addr, "run", b"\x00" * 32, [])
    with pytest.raises(Revert):
        runner.call(addr, "nosuch")
