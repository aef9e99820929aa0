"""Measure verification gas by EXECUTING the committed .sol artifacts.

The reference pins verification gas by running its generated Yul verifiers
on revm: 642_011 / 831_764 / 925_323 for NewAccount / Deposit / Withdraw
(crates/halo2-verifier/src/generator.rs:79-81, measured via
crates/evm-utils/src/evm_runner.rs).  This script proves one real proof per
relation with the committed pronto keys, executes each committed
artifacts/{Name}Verifier.sol through srv.sol_interp with EVM gas weights,
and writes artifacts/gas_report.json.

Run on CPU (host prover):  python measure_gas.py
"""

import json
import os
import random

import jax

jax.config.update("jax_platforms", "cpu")
# no persistent cache: XLA:CPU AOT entries never reload on this jaxlib
# (cpu_aot_loader rejects its own pseudo-features); writes would be waste

ART = os.path.join(os.path.dirname(__file__), "artifacts")

REFERENCE_GAS = {  # generator.rs:79-81 (revm, solc 0.8.26 Yul verifier)
    "newaccount": 642_011,
    "deposit": 831_764,
    "withdraw": 925_323,
}

# Pinned regression ceilings, the reference's convention (generator.rs:79-81
# asserts measured <= 110% of the pinned value and fails CI otherwise).
# Pins = the fused-emission measurements; bump deliberately when the
# verifier or circuit shape changes, never to paper over a regression.
PINNED_GAS = {
    "newaccount": 820_540,
    "deposit": 801_741,
    "withdraw": 801_657,
}
CEILING = 1.10

# Contract-size gate: the reference CI measures verifier contract size
# per commit and the 24 kB runtime/96 kB deploy limits bound it
# (.github/workflows/_measure-gas-and-contract-size.yml:45-60,
# evm_runner.rs:100).  The emitted artifacts are source text, so the
# analog gate pins SOURCE size (~80 kB each) at +10%.
PINNED_ARTIFACT_BYTES = {
    "newaccount": 79_396,
    "deposit": 78_779,
    "withdraw": 78_780,
}


def main() -> None:
    import zkos_tpu.ops.grumpkin_golden as GR
    from zkos_tpu.models import shielder as sh
    from zkos_tpu.protocol import contract, merkle, notes, secrets
    from zkos_tpu.proof import plonk, serialize, srs as srs_mod
    from zkos_tpu.srv import sol_interp as SI

    rng = random.Random(1)
    _, ar_pk = GR.generate_keys(rng.randrange(1, GR.SCALAR_ORDER))
    id_ = secrets.generate_user_id(1)
    tree = merkle.MerkleTree(height=contract.consts.TREE_HEIGHT)
    nul = secrets.derive_nullifier(id_, 0)
    idx = tree.add_note(notes.make_note(id_, nul, 100, 0))
    path = merkle.path_to_matrix(tree.get_merkle_path(idx))
    root = tree.get_merkle_path(idx)[-1]

    na = sh.NewAccountProverKnowledge(
        id=id_, nullifier=nul, initial_deposit=100, commitment=1,
        token_address=0, encryption_salt=0x5A17, ar_pubkey=ar_pk, mac_salt=5)
    dep = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=path, value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    wd = sh.WithdrawProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=path, withdrawal_value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)

    cases = {
        "newaccount": ("NewAccountVerifier", lambda k: sh.build_new_account(k, na),
                       lambda: na.public_input()),
        "deposit": ("DepositVerifier", lambda k: sh.build_deposit(k, dep),
                    lambda: dep.public_input(root)),
        "withdraw": ("WithdrawVerifier", lambda k: sh.build_withdraw(k, wd),
                     lambda: wd.public_input(root)),
    }

    srs11 = srs_mod.read(k=11)
    report = {}
    for name, (fname, build, pub_fn) in cases.items():
        meta = json.load(open(os.path.join(ART, f"{name}_meta.json")))
        srs = srs11.shrink(meta["k"]) if meta["k"] < 11 else srs11
        builder = build(meta["k"])
        cs = sh._cs_with_copies(meta["k"], builder)
        pk = serialize.unmarshall_pk(
            open(os.path.join(ART, f"{name}_pk.bin"), "rb").read(), cs, srs)
        pub = pub_fn()
        proof = plonk.prove(pk, builder.advice, pub,
                            rng=random.Random(7), engine="host")
        sol = SI.load(os.path.join(ART, f"{fname}.sol"))
        ok, gas = sol.call("verifyProof", proof, list(pub))
        assert ok is True, name
        ref = REFERENCE_GAS[name]
        report[name] = {
            "interpreter_gas": gas,
            "gas_by_category": dict(sorted(sol.gas_cat.items(),
                                           key=lambda kv: -kv[1])),
            "reference_revm_gas": ref,
            "vs_reference": round(gas / ref, 4),
            "proof_bytes": len(proof),
            "artifact_bytes": sol.source_size,
            "k": meta["k"],
        }
        print(f"{name:11s} gas={gas:>9,} (reference {ref:,}; "
              f"x{gas/ref:.3f}) proof={len(proof)}B", flush=True)
        print("  categories:", dict(sorted(sol.gas_cat.items(),
                                           key=lambda kv: -kv[1])), flush=True)

    out = {
        "note": ("gas metered by executing the committed .sol text in "
                 "srv.sol_interp with Ethereum op costs (precompiles, "
                 "keccak, mulmod/addmod, calldata, intrinsic); an "
                 "executable estimate, not a revm replay"),
        "newaccount_gap": (
            "newaccount > 1.10x reference by circuit shape, not emission: "
            "all three relations share the 17-advice/28-fixed gadget "
            "layout (74 multiopen commitments, 5120 B proof), and the "
            "fused emitter already pays exactly one ecMul per commitment; "
            "the reference's newaccount circuit (no Merkle path) is "
            "narrower, so its multiopen and calldata are smaller.  "
            "Closing it needs a newaccount-specific narrow layout."),
        "verifiers": report,
    }
    with open(os.path.join(ART, "gas_report.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["interpreter_gas"] for k, v in report.items()}))

    over = {k: v["interpreter_gas"] for k, v in report.items()
            if v["interpreter_gas"] > CEILING * PINNED_GAS[k]}
    big = {k: v["artifact_bytes"] for k, v in report.items()
           if v["artifact_bytes"] > CEILING * PINNED_ARTIFACT_BYTES[k]}
    if over or big:
        raise SystemExit(
            (f"gas regression: {over} exceed {CEILING:.0%} of pinned "
             f"{ {k: PINNED_GAS[k] for k in over} }; " if over else "")
            + (f"artifact-size regression: {big} exceed {CEILING:.0%} of "
               f"{ {k: PINNED_ARTIFACT_BYTES[k] for k in big} }" if big
               else ""))


if __name__ == "__main__":
    main()
