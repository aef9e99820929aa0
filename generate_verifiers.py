"""Verifier-bundle generator — the halo2_solidity_verifier_generator analog.

Reads the real perpetual-powers-of-tau SRS, runs keygen for each of the
three Shielder relations at its minimal k, and renders both verifier
artifacts per relation into artifacts/:

- {Name}Verifier.sol   (proof.solidity — the deployable on-chain form)
- {name}_verifier.py   (proof.codegen — the executable twin / oracle)

Mirrors crates/halo2-verifier/src/generator.rs:19-56
(generate_solidity_verification_bundle).
"""

import os
import random
import sys
import time

from zkos_tpu.models import shielder as sh
from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.protocol import contract, merkle, notes, secrets
from zkos_tpu.proof import codegen, plonk, poseidon2_sol, solidity, \
    srs as srs_mod

OUT = os.path.join(os.path.dirname(__file__), "artifacts")


def _examples(k_merkle: int):
    rng = random.Random(1)
    _, ar_pk = GR.generate_keys(rng.randrange(1, GR.SCALAR_ORDER))
    id_ = secrets.generate_user_id(1)
    na = sh.NewAccountProverKnowledge(
        id=id_, nullifier=secrets.derive_nullifier(id_, 0),
        initial_deposit=100, commitment=1, token_address=0,
        encryption_salt=0x5A17, ar_pubkey=ar_pk, mac_salt=5)
    tree = merkle.MerkleTree(height=contract.consts.TREE_HEIGHT)
    nul = secrets.derive_nullifier(id_, 0)
    idx = tree.add_note(notes.make_note(id_, nul, 100, 0))
    path = merkle.path_to_matrix(tree.get_merkle_path(idx))
    dep = sh.DepositProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=path, value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    wit = sh.WithdrawProverKnowledge(
        id=id_, nullifier_old=nul, account_old_balance=100, token_address=0,
        path=path, withdrawal_value=5, commitment=1,
        nullifier_new=secrets.derive_nullifier(id_, 1), mac_salt=2)
    return [
        ("NewAccount", lambda k: sh.build_new_account(k, na)),
        ("Deposit", lambda k: sh.build_deposit(k, dep)),
        ("Withdraw", lambda k: sh.build_withdraw(k, wit)),
    ]


def main():
    max_k = int(os.environ.get("ZKOS_GENERATOR_MAX_K", "11"))
    srs = srs_mod.read(k=max_k)
    os.makedirs(OUT, exist_ok=True)
    # on-chain hash contract (make generate-poseidon-contracts analog)
    p2_path = os.path.join(OUT, "Poseidon2T8Assembly.sol")
    with open(p2_path, "w") as f:
        f.write(poseidon2_sol.render())
    print(f"Poseidon2T8Assembly: sol={os.path.getsize(p2_path)}B", flush=True)
    # protocol contracts (Shielder.sol / MerkleTree.sol twins)
    from zkos_tpu.proof import contracts_sol

    for path in contracts_sol.generate_contracts(OUT):
        print(f"{os.path.basename(path)}: sol={os.path.getsize(path)}B",
              flush=True)
    engine = sys.argv[1] if len(sys.argv) > 1 else "host"
    only = os.environ.get("ZKOS_GENERATOR_ONLY")
    for name, build in _examples(contract.consts.TREE_HEIGHT):
        if only and name.lower() not in only.lower().split(","):
            continue
        t0 = time.time()
        circ = sh.generate_keys_with_min_k(name.lower(), srs, build,
                                           max_k=max_k)
        sol = solidity.generate_solidity_verifier(
            circ.vk, os.path.join(OUT, f"{name}Verifier.sol"),
            name=f"{name}Verifier")
        py = codegen.generate_verifier(
            circ.vk, os.path.join(OUT, f"{name.lower()}_verifier.py"))
        print(f"{name}: k={circ.k} sol={len(sol)}B py={len(py)}B "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
