"""Pre-generate proving-key artifacts — the shielder_bindings build.rs analog.

The reference's build.rs runs keygen at build time and embeds
params.bin / pk.bin per circuit so clients can `new_pronto` without the
(expensive) keygen (`crates/shielder_bindings/build.rs:19-61`).  This
script does the same into artifacts/: for each Shielder relation it
runs min-k keygen against the real ppot SRS and writes

- artifacts/{name}_pk.bin    (proof.serialize.marshall_pk)
- artifacts/{name}_meta.json (k + vk digest, to pin test expectations)

The committed artifacts let the default test suite drive real proofs
through the committed verifier twins without paying the ~650 s min-k
sweep (tests/test_artifacts.py).
"""

import json
import os
import time

from generate_verifiers import _examples
from zkos_tpu.models import shielder as sh
from zkos_tpu.protocol import contract
from zkos_tpu.proof import serialize, srs as srs_mod

OUT = os.path.join(os.path.dirname(__file__), "artifacts")


def main():
    max_k = int(os.environ.get("ZKOS_GENERATOR_MAX_K", "11"))
    srs = srs_mod.read(k=max_k)
    for name, build in _examples(contract.consts.TREE_HEIGHT):
        t0 = time.time()
        circ = sh.generate_keys_with_min_k(name.lower(), srs, build,
                                           max_k=max_k)
        data = serialize.marshall_pk(circ.pk)
        with open(os.path.join(OUT, f"{name.lower()}_pk.bin"), "wb") as f:
            f.write(data)
        with open(os.path.join(OUT, f"{name.lower()}_meta.json"), "w") as f:
            json.dump({"k": circ.k, "vk_digest": circ.vk.vk_digest}, f)
        print(f"{name}: k={circ.k} pk={len(data)}B "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
