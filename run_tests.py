#!/usr/bin/env python
"""Run the test suite in process-isolated batches.

The full single-process run accumulates hundreds of XLA:CPU compiled
executables and crashes (SIGSEGV inside ``backend_compile_and_load``) after
~190 tests on small hosts — the crash is in-process accumulated state, not
any individual test (every file passes in isolation).  This runner chunks
the test files across pytest subprocesses so no single process compiles
more than a batch's worth of graphs, mirroring how the reference splits its
oracle across crate-level ``cargo test`` processes
(/root/reference/.github/workflows/on-pull-request-commit.yml:11-69).

Usage:
    python run_tests.py            # whole suite, batched
    python run_tests.py -x        # stop at the first failing batch
    python run_tests.py --batch-size 3 -- -q -k msm

Everything after ``--`` is forwarded to every pytest invocation.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent

# Heavy compilers (many distinct jit graphs) get their own small batches so
# no subprocess approaches the observed ~190-test crash horizon.
HEAVY = {
    "test_engine_device.py",
    "test_engine_components.py",
    "test_integration.py",
    "test_k13.py",
    "test_parallel.py",
    "test_plonk.py",
    "test_msm.py",
    "test_ntt.py",
}


def build_batches(files: list[Path], batch_size: int) -> list[list[Path]]:
    heavy = [f for f in files if f.name in HEAVY]
    light = [f for f in files if f.name not in HEAVY]
    batches: list[list[Path]] = [[f] for f in heavy]
    for i in range(0, len(light), batch_size):
        batches.append(light[i:i + batch_size])
    return batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-x", action="store_true", dest="failfast",
                    help="stop at the first failing batch")
    ap.add_argument("--batch-size", type=int, default=5,
                    help="light test files per subprocess (default 5)")
    args, extra = ap.parse_known_args()
    if extra and extra[0] == "--":
        extra = extra[1:]

    files = sorted((HERE / "tests").glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    batches = build_batches(files, args.batch_size)
    t0 = time.perf_counter()
    failed: list[str] = []
    for i, batch in enumerate(batches):
        names = [str(f.relative_to(HERE)) for f in batch]
        label = ", ".join(n.split("/")[-1] for n in names)
        print(f"[batch {i + 1}/{len(batches)}] {label}", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *extra, *names],
            cwd=HERE, env=os.environ.copy())
        if rc == 5:  # no tests collected (e.g. -k filtered everything out)
            continue
        if rc != 0:
            failed.append(label)
            if args.failfast:
                break
    dt = time.perf_counter() - t0
    if failed:
        print(f"\nFAILED batches ({len(failed)}/{len(batches)}, {dt:.0f}s):")
        for name in failed:
            print(f"  {name}")
        return 1
    print(f"\nall {len(batches)} batches passed in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
