"""Operational tools: memo scanning, stress testing, token distribution.

Thin mirrors of crates/memo-scan (10k-block batched event scans extracting
memo bytes, src/scan.rs:15-122), crates/stress-testing (pre-built withdraw
load fired concurrently with latency capture, src/party.rs:25-77), and
crates/token-distributor (master funds N minions, main.rs:17-50).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

from ..protocol.contract import ShielderSim

SCAN_BATCH_BLOCKS = 10_000  # memo-scan src/scan.rs batch size


def scan_memos(sim: ShielderSim, from_block: int = 0,
               to_block: int | None = None,
               kinds=("NewAccount", "Deposit", "Withdraw")) -> list[dict]:
    """Scan events in block batches and extract non-empty memo payloads."""
    out = []
    hi = to_block if to_block is not None else sim.block_number
    for start in range(from_block, hi + 1, SCAN_BATCH_BLOCKS):
        end = min(start + SCAN_BATCH_BLOCKS - 1, hi)
        for i, ev in enumerate(sim.events):
            block = i + 2  # registration blocks start at 2
            if start <= block <= end and ev[0] in kinds and ev[5]:
                out.append({"kind": ev[0], "block": block, "note_index": ev[2],
                            "memo": ev[5]})
    return out


@dataclass
class StressResult:
    latencies_s: list
    successes: int
    failures: int

    @property
    def p50(self):
        s = sorted(self.latencies_s)
        return s[len(s) // 2] if s else 0.0


def stress_relayer(taskmaster, requests: list[dict],
                   concurrency: int = 8) -> StressResult:
    """Fire pre-built relay requests concurrently, measure per-request
    latency and success (stress-testing src/party.rs:25-77)."""
    results = []
    lock = threading.Lock()

    def fire(req):
        t0 = time.perf_counter()
        task = taskmaster.register_new_task(req)
        ok = task.done.wait(30) and task.result["status"] == "ok"
        with lock:
            results.append((time.perf_counter() - t0, ok))

    threads = []
    for req in requests:
        while len([t for t in threads if t.is_alive()]) >= concurrency:
            time.sleep(0.001)
        t = threading.Thread(target=fire, args=(req,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    return StressResult(
        latencies_s=[r[0] for r in results],
        successes=sum(1 for r in results if r[1]),
        failures=sum(1 for r in results if not r[1]))


def distribute_funds(balances: dict, master: int, minions: list[int],
                     amount_each: int) -> None:
    """Fund N minion accounts from a master balance (token-distributor)."""
    need = amount_each * len(minions)
    assert balances.get(master, 0) >= need, "master balance too low"
    balances[master] -= need
    for m in minions:
        balances[m] = balances.get(m, 0) + amount_each
