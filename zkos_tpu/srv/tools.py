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
            if start <= block <= end and ev["kind"] in kinds and ev["memo"]:
                out.append({"kind": ev["kind"], "block": block,
                            "note_index": ev["index"], "memo": ev["memo"]})
    return out


@dataclass
class StressResult:
    latencies_s: list
    successes: int
    failures: int
    wall_s: float = 0.0

    def _pct(self, q: float) -> float:
        s = sorted(self.latencies_s)
        if not s:
            return 0.0
        return s[min(len(s) - 1, int(q * len(s)))]

    @property
    def p50(self):
        return self._pct(0.50)

    @property
    def p90(self):
        return self._pct(0.90)

    @property
    def p99(self):
        return self._pct(0.99)

    @property
    def mean(self):
        return (sum(self.latencies_s) / len(self.latencies_s)
                if self.latencies_s else 0.0)

    @property
    def throughput_rps(self):
        return len(self.latencies_s) / self.wall_s if self.wall_s else 0.0

    def report(self) -> dict:
        """The per-party latency summary of stress-testing src/party.rs."""
        return {"requests": len(self.latencies_s),
                "successes": self.successes, "failures": self.failures,
                "p50_ms": round(self.p50 * 1e3, 2),
                "p90_ms": round(self.p90 * 1e3, 2),
                "p99_ms": round(self.p99 * 1e3, 2),
                "mean_ms": round(self.mean * 1e3, 2),
                "throughput_rps": round(self.throughput_rps, 1)}


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

    t_start = time.perf_counter()
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
        failures=sum(1 for r in results if not r[1]),
        wall_s=time.perf_counter() - t_start)


def gas_consumption_report(sim_factory, scenarios: list[tuple]) -> dict:
    """Per-action gas table — the gas-consumption binary's analog
    (crates/integration-tests/src/bin/gas_consumption.rs:27-141).

    sim_factory: () -> fresh ShielderSim; scenarios: [(label, method,
    kwargs_fn(sim))] executed in order on one sim, recording metered gas.
    """
    sim = sim_factory()
    table = {}
    for label, method, kwargs_fn in scenarios:
        getattr(sim, method)(**kwargs_fn(sim))
        table[label] = sim.last_gas
    return table


def distribute_funds(balances: dict, master: int, minions: list[int],
                     amount_each: int) -> None:
    """Fund N minion accounts from a master balance (token-distributor)."""
    need = amount_each * len(minions)
    assert balances.get(master, 0) >= need, "master balance too low"
    balances[master] -= need
    for m in minions:
        balances[m] = balances.get(m, 0) + amount_each
