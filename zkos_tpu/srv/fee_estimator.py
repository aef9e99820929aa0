"""Standalone fee-estimation service.

Mirrors crates/fee-estimator: at startup the operator seeds the estimator
with prepared calls (real calldata + proofs from seeded shielder accounts,
src/fees.rs "EstimateGas from seeded accounts"); a refresh loop re-estimates
gas for each action by *dry-running* those calls against the live contract
state concurrently (src/fees.rs:23-67, tokio::join!), and serves cached
results on /get_fees and /health (src/main.rs:53-67).
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field as dc_field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


@dataclass
class SeededCall:
    """A prepared entrypoint invocation used solely for gas estimation."""

    method: str  # e.g. "new_account_native"
    kwargs: dict


@dataclass
class FeeEstimator:
    """Dry-run-based gas estimator against a ShielderSim.

    sim: the contract simulator (its dry_run is the eth_estimateGas analog);
    seeded_calls: action name -> SeededCall prepared from seeded accounts.
    """

    sim: object = None
    seeded_calls: dict = dc_field(default_factory=dict)
    gas_price_fn: object = lambda: 1
    refresh_interval_s: float = 5.0
    estimates: dict = dc_field(default_factory=dict)
    errors: dict = dc_field(default_factory=dict)
    updated_at: float = 0.0

    def refresh(self):
        """Concurrently dry-run every seeded call (fees.rs:30-67)."""
        price = self.gas_price_fn()
        results: dict = {}
        errors: dict = {}
        lock = threading.Lock()

        def estimate(action, call):
            try:
                _, gas = self.sim.dry_run(call.method, **call.kwargs)
                with lock:
                    results[action] = {"gas": gas, "fee": gas * price}
            except Exception as e:  # revert -> surfaced, not cached
                with lock:
                    errors[action] = str(e)

        threads = [threading.Thread(target=estimate, args=(a, c))
                   for a, c in self.seeded_calls.items()]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        self.estimates = results
        self.errors = errors
        self.updated_at = time.time()

    def start_refresh_loop(self) -> threading.Thread:
        def loop():
            while True:
                self.refresh()
                time.sleep(self.refresh_interval_s)

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t


def make_http_server(est: FeeEstimator, port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                healthy = time.time() - est.updated_at < 10 * est.refresh_interval_s
                self._json(200 if healthy else 503,
                           {"status": "healthy" if healthy else "stale"})
            elif self.path == "/get_fees":
                self._json(200, est.estimates)
            else:
                self._json(404, {"error": "not found"})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
