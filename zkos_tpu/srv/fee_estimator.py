"""Standalone fee-estimation service.

Mirrors crates/fee-estimator: a refresh loop re-estimates gas for
newAccount/deposit by dry-running against seeded accounts (src/fees.rs:23-67,
concurrent estimation), serves cached results on /get_fees and /health
(src/main.rs:53-67).
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field as dc_field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# static gas shapes of the simulated entrypoints (the sim has no real gas
# metering; these anchor to the reference's measured magnitudes, §6)
BASE_GAS = {"new_account": 642_011, "deposit": 831_764}


@dataclass
class FeeEstimator:
    gas_price_fn: object = lambda: 1
    refresh_interval_s: float = 5.0
    estimates: dict = dc_field(default_factory=dict)
    updated_at: float = 0.0

    def refresh(self):
        price = self.gas_price_fn()
        self.estimates = {
            action: {"gas": gas, "fee": gas * price}
            for action, gas in BASE_GAS.items()}
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
