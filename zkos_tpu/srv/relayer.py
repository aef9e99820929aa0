"""Withdraw-relay service: REST + multi-signer worker fleet.

Mirrors crates/shielder-relayer (SURVEY.md §2.0): a Taskmaster feeding
relay workers over an MPMC queue — one worker per signing key
(taskmaster.rs:75-89) — each doing a dry-run -> submit loop against the
contract (taskmaster.rs:113-190) with optimistic-dry-run switching after
OPTIMISTIC_DRY_RUN_THRESHOLD successes (relay/mod.rs:29, monitoring.rs);
fee quoting gas*price + pocket money + commission (fee.rs:76-118) with a
TTL'd quote cache (quote_cache.rs); balance monitoring with automatic
signer recharge from the fee destination (recharge.rs); Prometheus-style
metric counters (metrics.rs:15-24); /relay, /quote_fees, /fee_address,
/health, /metrics endpoints (main.rs:207-216) — served over stdlib HTTP.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import weakref
from dataclasses import dataclass, field as dc_field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from decimal import Decimal

from ..protocol.contract import ShielderError, ShielderSim
from . import price_feed as pf

RELAY_QUEUE_CAPACITY = 1024  # relay/mod.rs:28
OPTIMISTIC_DRY_RUN_THRESHOLD = 32  # relay/mod.rs:29
QUOTE_TTL_S = 30.0

# Live fleets, so test fixtures can stop every monitor/worker thread a test
# spawned even when the test itself never calls shutdown() — leaked
# BalanceMonitor loops were observed still sampling during later, unrelated
# tests in the same process.
_LIVE_TASKMASTERS: "weakref.WeakSet[Taskmaster]" = weakref.WeakSet()


def shutdown_all() -> None:
    """Stop every live Taskmaster's monitors and workers (test teardown)."""
    for tm in list(_LIVE_TASKMASTERS):
        tm.shutdown()


@dataclass
class FeeConfig:
    """fee.rs:76-118 — total = gas * price + pocket_money, plus commission,
    all scalable into a non-native fee token via the price feed."""

    relay_gas: int = 2_000_000
    gas_price: int = 1
    pocket_money: int = 0
    commission_bps: int = 0

    def quote(self, prices: "pf.Prices | None" = None,
              fee_token: str = pf.NATIVE,
              pocket_money: int | None = None) -> dict:
        """QuoteFeeResponse shape (quote.rs:38-89): fee_details scaled
        into the fee token + price_details; stale/missing prices reject
        the quote (quote.rs:104-110 "price not available")."""
        if pocket_money is None:
            pocket_money = self.pocket_money
        if prices is None:
            prices = pf.Prices([pf.TokenInfo(pf.NATIVE,
                                             static_price=Decimal(1))])
        native_price = prices.price(pf.NATIVE)
        if native_price is None:
            raise StalePrice("Native token price not available")
        if fee_token == pf.NATIVE:
            fee_price = native_price
        else:
            fee_price = prices.price(fee_token)
            if fee_price is None:
                raise StalePrice(f"{fee_token} price not available")
        details = pf.compute_fee(
            self.gas_price, self.relay_gas, pocket_money, 0,
            native_price.unit_price, fee_price.unit_price,
            commission_bps=self.commission_bps)
        return {
            # legacy flat fields (round-1 API)
            "base_fee": details.relayer_cost_native,
            "commission": details.commission_native,
            "total_fee": details.total_cost_native,
            "valid_until": time.time() + QUOTE_TTL_S,
            # reference QuoteFeeResponse
            "fee_details": details.as_dict(),
            "price_details": {
                "gas_price": str(self.gas_price),
                "native_token_price": str(native_price.token_price),
                "native_token_unit_price": str(native_price.unit_price),
                "fee_token_price": str(fee_price.token_price),
                "fee_token_unit_price": str(fee_price.unit_price),
            },
        }


class StalePrice(Exception):
    """Quote rejected: the price feed has no valid (unexpired) price."""


@dataclass
class Metrics:
    """Counter + gauge names from metrics.rs:15-24."""

    withdraw_success: int = 0
    withdraw_failure: int = 0
    withdraw_dry_run_failure: int = 0
    signer_conflicts: int = 0
    requests_total: int = 0
    gauges: dict = dc_field(default_factory=dict)  # signer_balances etc.

    def render(self) -> str:
        out = "".join(
            f"zkos_relayer_{k} {v}\n" for k, v in vars(self).items()
            if k != "gauges")
        for name, labeled in self.gauges.items():
            if isinstance(labeled, dict):
                out += "".join(
                    f'zkos_relayer_{name}{{id="{lid}"}} {v}\n'
                    for lid, v in labeled.items())
            else:
                out += f"zkos_relayer_{name} {labeled}\n"
        return out


# -- nonce handling (shielder-contract/src/lib.rs:50-61, providers.rs) --

class SignerConflict(Exception):
    """Two submissions raced on one signer's nonce (nonce too low)."""


def classify_submit_error(msg: str) -> str:
    """Error-string sniffing: 'nonce too low'/'already known' mean another
    tx from the same signer won the race (lib.rs:50-61)."""
    low = msg.lower()
    if "nonce too low" in low or "already known" in low:
        return "SignerConflict"
    return "Other"


class NonceManager:
    """NoncePolicy::Caching | Stateless (providers.rs; main.rs:287-308).

    The sim's "chain" tracks one confirmed nonce per signer; Caching keeps
    a local counter (fast, conflicts surface at submit), Stateless re-reads
    the chain every submission (slow, conflict-free for a single relayer).
    """

    def __init__(self, policy: str = "caching"):
        assert policy in ("caching", "stateless")
        self.policy = policy
        self.chain_nonces: dict[int, int] = {}   # confirmed on chain
        self.local_nonces: dict[int, int] = {}   # caching provider's view
        self._lock = threading.Lock()

    def next_nonce(self, signer: int) -> int:
        with self._lock:
            if self.policy == "stateless":
                return self.chain_nonces.get(signer, 0)
            n = self.local_nonces.get(
                signer, self.chain_nonces.get(signer, 0))
            self.local_nonces[signer] = n + 1
            return n

    def submit(self, signer: int, nonce: int):
        """The chain accepts exactly the next nonce; others conflict."""
        with self._lock:
            expected = self.chain_nonces.get(signer, 0)
            if nonce < expected:
                raise SignerConflict(f"nonce too low: {nonce} < {expected}")
            if nonce > expected:
                raise SignerConflict(f"nonce gap: {nonce} > {expected}")
            self.chain_nonces[signer] = nonce + 1

    def resync(self, signer: int):
        """After a conflict the caching provider re-reads the chain."""
        with self._lock:
            self.local_nonces[signer] = self.chain_nonces.get(signer, 0)


# -- monitors (shielder-relayer/src/monitor/*) --

class RpcMonitor:
    """RPC health with cached validity (monitor/rpc_monitor.rs)."""

    def __init__(self, check_fn, cache_ttl_s: float = 1.0):
        self.check_fn = check_fn
        self.cache_ttl_s = cache_ttl_s
        self._last = (0.0, False)

    def healthy(self) -> bool:
        now = time.time()
        ts, ok = self._last
        if now - ts < self.cache_ttl_s:
            return ok
        try:
            ok = bool(self.check_fn())
        except Exception:
            ok = False
        self._last = (now, ok)
        return ok


class BalanceMonitor:
    """Samples signer + fee-destination balances into metric gauges
    (monitor/balance_monitor.rs)."""

    def __init__(self, sim, signer_keys, fee_destination, metrics: Metrics,
                 interval_s: float = 0.5):
        self.sim = sim
        self.signer_keys = signer_keys
        self.fee_destination = fee_destination
        self.metrics = metrics
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def sample(self):
        self.metrics.gauges["signer_balances"] = {
            hex(k): self.sim.balances.get(k, 0) for k in self.signer_keys}
        self.metrics.gauges["fee_destination_balance"] = \
            self.sim.balances.get(self.fee_destination, 0)

    def _loop(self):
        while not self._stop.is_set():
            self.sample()
            self._stop.wait(self.interval_s)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=1.0)


@dataclass
class RelayTask:
    request: dict
    trace: list = dc_field(default_factory=list)
    done: threading.Event = dc_field(default_factory=threading.Event)
    result: dict | None = None

    def annotate(self, stage: str):
        """RequestTrace-style timestamped stage notes (request_trace.rs)."""
        self.trace.append((time.time(), stage))


class Taskmaster:
    """Worker fleet over an MPMC queue; one worker per signer key."""

    def __init__(self, sim: ShielderSim, signer_keys: list[int],
                 fee_config: FeeConfig | None = None,
                 recharge_threshold: int = 0, recharge_amount: int = 0,
                 nonce_policy: str = "caching",
                 prices: "pf.Prices | None" = None):
        self.sim = sim
        self.fee_config = fee_config or FeeConfig()
        self.prices = prices or pf.Prices(
            [pf.TokenInfo(pf.NATIVE, static_price=Decimal(1))])
        self.metrics = Metrics()
        self.queue: queue.Queue = queue.Queue(maxsize=RELAY_QUEUE_CAPACITY)
        self.quote_cache: dict[str, dict] = {}
        self.fee_destination = sim.protocol_fee_receiver
        self.recharge_threshold = recharge_threshold
        self.recharge_amount = recharge_amount
        self.nonces = NonceManager(nonce_policy)
        self.rpc_monitor = RpcMonitor(lambda: not sim.paused)
        self.balance_monitor = BalanceMonitor(
            sim, signer_keys, self.fee_destination, self.metrics).start()
        self._success_streak = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self.workers = [
            threading.Thread(target=self._relay_worker, args=(key,), daemon=True)
            for key in signer_keys]
        for w in self.workers:
            w.start()
        _LIVE_TASKMASTERS.add(self)

    # -- quoting --

    def quote_fees(self, fee_token: str = pf.NATIVE,
                   pocket_money: int | None = None) -> dict:
        q = self.fee_config.quote(self.prices, fee_token, pocket_money)
        self._sample_price_metrics()
        self.quote_cache[str(id(q))] = q
        self._gc_quotes()
        q = dict(q)
        q["quote_id"] = str(id(q))
        return q

    def _sample_price_metrics(self):
        """expired_price / price_age gauges (metrics.rs:23-24)."""
        ages = self.prices.price_ages()
        current = self.prices.current_prices()
        self.metrics.gauges["price_age"] = {
            k: (-1.0 if a is None else round(a, 3)) for k, a in ages.items()}
        self.metrics.gauges["expired_price"] = {
            k: int(current[k] is None) for k in current}

    def _gc_quotes(self):
        now = time.time()
        for k in [k for k, v in self.quote_cache.items()
                  if v["valid_until"] < now]:
            del self.quote_cache[k]

    # -- relay path --

    def register_new_task(self, request: dict) -> RelayTask:
        """Validation chain then enqueue (relay/mod.rs:58-80)."""
        task = RelayTask(request=request)
        task.annotate("queued for relay")
        self.queue.put_nowait(task)
        return task

    def _relay_worker(self, signer_key: int):
        while not self._stop.is_set():
            try:
                task = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            task.annotate("received by worker")
            try:
                optimistic = (not getattr(self, "_always_dry_run", False)
                              and self._success_streak
                              >= OPTIMISTIC_DRY_RUN_THRESHOLD)
                if not optimistic:
                    self._dry_run(task.request)
                    task.annotate("dry run completed")
                result_idx = self._submit(signer_key, task.request)
                with self._lock:
                    self._success_streak += 1
                self.metrics.withdraw_success += 1
                task.result = {"status": "ok", "note_index": result_idx,
                               "signer": signer_key}
                task.annotate("relay completed")
            except ShielderError as e:
                with self._lock:
                    self._success_streak = 0  # back to obligatory dry runs
                if "dry" in str(e):
                    self.metrics.withdraw_dry_run_failure += 1
                else:
                    self.metrics.withdraw_failure += 1
                task.result = {"status": "error", "reason": str(e)}
            finally:
                self._maybe_recharge(signer_key)
                task.done.set()

    def _dry_run(self, request: dict):
        """Simulate against a snapshot (DryRun call type, call_type.rs:11-82)."""
        import copy

        sim_copy = copy.copy(self.sim)
        sim_copy.nullifiers = dict(self.sim.nullifiers)
        sim_copy.balances = dict(self.sim.balances)
        try:
            sim_copy.withdraw_native(**request)
        except ShielderError as e:
            raise ShielderError(f"dry run failed: {e}") from e

    def _submit(self, signer_key: int, request: dict) -> int:
        """Submit with nonce accounting; one resync retry on SignerConflict
        (the taskmaster's nonce-race recovery, taskmaster.rs + lib.rs:50-61)."""
        for attempt in (0, 1):
            nonce = self.nonces.next_nonce(signer_key)
            try:
                self.nonces.submit(signer_key, nonce)  # tx acceptance
            except SignerConflict as e:
                self.metrics.signer_conflicts += 1
                if classify_submit_error(str(e)) == "SignerConflict" \
                        and attempt == 0:
                    self.nonces.resync(signer_key)
                    continue
                raise
            return self.sim.withdraw_native(**request)
        raise SignerConflict("unreachable")

    def _maybe_recharge(self, signer_key: int):
        """Auto top-up from the fee destination (recharge.rs)."""
        if self.recharge_threshold <= 0:
            return
        bal = self.sim.balances.get(signer_key, 0)
        if bal < self.recharge_threshold:
            fees = self.sim.balances.get(self.fee_destination, 0)
            amount = min(self.recharge_amount, fees)
            if amount > 0:
                self.sim.balances[self.fee_destination] = fees - amount
                self.sim.balances[signer_key] = bal + amount

    def shutdown(self):
        self._stop.set()
        self.balance_monitor.stop()
        for w in self.workers:
            w.join(timeout=1.0)

    @classmethod
    def from_config(cls, sim: ShielderSim, server_config) -> "Taskmaster":
        """Boot the fleet from a resolved ServerConfig (main.rs:75-111).

        Signing keys are hex strings in config (the reference's raw key
        strings); the sim addresses them by int.
        """
        ops = server_config.operations
        prices = pf.Prices(
            list(ops.token_config) or
            [pf.TokenInfo(pf.NATIVE, static_price=Decimal(1))],
            validity_s=ops.price_feed_validity_s,
            refresh_interval_s=ops.price_feed_refresh_interval_s)
        tm = cls(
            sim,
            signer_keys=[int(k, 16) for k in server_config.keys.signing_keys],
            fee_config=FeeConfig(
                relay_gas=server_config.chain.relay_gas,
                commission_bps=ops.service_fee_percent * 100),
            recharge_threshold=ops.recharge_threshold,
            recharge_amount=ops.recharge_amount,
            nonce_policy=ops.nonce_policy,
            prices=prices)
        if ops.dry_running == "always":
            # never switch to optimistic mode: keep the streak pinned low
            tm._always_dry_run = True
        return tm


def make_http_server(tm: Taskmaster, port: int = 0) -> ThreadingHTTPServer:
    """REST facade: /relay, /quote_fees, /fee_address, /health, /metrics."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            tm.metrics.requests_total += 1
            if self.path == "/health":
                healthy = tm.rpc_monitor.healthy()
                self._json(200 if healthy else 503,
                           {"status": "healthy" if healthy else "unhealthy"})
            elif self.path == "/api-docs/openapi.json":
                # OpenAPI self-documentation (relayer main.rs:207-220/utoipa)
                self._json(200, {
                    "openapi": "3.0.0",
                    "info": {"title": "zkos-relayer", "version": "0.1.1"},
                    "paths": {
                        "/relay": {"post": {
                            "summary": "Relay a withdraw with quoted fees",
                            "responses": {"200": {"description": "relayed"},
                                          "400": {"description": "invalid"},
                                          "429": {"description": "queue full"}}}},
                        "/quote_fees": {"get": {
                            "summary": "Fee quote (gas*price + pocket money "
                                       "+ commission), cached with TTL"}},
                        "/fee_address": {"get": {
                            "summary": "Relayer fee destination address"}},
                        "/health": {"get": {
                            "summary": "RPC-monitor-backed health"}},
                        "/metrics": {"get": {
                            "summary": "Prometheus counters and gauges"}},
                    }})
            elif self.path == "/fee_address":
                self._json(200, {"fee_address": hex(tm.fee_destination)})
            elif self.path == "/quote_fees":
                try:
                    self._json(200, tm.quote_fees())
                except StalePrice as e:
                    self._json(500, {"error": str(e)})
            elif self.path == "/metrics":
                body = tm.metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            tm.metrics.requests_total += 1
            if self.path == "/quote_fees":
                # reference POST body: {fee_token, pocket_money} (quote.rs)
                length = int(self.headers.get("Content-Length", "0"))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                    q = tm.quote_fees(
                        fee_token=body.get("fee_token", pf.NATIVE),
                        pocket_money=(int(body["pocket_money"])
                                      if "pocket_money" in body else None))
                    self._json(200, q)
                except StalePrice as e:
                    self._json(500, {"error": str(e)})
                except (KeyError, ValueError) as e:
                    self._json(400, {"error": str(e)})
                return
            if self.path != "/relay":
                self._json(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", "0"))
            try:
                request = json.loads(self.rfile.read(length))
                request["proof"] = bytes.fromhex(request["proof"])
                task = tm.register_new_task(request)
            except (queue.Full, KeyError, ValueError) as e:
                self._json(400, {"error": str(e)})
                return
            task.done.wait(timeout=60)
            code = 200 if task.result and task.result["status"] == "ok" else 400
            self._json(code, {"result": task.result,
                              "trace": [s for _, s in task.trace]})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
