"""Token price feed + cross-token fee math (shielder-relayer analog).

Mirrors `crates/shielder-relayer/src/price_feed/` and `src/fee.rs`:

- ``Price`` carries a token price (per base unit, e.g. 1 ETH) and a unit
  price (per minimal unit, e.g. 1 wei), with an eternal or timed
  expiration (price_feed/price.rs:20-68).
- ``Prices`` is the per-token registry updated by a background worker;
  ``price()`` returns None once the validity window lapses — the quote
  path must reject then (price_feed/mod.rs:84-91, quote.rs:104-110).
- ``compute_fee`` converts the native-denominated relay cost into the
  fee token via the unit-price ratio, rounded to 20 significant digits
  exactly like the reference's ``scale_u256`` (fee.rs:76-118).

Providers: the reference fetches from the DIA REST API
(price_feed/fetching.rs); here a provider is either a static price or a
callable returning ``(price: Decimal, timestamp: float)`` so tests and
deployments can plug any source without network assumptions.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from decimal import Decimal, ROUND_HALF_EVEN
from typing import Callable

NATIVE_TOKEN_DECIMALS = 18  # shielder-setup native_token defaults
RELATIVE_PRICE_DIGITS = 20  # fee.rs:111


# ---------------------------------------------------------------------------
# token descriptors (token.rs)
# ---------------------------------------------------------------------------

NATIVE = "native"


def erc20_kind(address: int) -> str:
    """TokenKind::ERC20 display form (token.rs:28-36)."""
    return f"erc20:{address:#x}"


@dataclass(frozen=True)
class TokenInfo:
    """token.rs TokenInfo: kind + decimals + price provider."""

    kind: str  # NATIVE or erc20_kind(addr)
    decimals: int = NATIVE_TOKEN_DECIMALS
    static_price: Decimal | None = None
    fetcher: Callable[[], tuple[Decimal, float]] | None = None

    def __post_init__(self):
        assert (self.static_price is None) != (self.fetcher is None), \
            "exactly one of static_price / fetcher"


# ---------------------------------------------------------------------------
# prices (price_feed/price.rs, mod.rs)
# ---------------------------------------------------------------------------

@dataclass
class Price:
    token_price: Decimal           # per base unit (1 ETH)
    unit_price: Decimal            # per minimal unit (1 wei)
    expiration: float | None = None  # None = eternal
    fetched: float | None = None

    @classmethod
    def static_price(cls, token_price: Decimal, decimals: int) -> "Price":
        return cls(token_price=token_price,
                   unit_price=token_price * Decimal(1).scaleb(-decimals))

    @classmethod
    def from_fetch(cls, token_price: Decimal, fetched: float, decimals: int,
                   validity_s: float) -> "Price":
        return cls(token_price=token_price,
                   unit_price=token_price * Decimal(1).scaleb(-decimals),
                   expiration=fetched + validity_s, fetched=fetched)

    def validate(self, now: float) -> "Price | None":
        """Timed prices expire at (not after) the expiration instant."""
        if self.expiration is not None and now >= self.expiration:
            return None
        return self

    def age(self, now: float) -> float:
        return 0.0 if self.fetched is None else now - self.fetched


class Prices:
    """Per-token price registry with a refresh worker (price_feed/mod.rs)."""

    def __init__(self, tokens: list[TokenInfo], validity_s: float = 600.0,
                 refresh_interval_s: float = 120.0,
                 clock: Callable[[], float] = time.time):
        self.validity_s = validity_s
        self.refresh_interval_s = refresh_interval_s
        self.clock = clock
        self.tokens: dict[str, TokenInfo] = {t.kind: t for t in tokens}
        self._inner: dict[str, Price | None] = {
            t.kind: (Price.static_price(t.static_price, t.decimals)
                     if t.static_price is not None else None)
            for t in tokens}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def price(self, kind: str) -> Price | None:
        """Current valid price, or None if missing/stale (mod.rs:84-91)."""
        with self._lock:
            p = self._inner.get(kind)
        return p.validate(self.clock()) if p is not None else None

    def current_prices(self) -> dict[str, Price | None]:
        return {k: self.price(k) for k in self.tokens}

    def price_ages(self) -> dict[str, float | None]:
        """Seconds since fetch per token; None = never fetched
        (mod.rs:66-82; feeds the price_age metric)."""
        now = self.clock()
        with self._lock:
            return {k: (None if p is None else p.age(now))
                    for k, p in self._inner.items()}

    def update(self) -> None:
        """One fetch round over url-provided tokens (mod.rs:93-110):
        a failed fetch logs and keeps the previous (possibly expiring)
        price rather than clearing it."""
        for kind, info in self.tokens.items():
            if info.fetcher is None:
                continue
            try:
                token_price, fetched = info.fetcher()
            except Exception:  # noqa: BLE001 — warn-and-continue semantics
                continue
            p = Price.from_fetch(Decimal(token_price), fetched,
                                 info.decimals, self.validity_s)
            with self._lock:
                self._inner[kind] = p

    def start(self) -> "Prices":
        """start_price_feed: update -> sleep(refresh_interval) loop."""
        def loop():
            while not self._stop.is_set():
                self.update()
                self._stop.wait(self.refresh_interval_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()


# ---------------------------------------------------------------------------
# fee math (fee.rs)
# ---------------------------------------------------------------------------

@dataclass
class FeeDetails:
    """fee.rs FeeDetails — every cost in native and fee-token units."""

    total_cost_native: int
    total_cost_fee_token: int
    relayer_cost_native: int
    relayer_cost_fee_token: int
    pocket_money_native: int
    pocket_money_fee_token: int
    gas_cost_native: int
    gas_cost_fee_token: int
    commission_native: int
    commission_fee_token: int

    def as_dict(self) -> dict:
        return {k: str(v) for k, v in vars(self).items()}


def round_sf(d: Decimal, digits: int) -> Decimal:
    """Round to ``digits`` significant figures (rust_decimal round_sf)."""
    if d == 0:
        return d
    exponent = d.adjusted() - digits + 1
    return d.quantize(Decimal(1).scaleb(exponent), rounding=ROUND_HALF_EVEN)


def scale_u256(a: int, ratio: Decimal) -> int:
    """a * ratio with the reference's integer pipeline (fee.rs:109-118):
    round the ratio to 20 significant digits, then a * mantissa // 10^scale.
    """
    r = round_sf(ratio, RELATIVE_PRICE_DIGITS)
    sign, digits, exponent = r.as_tuple()
    if sign:
        raise ValueError("negative price ratio")
    mantissa = int("".join(map(str, digits)) or "0")
    if exponent >= 0:
        return a * mantissa * 10 ** exponent
    return a * mantissa // 10 ** (-exponent)


def compute_fee(gas_price: int, required_gas: int, pocket_money: int,
                commission_percent: int, native_token_unit_price: Decimal,
                fee_token_unit_price: Decimal,
                commission_bps: int | None = None) -> FeeDetails:
    """fee.rs:76-107 — relay cost + commission, scaled into the fee token.

    The reference takes a whole-percent commission (fee.rs:90); pass
    ``commission_bps`` for basis-point precision (same integer pipeline,
    denominator 10_000).
    """
    if fee_token_unit_price <= 0:
        raise ValueError("fee token unit price must be positive")
    gas_cost_native = required_gas * gas_price
    relayer_cost_native = gas_cost_native + pocket_money
    if commission_bps is not None:
        commission_native = relayer_cost_native * commission_bps // 10_000
    else:
        commission_native = relayer_cost_native * commission_percent // 100
    total_cost_native = relayer_cost_native + commission_native
    ratio = native_token_unit_price / fee_token_unit_price

    return FeeDetails(
        total_cost_native=total_cost_native,
        total_cost_fee_token=scale_u256(total_cost_native, ratio),
        relayer_cost_native=relayer_cost_native,
        relayer_cost_fee_token=scale_u256(relayer_cost_native, ratio),
        pocket_money_native=pocket_money,
        pocket_money_fee_token=scale_u256(pocket_money, ratio),
        gas_cost_native=gas_cost_native,
        gas_cost_fee_token=scale_u256(gas_cost_native, ratio),
        commission_native=commission_native,
        commission_fee_token=scale_u256(commission_native, ratio),
    )
