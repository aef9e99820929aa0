"""Structured relayer configuration: CLI + env + defaults.

The reference resolves a typed ``ServerConfig{logging, network, chain,
keys, operations}`` by merging clap CLI flags, environment variables and
defaults, with signing keys redacted from Debug output
(`crates/shielder-relayer/src/config/mod.rs:24-140`, `cli.rs`,
`tests.rs::config_resolution`).  This module is the analog over
argparse/os.environ: every field resolves CLI > env > default, token
price-feed config parses from JSON, and the resolved object feeds
``Taskmaster`` / ``Prices`` / ``make_http_server`` directly.

Env vars use the ``ZKOS_RELAYER_*`` namespace (the reference's
``RELAYER_*`` env names, e.g. RELAYER_SIGNING_KEYS_ENV).
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import dataclass, field as dc_field
from decimal import Decimal

from . import price_feed as pf

# defaults (config/defaults.rs analog)
DEFAULT_HOST = "0.0.0.0"
DEFAULT_PORT = 4141
DEFAULT_METRICS_PORT = 9615
DEFAULT_BALANCE_MONITOR_INTERVAL_S = 900.0
DEFAULT_RPC_HEALTH_CACHE_VALIDITY_S = 1.0
DEFAULT_NONCE_POLICY = "caching"
DEFAULT_DRY_RUNNING = "optimistic"
DEFAULT_RELAY_GAS = 2_000_000
DEFAULT_RECHARGE_THRESHOLD = 10**18 // 2
DEFAULT_RECHARGE_AMOUNT = 10**18
DEFAULT_PRICE_FEED_VALIDITY_S = 600.0
DEFAULT_PRICE_FEED_REFRESH_S = 120.0
DEFAULT_SERVICE_FEE_PERCENT = 10
DEFAULT_QUOTE_VALIDITY_S = 30.0
DEFAULT_MAX_POCKET_MONEY = 10**17


def _redact(key: str) -> str:
    """KeyConfig Debug impl: show 5-char prefix + 3-char suffix."""
    if len(key) <= 8:
        return "*" * len(key)
    return f"{key[:5]}...{key[-3:]}"


@dataclass(frozen=True)
class NetworkConfig:
    host: str = DEFAULT_HOST
    port: int = DEFAULT_PORT
    metrics_port: int = DEFAULT_METRICS_PORT

    def main_address(self) -> str:
        return f"{self.host}:{self.port}"

    def metrics_address(self) -> str:
        return f"{self.host}:{self.metrics_port}"


@dataclass(frozen=True)
class ChainConfig:
    node_rpc_url: str = "http://localhost:8545"
    shielder_contract_address: int = 0
    relay_gas: int = DEFAULT_RELAY_GAS


@dataclass(frozen=True)
class OperationalConfig:
    balance_monitor_interval_s: float = DEFAULT_BALANCE_MONITOR_INTERVAL_S
    rpc_health_cache_validity_s: float = DEFAULT_RPC_HEALTH_CACHE_VALIDITY_S
    nonce_policy: str = DEFAULT_NONCE_POLICY          # caching | stateless
    dry_running: str = DEFAULT_DRY_RUNNING            # always | optimistic
    recharge_threshold: int = DEFAULT_RECHARGE_THRESHOLD
    recharge_amount: int = DEFAULT_RECHARGE_AMOUNT
    token_config: tuple = ()                          # of pf.TokenInfo
    price_feed_validity_s: float = DEFAULT_PRICE_FEED_VALIDITY_S
    price_feed_refresh_interval_s: float = DEFAULT_PRICE_FEED_REFRESH_S
    service_fee_percent: int = DEFAULT_SERVICE_FEE_PERCENT
    quote_validity_s: float = DEFAULT_QUOTE_VALIDITY_S
    max_pocket_money: int = DEFAULT_MAX_POCKET_MONEY


@dataclass(frozen=True)
class KeyConfig:
    fee_destination_key: str = ""
    signing_keys: tuple = ()

    def __repr__(self) -> str:  # never leak keys into logs
        keys = ", ".join(_redact(k) for k in self.signing_keys)
        return (f"KeyConfig(fee_destination_key="
                f"{_redact(self.fee_destination_key)}, "
                f"signing_keys=[{keys}])")


@dataclass(frozen=True)
class ServerConfig:
    logging_format: str = "text"                      # text | json
    network: NetworkConfig = dc_field(default_factory=NetworkConfig)
    chain: ChainConfig = dc_field(default_factory=ChainConfig)
    operations: OperationalConfig = dc_field(
        default_factory=OperationalConfig)
    keys: KeyConfig = dc_field(default_factory=KeyConfig)


def parse_token_config(raw: str) -> tuple:
    """JSON token list -> TokenInfo tuple.

    Format (the cli.rs token-config analog):
    ``[{"kind": "native", "price_url": "..."},
       {"kind": "erc20", "address": "0x..", "decimals": 10,
        "static_price": "1.23"}]``

    URL-provided entries get a fetcher that raises until a real fetcher
    is installed (no network assumptions in the library).
    """
    def unavailable(url):
        def fetch():
            raise RuntimeError(f"no fetcher installed for {url}")

        return fetch

    out = []
    for entry in json.loads(raw):
        if entry["kind"] == "native":
            kind, decimals = pf.NATIVE, pf.NATIVE_TOKEN_DECIMALS
        else:
            kind = pf.erc20_kind(int(entry["address"], 16))
            decimals = int(entry["decimals"])
        if "static_price" in entry:
            out.append(pf.TokenInfo(kind, decimals=decimals,
                                    static_price=Decimal(
                                        entry["static_price"])))
        else:
            out.append(pf.TokenInfo(kind, decimals=decimals,
                                    fetcher=unavailable(entry["price_url"])))
    return tuple(out)


# field name -> (env var, parser)
_FIELDS = {
    "logging_format": ("ZKOS_RELAYER_LOGGING_FORMAT", str),
    "host": ("ZKOS_RELAYER_HOST", str),
    "port": ("ZKOS_RELAYER_PORT", int),
    "metrics_port": ("ZKOS_RELAYER_METRICS_PORT", int),
    "balance_monitor_interval": ("ZKOS_RELAYER_BALANCE_MONITOR_INTERVAL",
                                 float),
    "rpc_health_cache_validity": ("ZKOS_RELAYER_RPC_HEALTH_CACHE_VALIDITY",
                                  float),
    "node_rpc_url": ("ZKOS_RELAYER_NODE_RPC_URL", str),
    "shielder_contract_address": ("ZKOS_RELAYER_CONTRACT_ADDRESS",
                                  lambda s: int(s, 16)),
    "fee_destination_key": ("ZKOS_RELAYER_FEE_DESTINATION_KEY", str),
    "signing_keys": ("ZKOS_RELAYER_SIGNING_KEYS",
                     lambda s: tuple(s.split(","))),
    "nonce_policy": ("ZKOS_RELAYER_NONCE_POLICY", str),
    "dry_running": ("ZKOS_RELAYER_DRY_RUNNING", str),
    "recharge_threshold": ("ZKOS_RELAYER_RECHARGE_THRESHOLD", int),
    "recharge_amount": ("ZKOS_RELAYER_RECHARGE_AMOUNT", int),
    "relay_gas": ("ZKOS_RELAYER_RELAY_GAS", int),
    "token_config": ("ZKOS_RELAYER_TOKEN_CONFIG", parse_token_config),
    "price_feed_validity": ("ZKOS_RELAYER_PRICE_FEED_VALIDITY", float),
    "price_feed_refresh_interval": (
        "ZKOS_RELAYER_PRICE_FEED_REFRESH_INTERVAL", float),
    "service_fee_percent": ("ZKOS_RELAYER_SERVICE_FEE_PERCENT", int),
    "quote_validity": ("ZKOS_RELAYER_QUOTE_VALIDITY", float),
    "max_pocket_money": ("ZKOS_RELAYER_MAX_POCKET_MONEY", int),
}

_DEFAULTS = {
    "logging_format": "text",
    "host": DEFAULT_HOST,
    "port": DEFAULT_PORT,
    "metrics_port": DEFAULT_METRICS_PORT,
    "balance_monitor_interval": DEFAULT_BALANCE_MONITOR_INTERVAL_S,
    "rpc_health_cache_validity": DEFAULT_RPC_HEALTH_CACHE_VALIDITY_S,
    "node_rpc_url": "http://localhost:8545",
    "shielder_contract_address": 0,
    "fee_destination_key": None,  # required
    "signing_keys": None,         # required
    "nonce_policy": DEFAULT_NONCE_POLICY,
    "dry_running": DEFAULT_DRY_RUNNING,
    "recharge_threshold": DEFAULT_RECHARGE_THRESHOLD,
    "recharge_amount": DEFAULT_RECHARGE_AMOUNT,
    "relay_gas": DEFAULT_RELAY_GAS,
    "token_config": (),
    "price_feed_validity": DEFAULT_PRICE_FEED_VALIDITY_S,
    "price_feed_refresh_interval": DEFAULT_PRICE_FEED_REFRESH_S,
    "service_fee_percent": DEFAULT_SERVICE_FEE_PERCENT,
    "quote_validity": DEFAULT_QUOTE_VALIDITY_S,
    "max_pocket_money": DEFAULT_MAX_POCKET_MONEY,
}


class ConfigError(Exception):
    """Missing required configuration (mod.rs 'Missing required …')."""


def resolve_config(argv: list[str] | None = None,
                   env: dict | None = None) -> ServerConfig:
    """CLI > env > default resolution (config/mod.rs:100-140)."""
    env = os.environ if env is None else env
    parser = argparse.ArgumentParser(prog="zkos-relayer", add_help=True)
    for name in _FIELDS:
        parser.add_argument("--" + name.replace("_", "-"), dest=name,
                            default=None, type=str)
    args = vars(parser.parse_args(argv or []))

    resolved = {}
    for name, (env_var, parse) in _FIELDS.items():
        if args.get(name) is not None:
            resolved[name] = parse(args[name])
        elif env_var in env:
            resolved[name] = parse(env[env_var])
        else:
            default = _DEFAULTS[name]
            if default is None:
                raise ConfigError(
                    f"Missing required configuration: {name} "
                    f"(flag --{name.replace('_', '-')} or env {env_var})")
            resolved[name] = default

    if resolved["nonce_policy"] not in ("caching", "stateless"):
        raise ConfigError(f"bad nonce_policy {resolved['nonce_policy']!r}")
    if resolved["dry_running"] not in ("always", "optimistic"):
        raise ConfigError(f"bad dry_running {resolved['dry_running']!r}")

    return ServerConfig(
        logging_format=resolved["logging_format"],
        network=NetworkConfig(
            host=resolved["host"], port=resolved["port"],
            metrics_port=resolved["metrics_port"]),
        chain=ChainConfig(
            node_rpc_url=resolved["node_rpc_url"],
            shielder_contract_address=resolved["shielder_contract_address"],
            relay_gas=resolved["relay_gas"]),
        operations=OperationalConfig(
            balance_monitor_interval_s=resolved["balance_monitor_interval"],
            rpc_health_cache_validity_s=resolved[
                "rpc_health_cache_validity"],
            nonce_policy=resolved["nonce_policy"],
            dry_running=resolved["dry_running"],
            recharge_threshold=resolved["recharge_threshold"],
            recharge_amount=resolved["recharge_amount"],
            token_config=tuple(resolved["token_config"]),
            price_feed_validity_s=resolved["price_feed_validity"],
            price_feed_refresh_interval_s=resolved[
                "price_feed_refresh_interval"],
            service_fee_percent=resolved["service_fee_percent"],
            quote_validity_s=resolved["quote_validity"],
            max_pocket_money=resolved["max_pocket_money"]),
        keys=KeyConfig(
            fee_destination_key=resolved["fee_destination_key"],
            signing_keys=tuple(resolved["signing_keys"])),
    )
