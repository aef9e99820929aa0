"""Service plane: relayer fleet, prover protocol, fee estimator, client."""

from zkos_tpu.ops.grumpkin_golden import GEN as GRUMPKIN_GEN
import http.client
import json
import socket
import threading
import time

import pytest

from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.protocol import contract
from zkos_tpu.protocol.account import ShielderAction
from zkos_tpu.srv import client as cl
from zkos_tpu.srv import fee_estimator as fe
from zkos_tpu.srv import prover_server as ps
from zkos_tpu.srv import relayer as rl

OK_VERIFY = lambda proof, pub: True  # noqa: E731
VERSION = contract.CONTRACT_VERSION


def _sim(**kw):
    return contract.ShielderSim(
        verify_new_account=OK_VERIFY, verify_deposit=OK_VERIFY,
        verify_withdraw=OK_VERIFY, ar_pubkey=GRUMPKIN_GEN, tree_height=3, **kw)


def _seed_account(sim, note=111, pren=None):
    return sim.new_account_native(
        expected_version=VERSION, caller=0xAA, amount=100_000, new_note=note,
        prenullifier=pren if pren is not None else hash_ints([note]),
        sym_c1=(1, 1), sym_c2=(2, 2), mac_salt=1, mac_commitment=2, proof=b"ok")


def _withdraw_request(sim, nullifier_seed, amount=10_000, fee=50):
    root = sim.get_merkle_path(0)[-1]
    return {
        "expected_version": VERSION, "amount": amount,
        "withdrawal_address": 0xBB, "merkle_root": root,
        "old_nullifier_hash": hash_ints([nullifier_seed]),
        "new_note": 222 + nullifier_seed, "proof": b"ok",
        "relayer_address": 0xCC, "relayer_fee": fee,
        "mac_salt": 1, "mac_commitment": 2,
    }


def test_relayer_fleet_end_to_end():
    sim = _sim()
    _seed_account(sim)
    tm = rl.Taskmaster(sim, signer_keys=[0xC1, 0xC2])
    try:
        tasks = [tm.register_new_task(_withdraw_request(sim, i))
                 for i in range(5)]
        for t in tasks:
            assert t.done.wait(10)
            assert t.result["status"] == "ok", t.result
        assert tm.metrics.withdraw_success == 5
        assert sim.balances[0xCC] == 5 * 50
        stages = [s for _, s in tasks[0].trace]
        assert stages[0] == "queued for relay" and stages[-1] == "relay completed"
        # duplicate nullifier -> dry-run failure recorded
        dup = tm.register_new_task(_withdraw_request(sim, 0))
        assert dup.done.wait(10)
        assert dup.result["status"] == "error"
        assert "DuplicatedNullifier" in dup.result["reason"]
        assert tm.metrics.withdraw_dry_run_failure == 1
    finally:
        tm.shutdown()


def test_relayer_http_endpoints():
    sim = _sim()
    _seed_account(sim)
    tm = rl.Taskmaster(sim, signer_keys=[0xC1])
    server = rl.make_http_server(tm)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/health")
        assert json.loads(conn.getresponse().read())["status"] == "healthy"
        conn.request("GET", "/quote_fees")
        quote = json.loads(conn.getresponse().read())
        assert quote["total_fee"] == 2_000_000
        req = _withdraw_request(sim, 9)
        req["proof"] = req["proof"].hex()
        conn.request("POST", "/relay", body=json.dumps(req))
        resp = json.loads(conn.getresponse().read())
        assert resp["result"]["status"] == "ok"
        conn.request("GET", "/metrics")
        metrics = conn.getresponse().read().decode()
        assert "zkos_relayer_withdraw_success 1" in metrics
    finally:
        server.shutdown()
        tm.shutdown()


def test_prover_protocol_roundtrip():
    def prove_fn(circuit_type, witness):
        assert circuit_type == "Withdraw"
        return b"proof-" + str(witness["x"]).encode(), [witness["x"] + 1]

    srv_sock, cli_sock = socket.socketpair()
    server = ps.ProverServer(prove_fn=prove_fn)
    server.serve_in_thread(srv_sock)
    client = ps.ProverClient(cli_sock)
    assert client.ping()
    key = client.tee_public_key()
    assert key["attestation"]
    proof, pub = client.generate_proof("Withdraw", {"x": 41})
    assert proof == b"proof-41" and pub == [42]
    with pytest.raises(RuntimeError):
        client.generate_proof("Bogus", {"x": 1})


def test_fee_estimator_dry_runs():
    """Estimation = concurrent EstimateGas dry-runs of seeded calls
    (fee-estimator src/fees.rs:23-67), not static constants."""
    sim = _sim()
    _seed_account(sim, note=901)
    root = sim.get_merkle_path(0)[-1]
    seeded = {
        "new_account": fe.SeededCall("new_account_native", dict(
            expected_version=VERSION, caller=0xAA, amount=5_000,
            new_note=902, prenullifier=hash_ints([902]), sym_c1=(1, 1),
            sym_c2=(2, 2), mac_salt=1, mac_commitment=2, proof=b"ok")),
        "deposit": fe.SeededCall("deposit_native", dict(
            expected_version=VERSION, caller=0xAA, amount=700,
            old_nullifier_hash=hash_ints([77]), new_note=903,
            merkle_root=root, mac_salt=1, mac_commitment=2, proof=b"ok")),
        # a deliberately reverting call surfaces in .errors, not .estimates
        "bad": fe.SeededCall("deposit_native", dict(
            expected_version=VERSION, caller=0xAA, amount=0,
            old_nullifier_hash=1, new_note=1, merkle_root=root,
            mac_salt=1, mac_commitment=2, proof=b"ok")),
    }
    est = fe.FeeEstimator(sim=sim, seeded_calls=seeded, gas_price_fn=lambda: 3)
    est.refresh()
    assert est.estimates["new_account"]["gas"] > 642_011  # verifier + tree
    assert est.estimates["new_account"]["fee"] == \
        est.estimates["new_account"]["gas"] * 3
    assert est.estimates["deposit"]["gas"] > est.estimates["new_account"]["gas"] - 200_000
    assert "bad" not in est.estimates and "ZeroAmount" in est.errors["bad"]
    # dry-runs must not mutate live state
    assert sim.nullifiers.get(hash_ints([902]), 0) == 0
    server = fe.make_http_server(est)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/get_fees")
        fees = json.loads(conn.getresponse().read())
        assert fees["deposit"]["gas"] == est.estimates["deposit"]["gas"]
    finally:
        server.shutdown()


def test_client_state_file_and_recovery(tmp_path):
    from zkos_tpu.protocol import secrets

    id_ = secrets.generate_user_id(31337)
    sim = _sim()
    # on-chain: new account then a deposit, nullifiers per the chain rule
    _seed_account(sim, note=501, pren=cl.expected_nullifier_hash(id_, 0))
    sim.deposit_native(
        expected_version=VERSION, caller=0xAA, amount=20_000,
        old_nullifier_hash=cl.expected_nullifier_hash(id_, 1), new_note=502,
        merkle_root=sim.get_merkle_path(0)[-1], mac_salt=1, mac_commitment=2,
        proof=b"ok")

    acc = cl.recover_state(id_, sim)
    assert acc.nonce == 2
    assert acc.shielded_amount == 120_000
    assert [a.kind for a in acc.history] == ["new_account", "deposit"]

    state = cl.ClientState(account=acc)
    path = str(tmp_path / "state.enc")
    state.save(path, b"pw")
    loaded = cl.ClientState.load(path, b"pw")
    assert loaded.account == acc
    with pytest.raises(AssertionError):
        cl.ClientState.load(path, b"wrong")


def test_nonce_manager_conflict_and_resync():
    """Caching-provider nonce race -> SignerConflict -> resync recovers
    (shielder-contract/src/lib.rs:50-61, providers.rs)."""
    nm = rl.NonceManager("caching")
    s = 0x51
    n0 = nm.next_nonce(s)
    n1 = nm.next_nonce(s)  # raced: cached counter advanced twice
    nm.submit(s, n0)
    # a second relayer (stateless view) stole the next slot on chain
    nm.chain_nonces[s] += 1
    with pytest.raises(rl.SignerConflict, match="nonce"):
        nm.submit(s, n1)
    assert rl.classify_submit_error("RPC: nonce too low") == "SignerConflict"
    assert rl.classify_submit_error("already known") == "SignerConflict"
    assert rl.classify_submit_error("out of gas") == "Other"
    nm.resync(s)
    n2 = nm.next_nonce(s)
    nm.submit(s, n2)  # recovered


def test_monitors_and_gauges():
    sim = _sim()
    _seed_account(sim, note=801)
    tm = rl.Taskmaster(sim, signer_keys=[0xC0, 0xC1])
    try:
        sim.balances[0xC0] = 5_000
        tm.balance_monitor.sample()
        out = tm.metrics.render()
        assert 'signer_balances{id="0xc0"} 5000' in out
        assert "fee_destination_balance" in out
        assert tm.rpc_monitor.healthy()
        sim.paused = True
        time.sleep(1.1)  # cached validity expires (rpc_monitor.rs)
        assert not tm.rpc_monitor.healthy()
    finally:
        sim.paused = False
        tm.shutdown()


def test_relayer_openapi_and_unhealthy():
    sim = _sim()
    _seed_account(sim, note=821)
    tm = rl.Taskmaster(sim, signer_keys=[0xC1])
    server = rl.make_http_server(tm)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/api-docs/openapi.json")
        doc = json.loads(conn.getresponse().read())
        assert doc["info"]["title"] == "zkos-relayer"
        assert "/relay" in doc["paths"]
        sim.paused = True
        time.sleep(1.1)  # rpc monitor cache TTL
        conn.request("GET", "/health")
        assert conn.getresponse().status == 503
    finally:
        sim.paused = False
        server.shutdown()
        tm.shutdown()


def test_shielder_user_call_types():
    """Call / DryRun / EstimateGas / Submit strategies
    (shielder-contract call_type.rs:11-82 analog)."""
    from zkos_tpu.srv.contract_client import ShielderUser

    sim = _sim()
    user = ShielderUser(sim=sim, signer=0xD7)
    na_kwargs = dict(
        expected_version=VERSION, caller=0xD7, amount=9_000, new_note=611,
        prenullifier=hash_ints([611]), sym_c1=(1, 1), sym_c2=(2, 2),
        mac_salt=1, mac_commitment=2, proof=b"ok")
    # EstimateGas / DryRun leave no state
    gas = user.estimate_gas("new_account_native", **na_kwargs)
    assert gas > 642_011
    assert user.dry_run("new_account_native", **na_kwargs) == 0
    assert len(sim.tree) == 0
    # Submit mutates and consumes the nonce
    idx = user.submit("new_account_native", **na_kwargs)
    assert idx == 0 and len(sim.tree) == 1
    assert user.nonces.chain_nonces[0xD7] == 1
    # Call views
    assert user.nullifier_block(hash_ints([611])) > 0
    assert user.current_merkle_root() == user.get_merkle_path(0)[-1]
    # nonce race -> SignerConflict -> retry resyncs and lands
    user.nonces.local_nonces[0xD7] = 5  # simulate a stale cached provider
    wd = dict(expected_version=VERSION, amount=500, withdrawal_address=0xBB,
              merkle_root=user.current_merkle_root(),
              old_nullifier_hash=hash_ints([9]), new_note=612, proof=b"ok",
              relayer_address=0xCC, relayer_fee=10, mac_salt=1,
              mac_commitment=2)
    with pytest.raises(rl.SignerConflict):
        user.submit("withdraw_native", **wd)
    assert user.submit_with_retry("withdraw_native", **wd) == 1


# --------------------------------------------------------------------------
# price feed + cross-token fees (fee.rs:76-118, src/price_feed/)
# --------------------------------------------------------------------------

from decimal import Decimal  # noqa: E402

from zkos_tpu.srv import price_feed as pf  # noqa: E402

USDC = pf.erc20_kind(0x1234)


def _prices(clock, native=Decimal("2000"), usdc=Decimal("1"),
            validity=600.0):
    """Native (18 dec) fetched; USDC (6 dec) fetched; both timed."""
    p = pf.Prices(
        [pf.TokenInfo(pf.NATIVE, fetcher=lambda: (native, clock())),
         pf.TokenInfo(USDC, decimals=6, fetcher=lambda: (usdc, clock()))],
        validity_s=validity, clock=clock)
    p.update()
    return p


def test_compute_fee_cross_token_scaling():
    """1 native = $2000 (18 dec), 1 USDC = $1 (6 dec): 1 wei of relay cost
    = 2000/1e18 / (1/1e6) = 2e-9 USDC units (fee.rs:109-118)."""
    native_unit = Decimal("2000").scaleb(-18)
    usdc_unit = Decimal("1").scaleb(-6)
    d = pf.compute_fee(gas_price=10, required_gas=1_000_000,
                       pocket_money=5_000_000, commission_percent=10,
                       native_token_unit_price=native_unit,
                       fee_token_unit_price=usdc_unit)
    assert d.gas_cost_native == 10_000_000
    assert d.relayer_cost_native == 15_000_000
    assert d.commission_native == 1_500_000
    assert d.total_cost_native == 16_500_000
    # 16_500_000 wei * 2e-9 = 0.033 USDC units -> floors to 0 at this scale;
    # scale up to a realistic gas price to see nonzero token amounts
    d2 = pf.compute_fee(gas_price=10**9, required_gas=1_000_000,
                        pocket_money=0, commission_percent=0,
                        native_token_unit_price=native_unit,
                        fee_token_unit_price=usdc_unit)
    # 1e15 wei = 0.001 native = $2 = 2_000_000 USDC units
    assert d2.total_cost_fee_token == 2_000_000


def test_scale_u256_matches_reference_rounding():
    # fee.rs scale_u256: round ratio to 20 sig digits, a*mantissa//10^scale
    assert pf.scale_u256(10**18, Decimal("0.5")) == 5 * 10**17
    assert pf.scale_u256(3, Decimal("1") / Decimal("3")) == 0
    # ratio rounds to 20 significant digits first, so the 21st digit of
    # the product is lost (reference round_sf(RELATIVE_PRICE_DIGITS))
    assert pf.scale_u256(10**21, Decimal("1") / Decimal("3")) \
        == 333333333333333333330
    assert pf.scale_u256(7, Decimal(4)) == 28


def test_price_feed_staleness_and_ages():
    now = [1000.0]
    clock = lambda: now[0]  # noqa: E731
    prices = _prices(clock, validity=60.0)
    assert prices.price(pf.NATIVE) is not None
    assert prices.price_ages()[pf.NATIVE] == 0.0
    now[0] += 59.9
    assert prices.price(pf.NATIVE) is not None
    now[0] += 0.2  # past validity -> stale (price.rs validate)
    assert prices.price(pf.NATIVE) is None
    assert prices.price(USDC) is None
    # ages keep reporting (feeds price_age metric even when expired)
    assert prices.price_ages()[pf.NATIVE] == pytest.approx(60.1)
    prices.update()  # refresh -> valid again
    assert prices.price(pf.NATIVE) is not None


def test_quote_rejects_stale_price_and_erc20_quote_scales():
    now = [0.0]
    clock = lambda: now[0]  # noqa: E731
    prices = _prices(clock, native=Decimal("2000"), usdc=Decimal("1"))
    fc = rl.FeeConfig(relay_gas=1_000_000, gas_price=10**9,
                      commission_bps=250)  # 2.5%
    q = fc.quote(prices, fee_token=USDC)
    # relay cost 1e15 wei; commission 2.5e13; total 1.025e15 native
    assert q["total_fee"] == 1_025_000_000_000_000
    assert int(q["fee_details"]["total_cost_fee_token"]) == 2_050_000
    assert q["price_details"]["fee_token_price"] == "1"
    now[0] += 1e9  # all prices stale
    with pytest.raises(rl.StalePrice):
        fc.quote(prices, fee_token=USDC)


def test_taskmaster_price_metrics_and_post_quote():
    sim = _sim()
    now = [0.0]
    clock = lambda: now[0]  # noqa: E731
    prices = _prices(clock)
    tm = rl.Taskmaster(sim, signer_keys=[0xC1], prices=prices)
    server = rl.make_http_server(tm)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/quote_fees",
                     body=json.dumps({"fee_token": USDC,
                                      "pocket_money": 0}))
        q = json.loads(conn.getresponse().read())
        assert "fee_details" in q and "price_details" in q
        conn.request("GET", "/metrics")
        metrics = conn.getresponse().read().decode()
        assert 'zkos_relayer_price_age{id="native"} 0.0' in metrics
        assert 'zkos_relayer_expired_price{id="native"} 0' in metrics
        # expire the feed: quote via HTTP -> 500, expired gauge flips
        now[0] += 1e9
        conn.request("GET", "/quote_fees")
        assert conn.getresponse().status == 500
        conn.request("POST", "/quote_fees",
                     body=json.dumps({"fee_token": USDC}))
        assert conn.getresponse().status == 500
    finally:
        server.shutdown()
        tm.shutdown()


def test_price_feed_worker_refreshes():
    calls = []

    def fetcher():
        calls.append(1)
        return Decimal("3"), time.time()

    prices = pf.Prices([pf.TokenInfo(pf.NATIVE, fetcher=fetcher)],
                       validity_s=600, refresh_interval_s=0.05)
    prices.start()
    try:
        deadline = time.time() + 5
        while len(calls) < 2 and time.time() < deadline:
            time.sleep(0.02)
        assert len(calls) >= 2  # the worker loops update->sleep
        assert prices.price(pf.NATIVE).token_price == Decimal("3")
    finally:
        prices.stop()


# --------------------------------------------------------------------------
# TEE attestation (nitro-attestation analog: verify.ts steps 1-8)
# --------------------------------------------------------------------------

from zkos_tpu.srv import attestation as att  # noqa: E402


def _tee_pair(server=None):
    import socket as sk
    a, b = sk.socketpair()
    srv = server or ps.ProverServer(
        prove_fn=lambda ct, w: (b"\x01\x02", [1, 2, 3]))
    srv.serve_in_thread(a)
    return srv, b


def test_attestation_verifies_and_proof_flows():
    srv, sock = _tee_pair()
    expected = att.compute_pcrs(srv.module_id,
                                {c: 1 for c in ps.CIRCUIT_TYPES})
    client = ps.ProverClient(sock, root_pk=srv.ca.root_pk,
                             expected_pcrs=expected)
    proof, pub = client.generate_proof("Deposit", {"x": 1})
    assert proof == b"\x01\x02" and pub == [1, 2, 3]
    assert client._verified_key == srv.pk


def test_attestation_rejects_wrong_root():
    srv, sock = _tee_pair()
    from zkos_tpu.ops import grumpkin_golden as GR

    wrong_root = GR.scalar_mul(0xBAD, GR.GEN)
    client = ps.ProverClient(sock, root_pk=wrong_root)
    with pytest.raises(att.AttestationError, match="chain"):
        client.tee_public_key()


def test_attestation_rejects_pcr_mismatch():
    srv, sock = _tee_pair()
    client = ps.ProverClient(sock, root_pk=srv.ca.root_pk,
                             expected_pcrs={"0": "ff" * 32})
    with pytest.raises(att.AttestationError, match="pcr"):
        client.tee_public_key()


def test_attestation_rejects_tampered_document_and_key_substitution():
    from zkos_tpu.ops import grumpkin_golden as GR

    ca = att.PlatformCA()
    enclave_pk = GR.scalar_mul(0xA11CE, GR.GEN)
    doc = att.build_document(ca, "mod", enclave_pk, {"Deposit": 1})
    # baseline verifies
    assert att.verify_document(doc, ca.root_pk) == enclave_pk
    # tampering with the bound public key breaks the signature
    bad = dict(doc)
    other = GR.scalar_mul(0x666, GR.GEN)
    bad["public_key_x"], bad["public_key_y"] = other
    with pytest.raises(att.AttestationError, match="signature"):
        att.verify_document(bad, ca.root_pk)
    # missing fields -> structure error
    with pytest.raises(att.AttestationError, match="structure"):
        att.verify_document({"module_id": "x"}, ca.root_pk)
    # server claiming a different key than attested -> binding error
    srv = ps.ProverServer(prove_fn=lambda ct, w: (b"", []))
    srv.pk = other  # substitute after attestation was built
    _, sock = _tee_pair(server=srv)
    client = ps.ProverClient(sock, root_pk=srv.ca.root_pk)
    with pytest.raises(att.AttestationError, match="binding"):
        client.tee_public_key()


def test_attestation_expiry():
    from zkos_tpu.ops import grumpkin_golden as GR

    ca = att.PlatformCA()
    pk = GR.scalar_mul(7, GR.GEN)
    doc = att.build_document(ca, "m", pk, {}, timestamp=time.time() - 3600)
    with pytest.raises(att.AttestationError, match="expired"):
        att.verify_document(doc, ca.root_pk, max_age_s=60)
    assert att.verify_document(doc, ca.root_pk, max_age_s=7200) == pk


# --------------------------------------------------------------------------
# structured config (config/mod.rs + tests.rs::config_resolution)
# --------------------------------------------------------------------------

from zkos_tpu.srv import config as cfg  # noqa: E402


def test_config_resolution_cli_env_default_mix():
    """Every source wins at its precedence: CLI > env > default."""
    env = {
        "ZKOS_RELAYER_PORT": "1234",                      # env
        "ZKOS_RELAYER_SIGNING_KEYS": "key1aaaaa,key2bbbbb",
        "ZKOS_RELAYER_FEE_DESTINATION_KEY": "key0ccccc",
        "ZKOS_RELAYER_RECHARGE_AMOUNT": str(10**18),
        "ZKOS_RELAYER_PRICE_FEED_VALIDITY": "15",
    }
    argv = ["--metrics-port", "5678",                     # CLI
            "--logging-format", "json",
            "--dry-running", "always",
            "--quote-validity", "11",
            "--relay-gas", str(cfg.DEFAULT_RELAY_GAS + 1),
            "--token-config", json.dumps([
                {"kind": "native", "price_url": "https://price.feed"},
                {"kind": "erc20", "address": "0x2222", "decimals": 10,
                 "static_price": "1.23"},
            ])]
    c = cfg.resolve_config(argv, env)
    assert c.logging_format == "json"
    assert c.network.host == cfg.DEFAULT_HOST                 # default
    assert c.network.port == 1234                             # env
    assert c.network.metrics_port == 5678                     # CLI
    assert c.network.main_address() == "0.0.0.0:1234"
    assert c.chain.relay_gas == cfg.DEFAULT_RELAY_GAS + 1
    assert c.operations.dry_running == "always"
    assert c.operations.recharge_amount == 10**18
    assert c.operations.recharge_threshold == \
        cfg.DEFAULT_RECHARGE_THRESHOLD
    assert c.operations.price_feed_validity_s == 15.0
    assert c.operations.quote_validity_s == 11.0
    assert c.keys.signing_keys == ("key1aaaaa", "key2bbbbb")
    # token config parsed into TokenInfo entries
    toks = c.operations.token_config
    assert toks[0].kind == "native" and toks[0].fetcher is not None
    from decimal import Decimal as D
    assert toks[1].kind == "erc20:0x2222" and toks[1].decimals == 10
    assert toks[1].static_price == D("1.23")


def test_config_missing_required_and_validation():
    with pytest.raises(cfg.ConfigError, match="signing_keys"):
        cfg.resolve_config([], {"ZKOS_RELAYER_FEE_DESTINATION_KEY": "k0"})
    with pytest.raises(cfg.ConfigError, match="nonce_policy"):
        cfg.resolve_config(
            ["--nonce-policy", "bogus"],
            {"ZKOS_RELAYER_FEE_DESTINATION_KEY": "k0aaaaaaa",
             "ZKOS_RELAYER_SIGNING_KEYS": "k1aaaaaaa"})


def test_config_key_redaction():
    """Signing keys never appear in repr (KeyConfig Debug analog)."""
    k = cfg.KeyConfig(fee_destination_key="supersecretkey0",
                      signing_keys=("supersecretkey1",))
    r = repr(k)
    assert "supersecretkey1" not in r and "supersecretkey0" not in r
    assert "super...ey1" in r


def test_taskmaster_from_config_boots_and_relays():
    env = {"ZKOS_RELAYER_FEE_DESTINATION_KEY": "0xF0",
           "ZKOS_RELAYER_SIGNING_KEYS": "0xC1,0xC2",
           "ZKOS_RELAYER_DRY_RUNNING": "always",
           "ZKOS_RELAYER_SERVICE_FEE_PERCENT": "2"}
    c = cfg.resolve_config([], env)
    sim = _sim()
    _seed_account(sim)
    tm = rl.Taskmaster.from_config(sim, c)
    try:
        assert tm.fee_config.commission_bps == 200
        assert tm._always_dry_run
        t = tm.register_new_task(_withdraw_request(sim, 0))
        assert t.done.wait(10) and t.result["status"] == "ok"
        q = tm.quote_fees()
        assert q["commission"] == q["base_fee"] * 2 // 100
    finally:
        tm.shutdown()
