"""AR operator pipeline: index -> collect -> revoke -> reveal with sqlite
checkpointing (crates/ar-cli analog)."""

from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.protocol import ar, contract
from zkos_tpu.srv import ar_operator as op

VERSION = contract.CONTRACT_VERSION
OK = lambda proof, pub: True


def _setup_sim_with_accounts(n=3):
    sk, pk = ar.keygen_from_seed(b"ar-operator-test-seed")
    sim = contract.ShielderSim(
        verify_new_account=OK, verify_deposit=OK, verify_withdraw=OK,
        ar_pubkey=pk, tree_height=3)
    ids = []
    for i in range(n):
        id_ = 1000 + i
        while GR.lift_x(id_) is None:
            id_ += 1
        m = GR.lift_x(id_)
        c1, c2 = GR.encrypt(m, pk, 777 + i)
        mac_salt = 50 + i
        sim.new_account_native(
            expected_version=VERSION, caller=0xA0 + i, amount=10_000,
            new_note=200 + i, prenullifier=hash_ints([200 + i]),
            sym_c1=c1, sym_c2=c2, mac_salt=mac_salt,
            mac_commitment=hash_ints([mac_salt, id_]), proof=b"ok")
        ids.append(id_)
    return sim, sk, ids


def test_collect_revoke_reveal(tmp_path):
    sim, sk, ids = _setup_sim_with_accounts()
    conn = op.init_db(tmp_path / "ar.db")
    assert op.index_events(sim, conn) == 3
    assert op.collect_viewing_keys(sim, conn, sk) == 3

    # deposit from account 1 (same mac relation) to have a linked event
    mac_salt2 = 99
    sim.deposit_native(
        expected_version=VERSION, caller=0xA1, amount=500,
        old_nullifier_hash=hash_ints([123456]), new_note=300,
        merkle_root=sim.get_merkle_path(0)[-1], mac_salt=mac_salt2,
        mac_commitment=hash_ints([mac_salt2, ids[1]]), proof=b"ok")
    assert op.index_events(sim, conn) == 1  # resumes from checkpoint

    # revoke account 1 via its MAC
    key = op.revoke(conn, 51, hash_ints([51, ids[1]]))
    assert key == ids[1]  # viewing key = x-coordinate = on-curve id

    # reveal: both the newAccount (block 3) and the deposit link to ids[1]
    linked = op.reveal(conn, 3)
    assert [e["kind"] for e in linked] == ["NewAccount", "Deposit"]

    # unrevoked event reveals nothing
    assert op.reveal(conn, 2) == []


def test_collect_checkpoint_resume(tmp_path):
    sim, sk, _ = _setup_sim_with_accounts(2)
    conn = op.init_db(tmp_path / "ar.db")
    assert op.collect_viewing_keys(sim, conn, sk) == 2
    # re-run: nothing new past the checkpoint
    assert op.collect_viewing_keys(sim, conn, sk) == 0
    # new account appears -> only the delta is scanned
    sk2, pk = ar.keygen_from_seed(b"ar-operator-test-seed")
    id_ = 4000
    while GR.lift_x(id_) is None:
        id_ += 1
    c1, c2 = GR.encrypt(GR.lift_x(id_), sim.ar_pubkey, 31337)
    sim.new_account_native(
        expected_version=VERSION, caller=0xB0, amount=100,
        new_note=900, prenullifier=hash_ints([900]), sym_c1=c1, sym_c2=c2,
        mac_salt=7, mac_commitment=hash_ints([7, id_]), proof=b"ok")
    assert op.collect_viewing_keys(sim, conn, sk) == 1


def test_keygen_from_mnemonic_deterministic_and_on_curve():
    """BIP-39 seed -> keccak -> ChaCha12 -> Grumpkin keypair
    (ar-cli/src/common.rs:56-68); deterministic, passphrase-sensitive,
    whitespace-normalized, and the collect/revoke pipeline works with a
    mnemonic-derived key end-to-end."""
    from zkos_tpu.ops import grumpkin_golden as GR
    from zkos_tpu.srv import ar_operator as ar

    m = ("legal winner thank year wave sausage worth useful "
         "legal winner thank yellow")
    sk, pk = ar.keys_from_mnemonic(m)
    assert ar.keys_from_mnemonic(m) == (sk, pk)
    assert ar.keys_from_mnemonic("  " + m.replace(" ", "  ")) == (sk, pk)
    assert ar.keys_from_mnemonic(m, "TREZOR")[0] != sk
    assert GR.is_on_curve(pk) and 0 < sk < GR.SCALAR_ORDER
    # the derived key decrypts what was encrypted to its public half
    msg = GR.scalar_mul(7, GR.GEN)
    c1, c2 = GR.encrypt(msg, pk, ephemeral_k=12345)
    assert GR.decrypt(c1, c2, sk) == msg
