"""Grumpkin curve + ElGamal + anonymity-revoker flow."""

import random

from zkos_tpu.ops import field_golden as G
from zkos_tpu.ops import grumpkin_golden as GR
from zkos_tpu.ops.poseidon2 import hash_ints
from zkos_tpu.protocol import ar, secrets


def test_generator_on_curve():
    assert GR.is_on_curve(GR.GEN)
    assert GR.GEN[0] == 1
    # group order: SCALAR_ORDER * G = identity (Grumpkin order = Fq modulus)
    assert GR.scalar_mul(GR.SCALAR_ORDER, GR.GEN) is None


def test_group_laws():
    random.seed(1)
    a = random.randrange(1, GR.SCALAR_ORDER)
    b = random.randrange(1, GR.SCALAR_ORDER)
    pa = GR.scalar_mul(a, GR.GEN)
    pb = GR.scalar_mul(b, GR.GEN)
    assert GR.add(pa, pb) == GR.scalar_mul(a + b, GR.GEN)
    assert GR.add(pa, GR.neg(pa)) is None
    assert GR.is_on_curve(pa)


def test_elgamal_roundtrip():
    random.seed(2)
    sk, pk = GR.generate_keys(random.randrange(1, GR.SCALAR_ORDER))
    msg = GR.lift_x(secrets.generate_user_id(777))
    assert msg is not None and GR.is_on_curve(msg)
    k = random.randrange(1, GR.SCALAR_ORDER)
    c1, c2 = GR.encrypt(msg, pk, k)
    assert GR.decrypt(c1, c2, sk) == msg
    # wrong key decrypts to something else
    assert GR.decrypt(c1, c2, (sk + 1) % GR.SCALAR_ORDER) != msg


def test_ar_full_flow():
    """keygen -> user encrypts viewing key -> operator collects -> revoke."""
    sk, pk = ar.keygen_from_seed(b"operator seed")
    blob = ar.serialize_pub_key(pk)
    assert ar.deserialize_pub_key(blob) == pk

    user_id = secrets.generate_user_id(4242)
    vk_point = GR.lift_x(user_id)
    k = 123456789
    c1, c2 = GR.encrypt(vk_point, pk, k)

    viewing_key = ar.decrypt_viewing_key(c1, c2, sk)
    assert viewing_key == user_id

    mac_salt = 999
    mac_commitment = hash_ints([mac_salt, viewing_key])
    assert ar.mac_matches(mac_salt, viewing_key, mac_commitment)
    assert not ar.mac_matches(mac_salt + 1, viewing_key, mac_commitment)


def test_pubkey_rejects_off_curve():
    bad = (5).to_bytes(32, "big") + (7).to_bytes(32, "big")
    try:
        ar.deserialize_pub_key(bad)
        assert False
    except AssertionError as e:
        assert "not on curve" in str(e)
