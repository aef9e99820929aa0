"""Anonymity-revoker operator pipeline: index, collect keys, revoke, reveal.

Mirrors crates/ar-cli's operator flows against the contract sim:

- ``index_events``: scan the chain for Shielder calls in block order and
  persist them into sqlite (the ``events`` table of ar-cli/src/db.rs),
  resuming from a checkpoint row (collect_viewing_keys.rs:24, 60-66);
- ``collect_viewing_keys``: for every ``newAccount*`` event, ElGamal-decrypt
  (c1, c2) with the operator's Grumpkin secret key and record the viewing
  key, with its own block checkpoint (collect_viewing_keys.rs:31-118);
- ``revoke``: match a MAC — ``mac_commitment == hash2(mac_salt, key)`` —
  against the collected keys and, on a hit, tag every event of that account
  (revoke.rs:17-49);
- ``reveal``: given one event, return all events linked to the same viewing
  key (reveal.rs).
"""

from __future__ import annotations

import sqlite3

from ..ops.poseidon2 import hash_ints
from ..protocol import ar

KEYS_CHECKPOINT = "last_keys_block"
EVENTS_CHECKPOINT = "last_events_block"


def init_db(path) -> sqlite3.Connection:
    conn = sqlite3.connect(str(path))
    conn.executescript("""
        CREATE TABLE IF NOT EXISTS viewing_keys (
            key TEXT PRIMARY KEY, block INTEGER);
        CREATE TABLE IF NOT EXISTS events (
            block INTEGER PRIMARY KEY, kind TEXT, note_index INTEGER,
            amount INTEGER, token INTEGER, mac_salt TEXT,
            mac_commitment TEXT, viewing_key TEXT);
        CREATE TABLE IF NOT EXISTS checkpoints (
            name TEXT PRIMARY KEY, block INTEGER);
    """)
    return conn


def _checkpoint(conn, name: str) -> int:
    row = conn.execute(
        "SELECT block FROM checkpoints WHERE name = ?", (name,)).fetchone()
    return row[0] if row else 0


def _set_checkpoint(conn, name: str, block: int):
    conn.execute(
        "INSERT INTO checkpoints(name, block) VALUES(?, ?) "
        "ON CONFLICT(name) DO UPDATE SET block = excluded.block",
        (name, block))
    conn.commit()


def _iter_blocks(sim, from_block: int):
    """(block, event) pairs in block order (registration blocks start at 2)."""
    for i, ev in enumerate(sim.events):
        block = i + 2
        if block >= from_block:
            yield block, ev


def index_events(sim, conn, from_block: int = 0) -> int:
    """Persist all Shielder events into sqlite, resuming from checkpoint."""
    start = max(from_block, _checkpoint(conn, EVENTS_CHECKPOINT) + 1)
    count = 0
    last = start - 1
    for block, ev in _iter_blocks(sim, start):
        conn.execute(
            "INSERT OR REPLACE INTO events"
            "(block, kind, note_index, amount, token, mac_salt,"
            " mac_commitment, viewing_key) VALUES(?,?,?,?,?,?,?,NULL)",
            (block, ev["kind"], ev["index"], ev["amount"], ev["token"],
             hex(ev["mac_salt"]), hex(ev["mac_commitment"])))
        count += 1
        last = block
    _set_checkpoint(conn, EVENTS_CHECKPOINT, last)
    conn.commit()
    return count


def collect_viewing_keys(sim, conn, sk: int, from_block: int = 0) -> int:
    """Decrypt every newAccount* (c1, c2) with the AR secret key.

    Resumable: starts after the sqlite checkpoint, exactly like
    collect_viewing_keys.rs:60-66.  Returns the number of new keys.
    """
    start = max(from_block, _checkpoint(conn, KEYS_CHECKPOINT) + 1)
    count = 0
    last = start - 1
    for block, ev in _iter_blocks(sim, start):
        if ev["kind"].startswith("NewAccount"):
            key = ar.decrypt_viewing_key(ev["sym_c1"], ev["sym_c2"], sk)
            conn.execute(
                "INSERT OR REPLACE INTO viewing_keys(key, block) VALUES(?, ?)",
                (hex(key), block))
            count += 1
        last = block
    _set_checkpoint(conn, KEYS_CHECKPOINT, last)
    conn.commit()
    return count


def revoke(conn, mac_salt: int, mac_commitment: int):
    """Find the viewing key matching mac_commitment == hash2(salt, key)
    (revoke.rs:30-40) and link every event with the same MAC relation."""
    for (key_hex,) in conn.execute("SELECT key FROM viewing_keys"):
        key = int(key_hex, 16)
        if hash_ints([mac_salt, key]) == mac_commitment:
            # tag all events whose MAC matches this key
            for block, salt_hex, com_hex in conn.execute(
                    "SELECT block, mac_salt, mac_commitment FROM events"):
                if hash_ints([int(salt_hex, 16), key]) == int(com_hex, 16):
                    conn.execute(
                        "UPDATE events SET viewing_key = ? WHERE block = ?",
                        (key_hex, block))
            conn.commit()
            return key
    return None


def reveal(conn, block: int) -> list[dict]:
    """All events linked to the same viewing key as the event at `block`
    (reveal.rs:12-27); empty if the key was never collected/revoked."""
    row = conn.execute(
        "SELECT viewing_key FROM events WHERE block = ?", (block,)).fetchone()
    if not row or row[0] is None:
        return []
    out = []
    for blk, kind, idx, amount in conn.execute(
            "SELECT block, kind, note_index, amount FROM events "
            "WHERE viewing_key = ? ORDER BY block", (row[0],)):
        out.append({"block": blk, "kind": kind, "note_index": idx,
                    "amount": amount})
    return out


# ---------------------------------------------------------------------------
# key generation from a mnemonic (ar-cli/src/common.rs:56-68)
# ---------------------------------------------------------------------------
#
# Pipeline: BIP-39 seed (PBKDF2-HMAC-SHA512, 2048 iters, salt "mnemonic" +
# passphrase, 64 bytes) -> keccak256 -> 32-byte ChaCha12 RNG seed ->
# grumpkin scalar via 64 uniform bytes reduced mod the group order (the
# halo2curves Field::random / from_uniform_bytes recipe) -> (sk, sk*G).
# The word list itself is not validated here (no vendored BIP-39 list);
# the reference's tiny-bip39 enforces it client-side.

def mnemonic_to_seed(mnemonic: str, passphrase: str = "") -> bytes:
    """64-byte BIP-39 seed hashed to the 32-byte RNG seed
    (common.rs:56-62: Seed::new then keccak256)."""
    import hashlib
    import unicodedata

    from ..ops.keccak import keccak256

    norm = unicodedata.normalize("NFKD", " ".join(mnemonic.split()))
    salt = ("mnemonic" + unicodedata.normalize("NFKD", passphrase)).encode()
    seed64 = hashlib.pbkdf2_hmac("sha512", norm.encode(), salt, 2048)
    return keccak256(seed64)


def _chacha12_bytes(seed: bytes, n: int) -> bytes:
    """First n bytes of the ChaCha12 keystream (rand_chacha layout:
    96-bit nonce zero, block counter from 0)."""
    from .content_encryption import _quarter

    import struct

    out = bytearray()
    counter = 0
    while len(out) < n:
        st = list(struct.unpack("<4I", b"expand 32-byte k"))
        st += list(struct.unpack("<8I", seed))
        st += [counter & 0xFFFFFFFF, 0, 0, 0]
        working = st[:]
        for _ in range(6):  # 12 rounds = 6 double rounds
            _quarter(working, 0, 4, 8, 12)
            _quarter(working, 1, 5, 9, 13)
            _quarter(working, 2, 6, 10, 14)
            _quarter(working, 3, 7, 11, 15)
            _quarter(working, 0, 5, 10, 15)
            _quarter(working, 1, 6, 11, 12)
            _quarter(working, 2, 7, 8, 13)
            _quarter(working, 3, 4, 9, 14)
        out += struct.pack(
            "<16I", *[(w + s) & 0xFFFFFFFF for w, s in zip(working, st)])
        counter += 1
    return bytes(out[:n])


def seed_to_keypair(seed: bytes):
    """32-byte seed -> (grumpkin sk, pubkey) (common.rs:64-68)."""
    from ..ops import grumpkin_golden as GR

    wide = _chacha12_bytes(seed, 64)
    sk = int.from_bytes(wide, "little") % GR.SCALAR_ORDER
    if sk == 0:  # vanishing probability; skip ahead like redrawing
        sk = 1
    return sk, GR.scalar_mul(sk, GR.GEN)


def keys_from_mnemonic(mnemonic: str, passphrase: str = ""):
    """BIP-39 mnemonic -> AR Grumpkin keypair (ar-cli keygen command)."""
    return seed_to_keypair(mnemonic_to_seed(mnemonic, passphrase))
