"""Password-based content encryption for client state files.

Mirrors crates/content-encryption (lib.rs:13-35): KDF + AEAD with fixed
salt/nonce (the reference uses Argon2 + XChaCha20-Poly1305).  Stdlib-only
substitutions, documented: scrypt (hashlib.scrypt) replaces Argon2 as the
memory-hard KDF; the AEAD is ChaCha20-Poly1305 implemented here from RFC
8439 primitives (pure python — state files are small).
"""

from __future__ import annotations

import hashlib
import struct

_SALT = b"zkOS Shielder salt"  # fixed, like the reference (lib.rs:16)
_NONCE = b"zkos-tpu-non"  # 12 bytes, fixed


def _kdf(password: bytes) -> bytes:
    return hashlib.scrypt(password, salt=_SALT, n=2 ** 14, r=8, p=1, dklen=32)


# -- ChaCha20 (RFC 8439) --

def _rotl32(v, c):
    return ((v << c) | (v >> (32 - c))) & 0xFFFFFFFF


def _quarter(st, a, b, c, d):
    st[a] = (st[a] + st[b]) & 0xFFFFFFFF
    st[d] = _rotl32(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & 0xFFFFFFFF
    st[b] = _rotl32(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b]) & 0xFFFFFFFF
    st[d] = _rotl32(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & 0xFFFFFFFF
    st[b] = _rotl32(st[b] ^ st[c], 7)


def _chacha_block(key: bytes, counter: int, nonce: bytes) -> bytes:
    st = list(struct.unpack("<4I", b"expand 32-byte k"))
    st += list(struct.unpack("<8I", key))
    st += [counter & 0xFFFFFFFF]
    st += list(struct.unpack("<3I", nonce))
    working = st[:]
    for _ in range(10):
        _quarter(working, 0, 4, 8, 12)
        _quarter(working, 1, 5, 9, 13)
        _quarter(working, 2, 6, 10, 14)
        _quarter(working, 3, 7, 11, 15)
        _quarter(working, 0, 5, 10, 15)
        _quarter(working, 1, 6, 11, 12)
        _quarter(working, 2, 7, 8, 13)
        _quarter(working, 3, 4, 9, 14)
    out = [(w + s) & 0xFFFFFFFF for w, s in zip(working, st)]
    return struct.pack("<16I", *out)


def _chacha20(key: bytes, nonce: bytes, data: bytes, counter: int = 1) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 64):
        block = _chacha_block(key, counter + i // 64, nonce)
        chunk = data[i : i + 64]
        out += bytes(a ^ b for a, b in zip(chunk, block))
    return bytes(out)


# -- Poly1305 (RFC 8439) --

def _poly1305(key32: bytes, msg: bytes) -> bytes:
    r = int.from_bytes(key32[:16], "little") & 0x0FFFFFFC0FFFFFFC0FFFFFFC0FFFFFFF
    s = int.from_bytes(key32[16:], "little")
    p = (1 << 130) - 5
    acc = 0
    for i in range(0, len(msg), 16):
        blk = msg[i : i + 16]
        n = int.from_bytes(blk + b"\x01", "little")
        acc = (acc + n) * r % p
    return ((acc + s) & ((1 << 128) - 1)).to_bytes(16, "little")


def _pad16(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 16)


def _aead_encrypt(key: bytes, nonce: bytes, plaintext: bytes) -> bytes:
    otk = _chacha_block(key, 0, nonce)[:32]
    ct = _chacha20(key, nonce, plaintext)
    mac_data = _pad16(b"") + _pad16(ct) + struct.pack("<QQ", 0, len(ct))
    return ct + _poly1305(otk, mac_data)


def _aead_decrypt(key: bytes, nonce: bytes, blob: bytes) -> bytes:
    assert len(blob) >= 16, "ciphertext too short"
    ct, tag = blob[:-16], blob[-16:]
    otk = _chacha_block(key, 0, nonce)[:32]
    mac_data = _pad16(b"") + _pad16(ct) + struct.pack("<QQ", 0, len(ct))
    assert _poly1305(otk, mac_data) == tag, "authentication failed"
    return _chacha20(key, nonce, ct)


def encrypt(content: bytes, password: bytes) -> bytes:
    """Encrypt client state (content-encryption lib.rs:13-24 shape)."""
    return _aead_encrypt(_kdf(password), _NONCE, content)


def decrypt(blob: bytes, password: bytes) -> bytes:
    """Decrypt; raises AssertionError on bad password/tampering."""
    return _aead_decrypt(_kdf(password), _NONCE, blob)
