"""Keccak-256 (Ethereum flavor): native C++ core with pure-Python fallback.

Host-side hash for the Fiat–Shamir transcript (squeeze = keccak over absorbed
proof bytes — crates/halo2-verifier/templates/Halo2Verifier.sol:104-121) and
protocol secret derivation (crates/shielder-account/src/secrets.rs:39-56).
The native library is built on demand from native/keccak/keccak.cc and loaded
via ctypes; the Python fallback is bit-identical (same Keccak-f[1600], legacy
0x01 padding) and used if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "keccak", "keccak.cc")
_SO = os.path.join(_REPO, "native", "build", "libzkkeccak.so")


def _load_native():
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.zk_keccak256.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                     ctypes.c_char_p]
        lib.zk_keccak256.restype = None
        return lib
    except (OSError, subprocess.CalledProcessError):
        return None


_LIB = _load_native()


# ---------------------------------------------------------------------------
# pure-Python Keccak-f[1600] (fallback + oracle)
# ---------------------------------------------------------------------------

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_MASK = (1 << 64) - 1


def _rotl(x: int, s: int) -> int:
    return ((x << s) | (x >> (64 - s))) & _MASK


def _keccak_f(st: list[int]) -> None:
    for rc in _RC:
        bc = [st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20]
              for i in range(5)]
        for i in range(5):
            t = bc[(i + 4) % 5] ^ _rotl(bc[(i + 1) % 5], 1)
            for j in range(0, 25, 5):
                st[j + i] ^= t
        # rho + pi
        t = st[1]
        pi = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
              15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1]
        rot = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
               27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]
        for i in range(24):
            j = pi[i]
            st[j], t = _rotl(t, rot[i]), st[j]
        # chi
        for j in range(0, 25, 5):
            row = st[j : j + 5]
            for i in range(5):
                st[j + i] = row[i] ^ (~row[(i + 1) % 5] & row[(i + 2) % 5] & _MASK)
        st[0] ^= rc


_RATE = 136


def keccak256_py(data: bytes) -> bytes:
    """Pure-Python Keccak-256 (legacy 0x01 padding)."""
    st = [0] * 25
    buf = bytearray(data)
    buf.append(0x01)
    buf.extend(b"\x00" * ((-len(buf)) % _RATE))
    buf[-1] |= 0x80  # if the 0x01 landed on the block edge this makes 0x81 — correct
    for off in range(0, len(buf), _RATE):
        block = buf[off : off + _RATE]
        for i in range(0, _RATE, 8):
            st[i // 8] ^= int.from_bytes(block[i : i + 8], "little")
        _keccak_f(st)
    return b"".join(st[i].to_bytes(8, "little") for i in range(4))


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (native if available)."""
    if _LIB is not None:
        out = ctypes.create_string_buffer(32)
        _LIB.zk_keccak256(bytes(data), len(data), out)
        return out.raw
    return keccak256_py(data)
