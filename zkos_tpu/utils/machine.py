"""Machine fingerprint for persistent XLA compile caches.

XLA AOT cache entries embed code generated for the *compile* machine's CPU
features; loading them on a host with a different feature set can SIGILL
(jax warns about exactly this when ``jax_persistent_cache`` is enabled).
Committed caches are therefore stored under ``<base>/<fingerprint>/`` where
the fingerprint hashes the CPU feature flags, architecture, and jax
version — a host that didn't build a cache simply sees an empty directory
and compiles fresh, instead of trusting foreign machine code.
"""

from __future__ import annotations

import hashlib
import platform
from pathlib import Path


def _cpu_flags() -> str:
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith(("flags", "Features")):
                return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return platform.processor() or "unknown"


def fingerprint(kind: str = "cpu") -> str:
    """``cpu``: hash of host CPU features (XLA:CPU AOT code is machine
    code for the compile host).  ``device``: hash of jax version + the
    default device kind — serialized TPU executables target the chip,
    not the host CPU, so two hosts driving the same TPU generation share
    a cache safely and SHOULD share it (warm-up survives host changes).
    """
    import jax

    if kind == "device":
        dev = jax.devices()[0]
        key = "|".join(["device", jax.__version__,
                        dev.platform, dev.device_kind])
    else:
        key = "|".join([platform.machine(), jax.__version__, _cpu_flags()])
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def cache_dir(base: str, kind: str = "cpu") -> str:
    """Fingerprint-keyed subdirectory of ``base`` (created on demand)."""
    d = Path(base) / fingerprint(kind)
    d.mkdir(parents=True, exist_ok=True)
    return str(d)
