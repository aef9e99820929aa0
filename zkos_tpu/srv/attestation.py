"""TEE attestation documents — the Nitro-attestation analog.

The reference's "light" SDK verifies a full AWS Nitro attestation before
trusting the TEE prover's public key: CBOR/COSE signature, certificate
chain to the pinned AWS root, and PCR measurements
(`ts/shielder-sdk-crypto-wasm-light/src/nitro-attestation/verify.ts`,
steps 1-8).  This module reproduces that trust pipeline with this repo's
own primitives (no NSM hardware exists here — documented substitution):

- signatures are Schnorr over Grumpkin with a keccak challenge
  (the COSE ECDSA-P384 analog),
- the certificate chain is root -> intermediate -> leaf, each link a
  signature over the child's public key + role (the X.509 chain analog;
  the verifier pins the ROOT key like the AWS root cert),
- PCR measurements are keccak digests of the enclave identity
  (module id + circuit versions), checked against expected values
  (pcr.ts verifyPCRMeasurements),
- the document binds the enclave's ECIES public key, so a verified
  document transfers trust to the encryption channel exactly like the
  reference (types.ts AttestationDocument.public_key).

Verification failure modes mirror verify.ts: structure, chain,
signature, PCR mismatch — each raises ``AttestationError`` with the
failing step named.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from ..ops import grumpkin_golden as GR
from ..ops.keccak import keccak256

ORDER = GR.SCALAR_ORDER


class AttestationError(Exception):
    """Attestation verification failed (step named in the message)."""


# ---------------------------------------------------------------------------
# Schnorr over Grumpkin (the COSE signature analog)
# ---------------------------------------------------------------------------

def _point_bytes(pt) -> bytes:
    return pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def _challenge(r_pub, pubkey, msg: bytes) -> int:
    return int.from_bytes(
        keccak256(_point_bytes(r_pub) + _point_bytes(pubkey) + msg),
        "big") % ORDER


def sign(sk: int, msg: bytes, nonce: int) -> dict:
    """Schnorr: R = k*G, s = k + e*sk with e = H(R || PK || msg)."""
    k = nonce % ORDER
    assert k != 0
    r_pub = GR.scalar_mul(k, GR.GEN)
    pubkey = GR.scalar_mul(sk, GR.GEN)
    e = _challenge(r_pub, pubkey, msg)
    s = (k + e * sk) % ORDER
    return {"rx": r_pub[0], "ry": r_pub[1], "s": s}


def verify_sig(pubkey, msg: bytes, sig: dict) -> bool:
    """s*G == R + e*PK."""
    try:
        r_pub = (sig["rx"], sig["ry"])
        if not GR.is_on_curve(r_pub) or not GR.is_on_curve(pubkey):
            return False
        lhs = GR.scalar_mul(sig["s"] % ORDER, GR.GEN)
        e = _challenge(r_pub, pubkey, msg)
        rhs = GR.add(r_pub, GR.scalar_mul(e, pubkey))
        return lhs == rhs
    except (KeyError, TypeError):
        return False


# ---------------------------------------------------------------------------
# certificate chain (root -> intermediate -> leaf)
# ---------------------------------------------------------------------------

def _cert_msg(pubkey, role: str) -> bytes:
    return b"zkos-tee-cert\x00" + role.encode() + b"\x00" + _point_bytes(pubkey)


@dataclass
class PlatformCA:
    """The attestation signing hierarchy (AWS cert infrastructure analog).

    In production the root key lives with the platform operator and only
    its PUBLIC half ships in clients; the dev default mirrors the
    reference's testing setup.
    """

    root_sk: int = 0x12007
    intermediate_sk: int = 0x1D1E5
    leaf_sk: int = 0x1EAF5

    def __post_init__(self):
        self.root_pk = GR.scalar_mul(self.root_sk % ORDER, GR.GEN)
        self.intermediate_pk = GR.scalar_mul(
            self.intermediate_sk % ORDER, GR.GEN)
        self.leaf_pk = GR.scalar_mul(self.leaf_sk % ORDER, GR.GEN)

    def cabundle(self) -> list[dict]:
        """[root->intermediate, intermediate->leaf] signature links."""
        return [
            {"subject_x": self.intermediate_pk[0],
             "subject_y": self.intermediate_pk[1],
             "role": "intermediate",
             "sig": sign(self.root_sk,
                         _cert_msg(self.intermediate_pk, "intermediate"),
                         nonce=0x101)},
            {"subject_x": self.leaf_pk[0], "subject_y": self.leaf_pk[1],
             "role": "leaf",
             "sig": sign(self.intermediate_sk,
                         _cert_msg(self.leaf_pk, "leaf"), nonce=0x102)},
        ]


# ---------------------------------------------------------------------------
# PCR measurements
# ---------------------------------------------------------------------------

def compute_pcrs(module_id: str, circuit_versions: dict) -> dict:
    """PCR0..2: enclave-image-style measurements (pcr.ts analog).

    PCR0 = code identity, PCR1 = config, PCR2 = application (circuit
    version map) — all keccak digests, hex-encoded like the reference.
    """
    pcr0 = keccak256(b"zkos-tee-image\x00" + module_id.encode())
    pcr1 = keccak256(b"zkos-tee-config\x00" + module_id.encode())
    pcr2 = keccak256(b"zkos-tee-app\x00" + json.dumps(
        circuit_versions, sort_keys=True).encode())
    return {"0": pcr0.hex(), "1": pcr1.hex(), "2": pcr2.hex()}


# ---------------------------------------------------------------------------
# document build / verify
# ---------------------------------------------------------------------------

def _payload_bytes(doc: dict) -> bytes:
    """Canonical signed payload (COSE Sig_structure analog)."""
    body = {k: doc[k] for k in
            ("module_id", "timestamp", "pcrs", "public_key_x",
             "public_key_y")}
    return b"zkos-tee-attestation\x00" + json.dumps(
        body, sort_keys=True).encode()


def build_document(ca: PlatformCA, module_id: str, enclave_pubkey,
                   circuit_versions: dict,
                   timestamp: float | None = None) -> dict:
    """The enclave-side NSM `get_attestation_document` analog."""
    doc = {
        "module_id": module_id,
        "timestamp": timestamp if timestamp is not None else time.time(),
        "pcrs": compute_pcrs(module_id, circuit_versions),
        "public_key_x": enclave_pubkey[0],
        "public_key_y": enclave_pubkey[1],
        "cabundle": ca.cabundle(),
        "certificate": {"x": ca.leaf_pk[0], "y": ca.leaf_pk[1]},
    }
    doc["signature"] = sign(ca.leaf_sk, _payload_bytes(doc), nonce=0x103)
    return doc


def verify_document(doc: dict, root_pk, expected_pcrs: dict | None = None,
                    max_age_s: float | None = None) -> tuple[int, int]:
    """Full verification pipeline (verify.ts steps 2-8).

    Returns the attested enclave public key on success; raises
    ``AttestationError`` naming the failed step otherwise.
    """
    # structure (validation.ts)
    for field in ("module_id", "timestamp", "pcrs", "public_key_x",
                  "public_key_y", "cabundle", "certificate", "signature"):
        if field not in doc:
            raise AttestationError(f"structure: missing field {field!r}")
    if max_age_s is not None and time.time() - doc["timestamp"] > max_age_s:
        raise AttestationError("structure: attestation document expired")

    # certificate chain to the pinned root (certificate.ts)
    chain = doc["cabundle"]
    if not chain:
        raise AttestationError("chain: empty cabundle")
    signer = tuple(root_pk)
    for link in chain:
        subject = (link["subject_x"], link["subject_y"])
        if not verify_sig(signer, _cert_msg(subject, link["role"]),
                          link["sig"]):
            raise AttestationError(
                f"chain: bad signature on {link['role']} certificate")
        signer = subject
    leaf = (doc["certificate"]["x"], doc["certificate"]["y"])
    if signer != leaf:
        raise AttestationError("chain: leaf does not terminate cabundle")

    # document signature by the leaf (cose.ts)
    if not verify_sig(leaf, _payload_bytes(doc), doc["signature"]):
        raise AttestationError("signature: document signature invalid")

    # PCR measurements (pcr.ts)
    if expected_pcrs:
        for idx, want in expected_pcrs.items():
            got = doc["pcrs"].get(str(idx))
            if got != want:
                raise AttestationError(
                    f"pcr: PCR{idx} mismatch (got {got}, want {want})")

    return (doc["public_key_x"], doc["public_key_y"])
