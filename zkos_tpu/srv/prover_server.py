"""Remote prover service — the TEE prover plane.

Mirrors tee/crates/shielder-prover-common + -server + -tee (SURVEY.md §2.0):
a length-prefixed JSON protocol (vsock framing analog, vsock.rs) with
``Ping`` / ``TeePublicKey`` / ``GenerateProof`` requests
(protocol.rs:23-58), a ``CircuitType`` tag (:63-68), and end-to-end
encryption of the witness payload to the prover's keypair — ECIES over
Grumpkin with a keccak-derived ChaCha20-Poly1305 session key replacing the
reference's AWS-Nitro-specific stack (documented substitution; the
attestation document is a stub field).

Runs over any socketpair / TCP / unix socket (the enclave boundary analog).
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from dataclasses import dataclass

from ..ops import grumpkin_golden as GR
from ..ops.keccak import keccak256
from . import attestation as att
from .content_encryption import _aead_decrypt, _aead_encrypt

CIRCUIT_TYPES = ("NewAccount", "Deposit", "Withdraw")  # protocol.rs:63-68


# -- framing (length-prefixed, vsock.rs analog) --

def send_msg(sock: socket.socket, obj: dict):
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack("<I", len(data)) + data)


def recv_msg(sock: socket.socket) -> dict:
    hdr = _recv_exact(sock, 4)
    (length,) = struct.unpack("<I", hdr)
    return json.loads(_recv_exact(sock, length))


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


# -- ECIES over Grumpkin --

def ecies_encrypt(pubkey, plaintext: bytes, ephemeral_scalar: int) -> dict:
    eph_pub = GR.scalar_mul(ephemeral_scalar, GR.GEN)
    shared = GR.scalar_mul(ephemeral_scalar, pubkey)
    key = keccak256(shared[0].to_bytes(32, "big") + shared[1].to_bytes(32, "big"))
    ct = _aead_encrypt(key, b"zkos-prover\x00", plaintext)
    return {"eph_x": eph_pub[0], "eph_y": eph_pub[1], "ct": ct.hex()}


def ecies_decrypt(sk: int, blob: dict) -> bytes:
    shared = GR.scalar_mul(sk, (blob["eph_x"], blob["eph_y"]))
    key = keccak256(shared[0].to_bytes(32, "big") + shared[1].to_bytes(32, "big"))
    return _aead_decrypt(key, b"zkos-prover\x00", bytes.fromhex(blob["ct"]))


@dataclass
class ProverServer:
    """In-enclave prover: keypair + prove callback per circuit type.

    On startup the enclave produces a signed attestation document binding
    its ECIES public key (attestation.build_document — the NSM
    get_attestation_document analog); clients verify it against the
    pinned platform root key before trusting the channel.
    """

    prove_fn: object  # (circuit_type, witness_dict) -> (proof_bytes, pub_inputs)
    sk: int = 0xA11CE
    module_id: str = "zkos-tpu-prover-enclave"
    ca: "att.PlatformCA | None" = None

    def __post_init__(self):
        self.pk = GR.scalar_mul(self.sk, GR.GEN)
        self.ca = self.ca or att.PlatformCA()
        self.attestation = att.build_document(
            self.ca, self.module_id, self.pk,
            circuit_versions={c: 1 for c in CIRCUIT_TYPES})

    def handle(self, req: dict) -> dict:
        kind = req.get("type")
        if kind == "Ping":
            return {"type": "Pong"}
        if kind == "TeePublicKey":
            return {"type": "TeePublicKey", "x": self.pk[0], "y": self.pk[1],
                    "attestation": self.attestation}
        if kind == "GenerateProof":
            try:
                payload = json.loads(ecies_decrypt(self.sk, req["payload"]))
                circuit_type = payload["circuit_type"]
                assert circuit_type in CIRCUIT_TYPES, "unknown circuit type"
                proof, pub = self.prove_fn(circuit_type, payload["witness"])
                user_pub = (payload["user_pub_x"], payload["user_pub_y"])
                response = json.dumps(
                    {"proof": proof.hex(), "pub_inputs": pub}).encode()
                # encrypted back to the user's key (server.rs:24-80 shape)
                import random

                enc = ecies_encrypt(user_pub, response,
                                    random.Random(len(response)).randrange(
                                        1, GR.SCALAR_ORDER))
                return {"type": "Proof", "payload": enc}
            except Exception as e:  # noqa: BLE001 — protocol error reply
                return {"type": "Error", "reason": str(e)}
        return {"type": "Error", "reason": "unknown request"}

    def serve(self, sock: socket.socket):
        """Serve one connection until EOF (enclave loop)."""
        try:
            while True:
                send_msg(sock, self.handle(recv_msg(sock)))
        except (ConnectionError, OSError):
            pass

    def serve_in_thread(self, sock: socket.socket) -> threading.Thread:
        t = threading.Thread(target=self.serve, args=(sock,), daemon=True)
        t.start()
        return t


class ProverClient:
    """Client side (the -server proxy + sdk 'light' client roles).

    Mirrors the wasm-light flow (teeClient.ts + nitro-attestation/): the
    TEE public key is only trusted after its attestation document
    verifies against the pinned platform root key, and the attested key
    must equal the key the server claims — a key-substitution MITM fails
    the check.  Pass ``root_pk=None`` to skip (dev only).
    """

    def __init__(self, sock: socket.socket, user_sk: int = 0xB0B,
                 root_pk=None, expected_pcrs: dict | None = None):
        self.sock = sock
        self.user_sk = user_sk % GR.SCALAR_ORDER
        self.user_pk = GR.scalar_mul(self.user_sk, GR.GEN)
        self.root_pk = root_pk
        self.expected_pcrs = expected_pcrs
        self._verified_key: tuple[int, int] | None = None

    def ping(self) -> bool:
        send_msg(self.sock, {"type": "Ping"})
        return recv_msg(self.sock).get("type") == "Pong"

    def tee_public_key(self) -> dict:
        send_msg(self.sock, {"type": "TeePublicKey"})
        info = recv_msg(self.sock)
        if self.root_pk is not None and self._verified_key is None:
            attested = att.verify_document(
                info["attestation"], self.root_pk,
                expected_pcrs=self.expected_pcrs)
            if attested != (info["x"], info["y"]):
                raise att.AttestationError(
                    "binding: served key differs from attested key")
            self._verified_key = attested
        return info

    def generate_proof(self, circuit_type: str, witness: dict,
                       ephemeral: int = 0xE9) -> tuple[bytes, list]:
        key_info = self.tee_public_key()
        payload = json.dumps({
            "circuit_type": circuit_type,
            "witness": witness,
            "user_pub_x": self.user_pk[0],
            "user_pub_y": self.user_pk[1],
        }).encode()
        enc = ecies_encrypt((key_info["x"], key_info["y"]), payload, ephemeral)
        send_msg(self.sock, {"type": "GenerateProof", "payload": enc})
        resp = recv_msg(self.sock)
        if resp.get("type") != "Proof":
            raise RuntimeError(resp.get("reason", "prover error"))
        body = json.loads(ecies_decrypt(self.user_sk, resp["payload"]))
        return bytes.fromhex(body["proof"]), body["pub_inputs"]
