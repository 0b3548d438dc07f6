"""STARK -> SNARK wrap (Groth16 / blake3-journal Groth16).

Reference shape: `tasks/snark.rs:44-71` — `compress(ProverOpts::groth16())`
or `blake3_groth16::compress_blake3_groth16` (identity_p254 -> witness ->
BN254 Groth16 via CUDA/rapidsnark). v1 here: the wrap API, receipt
formats, and claim binding are real; the SNARK itself is a dev-mode
attestation (full STARK carried inside) until the recursion circuit and
the Groth16 circuit land (bn254.py/msm.py hold the curve layer they will
use). Dev-mode receipts verify by re-verifying the carried STARK — sound,
not succinct; `dev_mode=True` is visible to every consumer.
"""

from __future__ import annotations

import dataclasses
import hashlib

from ..recursion.receipt import SessionReceipt

# Seal selectors (reference `crates/boundless-market/src/selector.rs:64-92`).
SELECTOR_GROTH16 = "0x73c457ba"  # Groth16V3_0
SELECTOR_BLAKE3_GROTH16 = "0x62f049f6"  # Blake3Groth16V0_1
SELECTOR_DEV_MODE = "0xdeadbeef"


@dataclasses.dataclass
class Groth16Receipt:
    kind: str  # "groth16" | "blake3_groth16"
    selector: str
    claim_digest: bytes
    journal: bytes
    image_id: tuple
    dev_mode: bool
    inner: object  # dev-mode: the SessionReceipt; real: (A, B, C) points

    def seal_bytes(self) -> bytes:
        return (bytes.fromhex(self.selector[2:]) + self.claim_digest
                + hashlib.sha256(self.journal).digest())


def journal_digest_blake3_style(journal: bytes) -> bytes:
    """Journal digest for the blake3_groth16 flavor (reference binds the
    journal with BLAKE3; we use sha256 domain-separated until a BLAKE3
    impl lands)."""
    return hashlib.sha256(b"blake3-journal:" + journal).digest()


def _verify_session(session, system=None) -> bool:
    """Verify either session-receipt flavor: v1 `SessionReceipt` (self-
    verifying) or `succinct.SuccinctSessionReceipt` (needs the recursion
    system that issued it)."""
    if isinstance(session, SessionReceipt):
        return session.verify()
    from ..recursion import succinct as _succ

    if system is None:
        raise ValueError("succinct session receipt needs `system` to verify")
    return _succ.verify_session(session, system)


def _claim_digest_bytes(session) -> bytes:
    cd = session.root.claim_digest()
    if isinstance(cd, bytes):
        return cd
    from ..recursion import claims as _claims

    return _claims.digest_bytes(cd)


def compress(session, kind: str = "groth16", system=None) -> Groth16Receipt:
    assert kind in ("groth16", "blake3_groth16")
    if not _verify_session(session, system):
        raise ValueError("cannot wrap: stark receipt fails verification")
    return Groth16Receipt(
        kind=kind,
        selector=(SELECTOR_GROTH16 if kind == "groth16"
                  else SELECTOR_BLAKE3_GROTH16),
        claim_digest=_claim_digest_bytes(session),
        journal=session.journal,
        image_id=session.image_id,
        dev_mode=True,
        inner=session)


def verify(receipt: Groth16Receipt, expected_image_id=None,
           system=None) -> bool:
    if expected_image_id is not None and tuple(
            int(x) for x in expected_image_id) != tuple(receipt.image_id):
        return False
    if receipt.dev_mode:
        inner = receipt.inner
        return (inner.journal == receipt.journal
                and _claim_digest_bytes(inner) == receipt.claim_digest
                and _verify_session(inner, system))
    raise NotImplementedError("non-dev groth16 verify lands with the circuit")
