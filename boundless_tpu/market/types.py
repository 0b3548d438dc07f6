"""Market data types: proof requests, offers, requirements, fulfillments.

Python re-design of the reference's market types (`crates/boundless-market/
src/contracts/` + `contracts/src/types/*.sol`): `ProofRequest`, reverse-
Dutch-auction `Offer` (types/Offer.sol), `Requirements`/`Predicate`
(types/Predicate.sol), flagged `RequestId` (types/RequestId.sol),
`Fulfillment`, and the EIP-712-style structured signing digest.
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import hmac
import json
import time
from typing import Optional

DOMAIN = "boundless-tpu.market.v1"


class PredicateType(enum.Enum):
    DIGEST_MATCH = "digest_match"  # journal digest equals
    PREFIX_MATCH = "prefix_match"  # journal starts with
    CLAIM_MATCH = "claim_match"  # claim digest equals


@dataclasses.dataclass(frozen=True)
class Predicate:
    kind: PredicateType
    data: bytes

    def eval(self, journal: bytes, claim_digest: bytes) -> bool:
        if self.kind == PredicateType.DIGEST_MATCH:
            return hashlib.sha256(journal).digest() == self.data
        if self.kind == PredicateType.PREFIX_MATCH:
            return journal.startswith(self.data)
        return claim_digest == self.data

    @staticmethod
    def digest_match(journal: bytes) -> "Predicate":
        return Predicate(PredicateType.DIGEST_MATCH,
                         hashlib.sha256(journal).digest())

    @staticmethod
    def prefix_match(prefix: bytes) -> "Predicate":
        return Predicate(PredicateType.PREFIX_MATCH, prefix)


@dataclasses.dataclass(frozen=True)
class Requirements:
    image_id: str  # hex image id the proof must attest to
    predicate: Predicate
    callback: Optional[str] = None  # contract address to invoke on fulfill
    selector: Optional[str] = None  # required seal selector (proof kind)


@dataclasses.dataclass(frozen=True)
class Offer:
    """Reverse Dutch auction (reference types/Offer.sol)."""

    min_price: int  # wei at auction start
    max_price: int  # wei at ramp end
    bidding_start: float  # unix seconds
    ramp_up_period: float  # seconds from start to max price
    lock_timeout: float  # seconds a lock is valid for
    timeout: float  # request expiry (seconds after bidding_start)
    lock_collateral: int  # prover collateral to lock

    def price_at(self, t: float) -> int:
        if t < self.bidding_start:
            return self.min_price
        dt = t - self.bidding_start
        if dt >= self.ramp_up_period:
            return self.max_price
        frac = dt / self.ramp_up_period if self.ramp_up_period else 1.0
        return int(self.min_price + (self.max_price - self.min_price) * frac)

    def expires_at(self) -> float:
        return self.bidding_start + self.timeout

    def lock_deadline(self) -> float:
        return self.bidding_start + self.lock_timeout


@dataclasses.dataclass(frozen=True)
class RequestId:
    """Address + index + flags (reference types/RequestId.sol)."""

    client: str
    index: int
    smart_contract_signed: bool = False

    def encoded(self) -> str:
        flag = 1 if self.smart_contract_signed else 0
        return f"{self.client}:{self.index}:{flag}"


@dataclasses.dataclass(frozen=True)
class ProofRequest:
    id: RequestId
    requirements: Requirements
    image_url: str  # storage URL of the guest image
    input_data: bytes
    offer: Offer

    def signing_digest(self) -> bytes:
        """EIP-712-style typed-data digest over the canonical encoding."""
        blob = json.dumps({
            "domain": DOMAIN,
            "id": self.id.encoded(),
            "image_id": self.requirements.image_id,
            "predicate": [self.requirements.predicate.kind.value,
                          self.requirements.predicate.data.hex()],
            "image_url": self.image_url,
            "input": self.input_data.hex(),
            "offer": dataclasses.asdict(self.offer),
        }, sort_keys=True)
        return hashlib.sha256(blob.encode()).digest()


def sign_request(request: ProofRequest, secret: bytes) -> bytes:
    """Detached signature (HMAC stand-in for ECDSA; same protocol shape)."""
    return hmac.new(secret, request.signing_digest(), "sha256").digest()


def verify_signature(request: ProofRequest, secret: bytes, sig: bytes) -> bool:
    return hmac.compare_digest(sign_request(request, secret), sig)


@dataclasses.dataclass
class Fulfillment:
    """A delivered proof for one request (reference types/Fulfillment)."""

    request_id: RequestId
    journal: bytes
    claim_digest: bytes
    seal: object  # SessionReceipt (stark) or wrapped snark
    prover: str


@dataclasses.dataclass
class RequestLock:
    prover: str
    locked_at: float
    deadline: float
    collateral: int
    price: int
