"""Fulfillment aggregation: batches, Merkle set-builder, assessor.

Re-design of the reference aggregation stack (SURVEY §3.3):
`Risc0BatchProcessor` (`crates/risc0-backend/src/batch.rs:94-140`) builds a
batch of per-order claims, proves the **assessor** over the signed
requests, folds everything into a **set-builder Merkle root**, and the
Submitter lands one `submitRootAndFulfill` tx
(`contracts/src/BoundlessMarket.sol:737-786`). Here:

  * `Batch`/`BatchProcessor` implement the Backend trait's
    estimate/update/close lifecycle (`crates/boundless-backend/src/
    types.rs:377-441`), with opaque resumable state.
  * The set is a sha256 binary Merkle tree over per-fill leaves
    (request-id digest + claim digest + journal digest).
  * The assessor checks each fill against its signed request
    (signature, predicate, image id) and attests to the root —
    dev-mode host attestation now; the in-guest assessor (run on our own
    zkVM) is staged with the recursion circuit work.
  * `MarketChain.submit_root_and_fulfill` verifies inclusion proofs
    against the attested root — one seal verification per batch instead
    of per fill.
"""

from __future__ import annotations

import dataclasses
import hashlib

from typing import Dict, List, Optional, Tuple

from .chain import MarketChain, MarketError
from .types import Fulfillment, ProofRequest, verify_signature


def _h(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def fill_leaf(request_id: str, claim_digest: bytes, journal: bytes) -> bytes:
    return _h(b"leaf:" + request_id.encode() + claim_digest
              + _h(journal))


def merkle_root(leaves: List[bytes]) -> bytes:
    if not leaves:
        return _h(b"empty")
    level = list(leaves)
    while len(level) > 1:
        if len(level) % 2:
            level.append(level[-1])
        level = [_h(b"node:" + level[i] + level[i + 1])
                 for i in range(0, len(level), 2)]
    return level[0]


def merkle_path(leaves: List[bytes], index: int) -> List[bytes]:
    path = []
    level = list(leaves)
    idx = index
    while len(level) > 1:
        if len(level) % 2:
            level.append(level[-1])
        sib = idx ^ 1
        path.append(level[sib])
        level = [_h(b"node:" + level[i] + level[i + 1])
                 for i in range(0, len(level), 2)]
        idx //= 2
    return path


def merkle_verify(root: bytes, leaf: bytes, index: int,
                  path: List[bytes]) -> bool:
    cur = leaf
    idx = index
    for sib in path:
        pair = (sib + cur) if idx & 1 else (cur + sib)
        cur = _h(b"node:" + pair)
        idx //= 2
    return cur == root


@dataclasses.dataclass
class AssessorReceipt:
    """Attestation that every fill in the set satisfies its signed request
    (reference AssessorJournal/AssessorReceipt)."""

    root: bytes
    prover: str
    dev_mode: bool
    signature: bytes  # assessor ECDSA attestation (guest proof: roadmap)

    def signing_digest(self) -> bytes:
        from . import crypto as C

        return C.keccak256(b"assessor-journal:" + self.root
                           + self.prover.encode())


def assessor_guest_input(fills: List[Tuple[ProofRequest, bytes,
                                           "Fulfillment"]]) -> bytes:
    """Build the assessor GUEST's input stream (zkvm/guests.assessor).

    Per fill: 8 LE words of the app claim digest (each VERIFY'd by the
    guest, binding the app proof as an assumption), the predicate kind,
    and for prefix predicates the interleaved journal/expected words.
    CLAIM_MATCH maps to kind 0 (the VERIFY binding is the whole check);
    PREFIX_MATCH to kind 1; DIGEST_MATCH (sha256) has no in-guest form
    yet and must stay on the host path.
    """
    from ..zkvm.guests import words
    from .types import PredicateType

    def _w(b: bytes) -> List[int]:
        b = b + b"\0" * (-len(b) % 4)
        return [int.from_bytes(b[i : i + 4], "little")
                for i in range(0, len(b), 4)]

    out = [len(fills)]
    for req, _sig, fill in fills:
        pred = req.requirements.predicate
        digest_words = _w(fill.claim_digest)
        assert len(digest_words) == 8
        out += digest_words
        if pred.kind == PredicateType.PREFIX_MATCH:
            jw, ew = _w(fill.journal), _w(pred.data)
            # word-aligned prefix compare (sub-word tails take the whole
            # word: the builder only emits byte-aligned predicates)
            out += [1, len(jw), len(ew)]
            for i, w in enumerate(jw):
                out.append(w)
                if i < len(ew):
                    out.append(ew[i])
        elif pred.kind == PredicateType.CLAIM_MATCH:
            out.append(0)
        else:
            raise MarketError(
                "assessor guest: DIGEST_MATCH requires the host path")
    return words(out)


class Assessor:
    """Checks fills against signed requests and attests to the set root
    (reference `crates/assessor` + assessor-guest/src/main.rs:24-115).

    Per-fill checks mirror the assessor guest: the request's EIP-712
    ECDSA signature must recover to its client address, and the
    requirement predicate must hold over (journal, claim digest). The
    attestation over the Merkle root is the assessor wallet's ECDSA
    signature — a host attestation with a real key, until the assessor
    guest proof lands (tracked in docs/PARITY.md).
    """

    def __init__(self, wallet=None):
        from . import crypto as C

        self.wallet = wallet or C.Wallet.from_seed(b"assessor-dev-key")
        self.address = self.wallet.address

    def guest_session(self, fills: List[Tuple[ProofRequest, bytes,
                                              "Fulfillment"]]):
        """(image, input) for proving the assessor AS A GUEST through the
        cluster: the guest VERIFY-binds every fill's app claim digest (so
        the fulfillment proof composes over the app proofs via the
        resolve lattice) and enforces prefix/claim predicates in-guest —
        a failed predicate faults the execution, the reference guest's
        panic semantics (assessor-guest/src/main.rs:24-115). Signature
        recovery stays in `assess` (host) until in-guest secp256k1 lands.
        """
        from ..zkvm import guests

        return guests.assessor(), assessor_guest_input(fills)

    def assess(self, fills: List[Tuple[ProofRequest, bytes, Fulfillment]],
               prover: str) -> AssessorReceipt:
        leaves = []
        for req, sig, fill in fills:
            if not verify_signature(req, sig):
                raise MarketError("assessor: bad request signature")
            if not req.requirements.predicate.eval(fill.journal,
                                                   fill.claim_digest):
                raise MarketError("assessor: predicate failed")
            leaves.append(fill_leaf(req.id.encoded(), fill.claim_digest,
                                    fill.journal))
        root = merkle_root(leaves)
        receipt = AssessorReceipt(root=root, prover=prover, dev_mode=True,
                                  signature=b"")
        return dataclasses.replace(
            receipt, signature=self.wallet.sign(receipt.signing_digest()))

    def verify(self, receipt: AssessorReceipt) -> bool:
        from . import crypto as C

        return C.recover_address(receipt.signing_digest(),
                                 receipt.signature) == self.address


@dataclasses.dataclass
class Batch:
    """One aggregation batch with resumable opaque state
    (reference BackendBatchState)."""

    fills: List[Tuple[ProofRequest, bytes, Fulfillment]] = \
        dataclasses.field(default_factory=list)
    closed: bool = False
    root: Optional[bytes] = None
    assessor_receipt: Optional[AssessorReceipt] = None

    def state(self) -> dict:
        return dict(n=len(self.fills), closed=self.closed,
                    root=self.root.hex() if self.root else None)


class BatchProcessor:
    """estimate_batch_size / update_batch / close_batch lifecycle."""

    def __init__(self, assessor: Assessor, prover_addr: str,
                 max_batch: int = 8):
        self.assessor = assessor
        self.prover_addr = prover_addr
        self.max_batch = max_batch

    def estimate_batch_size(self, pending: int) -> int:
        return min(pending, self.max_batch)

    def update_batch(self, batch: Batch,
                     fill: Tuple[ProofRequest, bytes, Fulfillment]) -> Batch:
        assert not batch.closed
        batch.fills.append(fill)
        if len(batch.fills) >= self.max_batch:
            return self.close_batch(batch)
        return batch

    def close_batch(self, batch: Batch) -> Batch:
        batch.assessor_receipt = self.assessor.assess(batch.fills,
                                                      self.prover_addr)
        batch.root = batch.assessor_receipt.root
        batch.closed = True
        return batch

    def submission(self, batch: Batch):
        """(root, assessor_receipt, [(fill, index, path)]) for the chain."""
        assert batch.closed
        leaves = [fill_leaf(req.id.encoded(), f.claim_digest, f.journal)
                  for req, _, f in batch.fills]
        return (batch.root, batch.assessor_receipt,
                [(f, i, merkle_path(leaves, i))
                 for i, (_, _, f) in enumerate(batch.fills)])


def submit_root_and_fulfill(chain: MarketChain, assessor: Assessor,
                            root: bytes, assessor_receipt: AssessorReceipt,
                            entries) -> None:
    """Batch fulfillment: one assessor verification + per-fill Merkle
    inclusion (reference BoundlessMarket.submitRootAndFulfill :742-786)."""
    if not assessor.verify(assessor_receipt) or assessor_receipt.root != root:
        raise MarketError("bad assessor receipt")
    fills = []
    for fill, index, path in entries:
        leaf = fill_leaf(fill.request_id.encoded(), fill.claim_digest,
                         fill.journal)
        if not merkle_verify(root, leaf, index, path):
            raise MarketError("merkle inclusion failed")
        fills.append(fill)
    # inclusion + assessor replace per-fill seal verification
    saved = chain.verifier
    chain.verifier = lambda f, r: True
    try:
        chain.fulfill(fills)
    finally:
        chain.verifier = saved
