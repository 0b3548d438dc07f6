"""Assessor as a guest: predicate eval + app-claim binding in-guest.

The reference proves the assessor inside a guest whose journal is the
AssessorJournal (`crates/guest/assessor/assessor-guest/src/main.rs:24-115`)
— a failed check panics the guest, so no fulfillment proof exists. Here
the assessor guest (zkvm/guests.assessor) VERIFY-binds each fill's app
claim digest as an assumption, evaluates prefix predicates over the
journal words, and commits the AssessorJournal analogue; a predicate
mismatch FAULTS the execution (unprovable). Signature recovery remains
host-side (docs/PARITY.md).
"""

import dataclasses

import pytest

from boundless_tpu.market.batcher import assessor_guest_input
from boundless_tpu.market.types import (Offer, Predicate, PredicateType,
                                        ProofRequest, RequestId,
                                        Requirements)
from boundless_tpu.zkvm import guests
from boundless_tpu.zkvm.executor import Executor, GuestFault


def _req(pred: Predicate) -> ProofRequest:
    return ProofRequest(
        id=RequestId(client="0x" + "11" * 20, index=1),
        requirements=Requirements(image_id="img", predicate=pred),
        image_url="file:///x", input_data=b"",
        offer=Offer(min_price=0, max_price=10, bidding_start=0,
                    ramp_up_period=1, timeout=100, lock_timeout=50,
                    lock_collateral=1))


@dataclasses.dataclass
class _Fill:
    claim_digest: bytes
    journal: bytes


def _run(fills):
    inp = assessor_guest_input(fills)
    return Executor(guests.assessor(), inp).run()


def test_assessor_guest_binds_claims_and_passes_predicates():
    d1, d2 = bytes(range(32)), bytes(range(32, 64))
    fills = [
        (_req(Predicate(PredicateType.CLAIM_MATCH, d1)), b"",
         _Fill(d1, b"anything")),
        (_req(Predicate(PredicateType.PREFIX_MATCH, b"abcd")), b"",
         _Fill(d2, b"abcdefgh1234")),
    ]
    res = _run(fills)
    # both app claims are bound as assumptions, in order
    assert res.assumptions == [d1, d2]
    # AssessorJournal analogue: n, then per fill digest words + kind
    jw = [int.from_bytes(res.journal[i : i + 4], "little")
          for i in range(0, len(res.journal), 4)]
    assert jw[0] == 2
    assert bytes(b for w in jw[1:9]
                 for b in int(w).to_bytes(4, "little")) == d1
    assert jw[9] == 0  # claim-match kind
    assert bytes(b for w in jw[10:18]
                 for b in int(w).to_bytes(4, "little")) == d2
    assert jw[18] == 1  # prefix kind


def test_assessor_guest_faults_on_predicate_mismatch():
    d = bytes(32)
    fills = [(_req(Predicate(PredicateType.PREFIX_MATCH, b"wxyz")), b"",
              _Fill(d, b"abcdefgh"))]
    with pytest.raises(GuestFault):
        _run(fills)


def test_assessor_guest_rejects_sha_predicates():
    from boundless_tpu.market.chain import MarketError

    d = bytes(32)
    fills = [(_req(Predicate(PredicateType.DIGEST_MATCH, b"\0" * 32)), b"",
              _Fill(d, b"abc"))]
    with pytest.raises(MarketError):
        assessor_guest_input(fills)
