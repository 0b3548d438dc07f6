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


def test_cluster_assessor_composition_devmode():
    """BASELINE config-3 shape end-to-end (dev-mode receipts): an app
    (echo) session is proven, then the ASSESSOR GUEST session verifies
    the app claim as an assumption and enforces the request's prefix
    predicate in-guest; resolve discharges the assumption against the
    published app receipt and the assessor session finalizes."""
    import time

    from boundless_tpu.cluster.agent import ClusterContext, run_workers
    from boundless_tpu.cluster.api import ClusterApi
    from boundless_tpu.cluster.hotstore import HotStore
    from boundless_tpu.cluster.storage import SharedFs
    from boundless_tpu.cluster.taskdb import MemoryBackend
    from boundless_tpu.recursion import claims, succinct
    from boundless_tpu.utils import serde
    from boundless_tpu.zkvm import prove

    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(),
                         store=SharedFs(), ps=prove.TEST_PS,
                         segment_po2=11,
                         succinct=succinct.DevModeSystem(), dev_mode=True)
    api = ClusterApi(ctx)

    def run_job(img, input_bytes, timeout=60):
        iid = f"in-{time.monotonic_ns()}"
        api.upload_input(iid, input_bytes)
        job = api.create_session(dict(img=img, input=iid,
                                      segment_po2=11))["uuid"]
        threads, agents = run_workers(
            ctx, {"exec": 1, "prove": 2, "join": 1, "aux": 1})
        deadline = time.time() + timeout
        st = None
        try:
            while time.time() < deadline:
                st = api.session_status(job)
                if st["status"] in ("SUCCEEDED", "FAILED"):
                    break
                time.sleep(0.05)
        finally:
            for a in agents:
                a.stop()
        return job, st

    api.upload_image("echo", serde.dump_image(guests.echo()))
    api.upload_image("assessor", serde.dump_image(guests.assessor()))
    payload = [7, 9]
    job1, st1 = run_job("echo", guests.words([2] + payload))
    assert st1["status"] == "SUCCEEDED", st1
    app = ctx.store.get("receipts/stark", job1)
    app_digest = claims.digest_bytes(app.root.claim.digest())

    # the fill: app journal must start with word 7 (prefix predicate)
    fills = [(_req(Predicate(PredicateType.PREFIX_MATCH,
                             guests.words([7]))), b"",
              _Fill(app_digest, app.journal))]
    job2, st2 = run_job("assessor", assessor_guest_input(fills))
    assert st2["status"] == "SUCCEEDED", st2
    asess = ctx.store.get("receipts/stark", job2)
    assert succinct.verify_session(asess, ctx.succinct)
    c = asess.root.claim
    assert c.post_assumptions == claims.ZERO_CHAIN  # discharged
    jw = [int.from_bytes(asess.journal[i:i + 4], "little")
          for i in range(0, len(asess.journal), 4)]
    assert jw[0] == 1 and jw[9] == 1  # one fill, prefix kind

    # a wrong predicate faults the assessor execution -> job FAILED
    bad = [(_req(Predicate(PredicateType.PREFIX_MATCH,
                           guests.words([8]))), b"",
            _Fill(app_digest, app.journal))]
    job3, st3 = run_job("assessor", assessor_guest_input(bad), timeout=30)
    assert st3["status"] == "FAILED", st3
