"""Satellite market services + metrics registry tests."""

import time

from boundless_tpu.cluster.metrics import Registry
from boundless_tpu.market.crypto import Wallet

ALICE = Wallet.from_seed(b"alice")
from boundless_tpu.market.chain import MarketChain
from boundless_tpu.market.services import (Distributor, Indexer,
                                           RequestorList, Slasher)
from boundless_tpu.market.types import (Offer, Predicate, ProofRequest,
                                        RequestId, Requirements, sign_request,
                                        Fulfillment)


def _mk_chain(clock):
    chain = MarketChain(lambda fill, req: True, clock=clock)
    chain.create_account(ALICE.address, funds=1000)
    chain.create_account("prover1", funds=1000)
    chain.deposit_collateral("prover1", 200)
    return chain


def _mk_request(i=1, start=1000.0):
    offer = Offer(min_price=10, max_price=20, bidding_start=start,
                  ramp_up_period=1.0, lock_timeout=5.0, timeout=10.0,
                  lock_collateral=50)
    return ProofRequest(
        id=RequestId(ALICE.address, i),
        requirements=Requirements(image_id="ab",
                                  predicate=Predicate.prefix_match(b"")),
        image_url="local://elfs/x", input_data=b"", offer=offer)


def test_slasher_slashes_expired():
    t = [1000.0]
    chain = _mk_chain(lambda: t[0])
    req = _mk_request()
    chain.submit_request(req, sign_request(req, ALICE))
    chain.lock_request(req.id.encoded(), "prover1")
    s = Slasher(chain, "watcher", poll=0.01)
    s.start()
    try:
        time.sleep(0.05)
        assert not s.slashed  # not yet expired
        t[0] = 1011.0
        deadline = time.time() + 2
        while time.time() < deadline and not s.slashed:
            time.sleep(0.01)
        assert s.slashed == [req.id.encoded()]
    finally:
        s.stop()


def test_indexer_aggregates():
    t = [1000.0]
    chain = _mk_chain(lambda: t[0])
    for i in range(3):
        req = _mk_request(i)
        chain.submit_request(req, sign_request(req, ALICE))
    req0 = chain.requests[RequestId(ALICE.address, 0).encoded()]
    chain.lock_request(req0.id.encoded(), "prover1")
    chain.fulfill([Fulfillment(request_id=req0.id, journal=b"x",
                               claim_digest=b"c" * 32, seal=None,
                               prover="prover1")])
    idx = Indexer(chain)
    agg = idx.sync()
    assert agg.total_requests == 3
    assert agg.total_fulfilled == 1
    assert agg.per_prover_fulfilled == {"prover1": 1}
    assert agg.per_requestor_requests == {ALICE.address: 3}
    assert agg.total_volume > 0
    # incremental sync picks up only new events
    req = _mk_request(7)
    chain.submit_request(req, sign_request(req, ALICE))
    agg2 = idx.sync()
    assert agg2.total_requests == 4


def test_distributor_topup():
    chain = _mk_chain(time.time)
    chain.create_account("treasury", funds=10_000)
    chain.create_account("op1", funds=5)
    d = Distributor(chain, "treasury", ["op1", "prover1"], min_balance=100,
                    top_up=500)
    moved = d.run_once()
    assert moved == {"op1": 500}
    assert chain.balances["op1"] == 505


def test_requestor_list():
    rl = RequestorList("priority", ["alice", "bob"])
    assert rl.validate()
    assert rl.is_member("alice") and not rl.is_member("eve")


def test_metrics_registry():
    r = Registry()
    r.counter("tasks_total", stream="prove").inc()
    r.counter("tasks_total", stream="prove").inc(2)
    with r.histogram("dur_seconds", stream="prove").time():
        pass
    text = r.render()
    assert 'tasks_total{stream="prove"} 3.0' in text
    assert 'dur_seconds_count{stream="prove"} 1' in text


def test_indexer_service_durable_resume(tmp_path):
    """Persistent indexer: aggregates in sqlite, restart resumes from the
    block cursor without double counting (reference crates/indexer +
    indexer-api lambdas)."""
    import json
    import urllib.request as _url

    from boundless_tpu.market.indexer_service import (IndexerService,
                                                      make_indexer_server)

    t = [1000.0]
    chain = _mk_chain(lambda: t[0])
    db = str(tmp_path / "indexer.db")
    idx = IndexerService(chain, db)
    req = _mk_request(1)
    chain.submit_request(req, sign_request(req, ALICE))
    assert idx.sync() >= 1
    assert idx.stats()["total_requests"] == 1

    # restart from the same DB: no double counting, new events indexed
    idx2 = IndexerService(chain, db)
    assert idx2.stats()["total_requests"] == 1
    req2 = _mk_request(2)
    chain.submit_request(req2, sign_request(req2, ALICE))
    chain.lock_request(req2.id.encoded(), "prover1")
    chain.fulfill([Fulfillment(request_id=req2.id, journal=b"x",
                               claim_digest=b"c" * 32, seal=None,
                               prover="prover1")])
    idx2.sync()
    st = idx2.stats()
    assert st["total_requests"] == 2 and st["total_fulfilled"] == 1
    assert idx2.requestors()[ALICE.address] == 2
    assert idx2.provers()["prover1"] == 1

    # lambda-API surface
    server, thread = make_indexer_server(idx2)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        stats = json.loads(_url.urlopen(base + "/stats").read())
        assert stats["total_requests"] == 2
        evs = json.loads(_url.urlopen(base + "/events?since=0").read())
        assert len(evs["events"]) >= 2
    finally:
        server.shutdown()
