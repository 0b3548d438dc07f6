"""Market bench harness, broker order DB, deployments registry tests."""

import hashlib
import time

from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.market.bench import MarketBench
from boundless_tpu.market.broker.db import OrderDb
from boundless_tpu.market.broker.pipeline import (Broker, BrokerConfig,
                                                  Order, OrderStatus)
from boundless_tpu.market.crypto import Wallet

ALICE = Wallet.from_seed(b"alice")
VIP = Wallet.from_seed(b"vip")
from boundless_tpu.market.chain import MarketChain
from boundless_tpu.market.client import Client, LocalStorageProvider
from boundless_tpu.market import deployments
from boundless_tpu.zkvm import guests
from boundless_tpu.zkvm.executor import Executor


class QuickProver:
    def preflight(self, image, input_data):
        return Executor(image, input_data).run().total_cycles

    def prove(self, image, input_data):
        res = Executor(image, input_data).run()
        return res.journal, {"dev_mode": True, "journal": res.journal,
                             "image_id": res.image_id.hex()}, \
            hashlib.sha256(res.journal).digest()


def test_market_bench_latency_rows():
    chain = MarketChain(lambda f, r: f.seal.get("dev_mode"))
    chain.create_account(ALICE.address, funds=10**9)
    chain.create_account("p1", funds=10**7)
    chain.deposit_collateral("p1", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, ALICE, storage_provider=provider)
    broker = Broker(chain, QuickProver(), "p1",
                    BrokerConfig(min_mcycle_price=0), storage=provider)
    broker.start()
    try:
        bench = MarketBench(client, chain, guests.echo(),
                            lambda i: guests.words([1, i]), count=3)
        rows = bench.run(timeout=30)
        assert all(r.fulfilled_at is not None for r in rows)
        assert all(r.lock_latency is not None and r.lock_latency >= 0
                   for r in rows)
        csv = bench.to_csv()
        assert csv.count("\n") == 4
        assert "lock_latency" in csv
    finally:
        broker.stop()


def test_order_db_persistence_roundtrip():
    from boundless_tpu.market.types import (Offer, Predicate, ProofRequest,
                                            RequestId, Requirements)

    req = ProofRequest(
        id=RequestId("alice", 1),
        requirements=Requirements(image_id="i",
                                  predicate=Predicate.prefix_match(b"x")),
        image_url="local://x", input_data=b"in",
        offer=Offer(1, 2, 0.0, 1.0, 5.0, 10.0, 3))
    db = OrderDb()
    db.upsert(req.id.encoded(), Order(request=req,
                                      status=OrderStatus.PROVING, price=7))
    loaded = db.load_all()
    o = loaded[req.id.encoded()]
    assert o.status == OrderStatus.PROVING
    assert o.price == 7
    assert o.request.image_url == "local://x"
    assert db.in_flight() == [req.id.encoded()]
    db.upsert(req.id.encoded(), Order(request=req,
                                      status=OrderStatus.FULFILLED, price=7))
    assert db.in_flight() == []


def test_deployments_registry():
    local = deployments.get("local")
    assert local.chain_id == 31337
    custom = deployments.get("local", market_address="market:custom")
    assert custom.market_address == "market:custom"
    assert deployments.get("local").market_address == "market:local"


def test_broker_resume_from_order_db():
    """A restarted broker resumes committed orders from its DB."""
    import time as _t

    chain = MarketChain(lambda f, r: f.seal.get("dev_mode"))
    chain.create_account(ALICE.address, funds=10**9)
    chain.create_account("p1", funds=10**7)
    chain.deposit_collateral("p1", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, ALICE, storage_provider=provider)
    db = OrderDb()

    # "first run": ingest + commit an order, then crash before proving
    req = client.build_request(guests.echo(), guests.words([1, 9]))
    rid = client.submit_onchain(req)
    db.upsert(rid, Order(request=req, status=OrderStatus.COMMITTED, price=5))

    broker = Broker(chain, QuickProver(), "p1",
                    BrokerConfig(min_mcycle_price=0), storage=provider,
                    order_db=db)
    assert rid in broker.orders  # loaded from DB
    broker.start()
    try:
        deadline = _t.time() + 20
        while _t.time() < deadline:
            if broker.orders[rid].status == OrderStatus.FULFILLED:
                break
            _t.sleep(0.05)
        assert broker.orders[rid].status == OrderStatus.FULFILLED
        assert chain.request_status(rid) == "fulfilled"
    finally:
        broker.stop()


def test_priority_requestor_skips_price_gate():
    chain = MarketChain(lambda f, r: f.seal.get("dev_mode"))
    chain.create_account(VIP.address, funds=10**9)
    chain.create_account("p1", funds=10**7)
    chain.deposit_collateral("p1", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, VIP, storage_provider=provider)
    broker = Broker(chain, QuickProver(), "p1",
                    BrokerConfig(min_mcycle_price=10**12,
                                 priority_requestors=(VIP.address,)),
                    storage=provider)
    broker.start()
    try:
        req = client.build_request(guests.echo(), guests.words([0]))
        rid = client.submit_onchain(req)
        journal, _ = client.wait_for_fulfillment(rid, timeout=20)
        assert journal == b""
    finally:
        broker.stop()
