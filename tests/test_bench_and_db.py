"""Market bench harness, broker order DB, deployments registry tests."""

import hashlib
import time

from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.market.bench import MarketBench
from boundless_tpu.market.broker.db import OrderDb
from boundless_tpu.market.broker.pipeline import (Broker, BrokerConfig,
                                                  Order, OrderStatus)
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
    chain.create_account("alice", b"a", funds=10**9)
    chain.create_account("p1", b"p", funds=10**7)
    chain.deposit_collateral("p1", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, "alice", b"a", storage_provider=provider)
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
