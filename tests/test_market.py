"""Market layer tests: chain semantics, SDK request building, broker
pipeline e2e with a mock prover (reference broker/src/tests/e2e.rs shape)."""

import hashlib
import time

import pytest

from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.market import chain as chain_mod
from boundless_tpu.market.chain import MarketChain, MarketError
from boundless_tpu.market.client import Client, LocalStorageProvider
from boundless_tpu.market.order_stream import OrderStream
from boundless_tpu.market.broker.pipeline import (Broker, BrokerConfig,
                                                  OrderStatus)
from boundless_tpu.market.crypto import Wallet
from boundless_tpu.market.types import (Offer, Predicate, ProofRequest,
                                        RequestId, Requirements, sign_request)

ALICE = Wallet.from_seed(b"alice")
from boundless_tpu.zkvm import guests
from boundless_tpu.zkvm.executor import Executor


class MockProver:
    """Executor-backed mock prover (dev-mode style fake seals)."""

    def preflight(self, image, input_data):
        return Executor(image, input_data).run().total_cycles

    def prove(self, image, input_data):
        res = Executor(image, input_data).run()
        claim = hashlib.sha256(b"claim:" + res.journal).digest()
        seal = {"dev_mode": True, "journal": res.journal,
                "image_id": res.image_id.hex()}
        return res.journal, seal, claim


def mock_verifier(fill, request):
    return (isinstance(fill.seal, dict) and fill.seal.get("dev_mode")
            and fill.seal["journal"] == fill.journal
            and fill.seal["image_id"] == request.requirements.image_id)


@pytest.fixture
def world():
    clock = time.time
    chain = MarketChain(mock_verifier, clock=clock)
    chain.create_account(ALICE.address, funds=10_000_000)
    chain.create_account("prover1", funds=1_000_000)
    chain.deposit_collateral("prover1", 500_000)
    store = SharedFs()
    provider = LocalStorageProvider(store)
    client = Client(chain, ALICE, storage_provider=provider)
    return chain, client, provider


def test_request_build_and_submit(world):
    chain, client, provider = world
    payload = [1, 2, 3]
    req = client.build_request(guests.echo(),
                               guests.words([len(payload)] + payload))
    assert req.requirements.image_id == guests.echo().image_id().hex()
    assert req.offer.max_price >= req.offer.min_price
    rid = client.submit_onchain(req)
    assert chain.request_status(rid) == "open"
    # duplicate id rejected
    with pytest.raises(MarketError):
        chain.submit_request(req, sign_request(req, ALICE))
    # bad signature rejected
    req2 = client.build_request(guests.echo(), guests.words([0]))
    with pytest.raises(MarketError):
        chain.submit_request(req2, b"\0" * 65)


def test_offer_auction_pricing():
    offer = Offer(min_price=100, max_price=500, bidding_start=1000.0,
                  ramp_up_period=10.0, lock_timeout=50.0, timeout=100.0,
                  lock_collateral=5)
    assert offer.price_at(999.0) == 100
    assert offer.price_at(1000.0) == 100
    assert offer.price_at(1005.0) == 300
    assert offer.price_at(1010.0) == 500
    assert offer.price_at(2000.0) == 500


def test_broker_e2e_fulfills_order(world):
    chain, client, provider = world
    broker = Broker(chain, MockProver(), "prover1",
                    BrokerConfig(min_mcycle_price=0), storage=provider)
    broker.start()
    try:
        payload = [7, 8, 9]
        req = client.build_request(guests.echo(),
                                   guests.words([len(payload)] + payload))
        rid = client.submit_onchain(req)
        journal, seal = client.wait_for_fulfillment(rid, timeout=20.0)
        assert journal == guests.words(payload)
        order = broker.orders[rid]
        assert order.status == OrderStatus.FULFILLED
        # prover got paid, collateral returned
        assert chain.balances["prover1"] > 1_000_000 - 500_000
        assert chain.request_status(rid) == "fulfilled"
    finally:
        broker.stop()


def test_broker_batch_fulfill_assessor_guest(world):
    """Aggregation path: two orders land through ONE submitRootAndFulfill
    whose assessor receipt comes from the ECDSA-verifying assessor guest
    (in-guest secp256k1; reference BatcherService -> Submitter)."""
    chain, client, provider = world
    broker = Broker(chain, MockProver(), "prover1",
                    BrokerConfig(min_mcycle_price=0, batch_fulfill=True,
                                 batch_size=2), storage=provider)
    broker.start()
    try:
        rids = []
        for payload in ([4, 5], [6, 7]):
            req = client.build_request(
                guests.echo(), guests.words([len(payload)] + payload))
            rids.append(client.submit_onchain(req))
        for rid, payload in zip(rids, ([4, 5], [6, 7])):
            journal, _seal = client.wait_for_fulfillment(rid, timeout=30.0)
            assert journal == guests.words(payload)
            assert chain.request_status(rid) == "fulfilled"
    finally:
        broker.stop()


def test_batch_fulfill_rejects_forged_signature(world):
    """A fill whose request signature does not recover to the client
    address makes the assessor GUEST fault — the batch cannot be
    fulfilled because the proof does not exist (no host judgment
    involved; reference assessor-guest/src/main.rs:58-66)."""
    from boundless_tpu.market.batcher import Assessor
    from boundless_tpu.market.types import Fulfillment

    chain, client, provider = world
    req = client.build_request(guests.echo(), guests.words([1, 42]))
    rid = client.submit_onchain(req)
    res = Executor(*_assets(provider, req)).run()
    fill = Fulfillment(request_id=req.id, journal=res.journal,
                       claim_digest=b"c" * 32, seal=None, prover="prover1")
    mallory = Wallet.from_seed(b"mallory")
    forged = sign_request(req, mallory)  # wrong key
    with pytest.raises(MarketError):
        Assessor().assess([(req, forged, fill)], "prover1")
    # the honest signature passes
    good = chain.request_sigs[rid]
    receipt = Assessor().assess([(req, good, fill)], "prover1")
    assert receipt.journal


def _assets(provider, req):
    from boundless_tpu.utils import serde

    image = serde.load_image(provider.download(req.image_url))
    return image, req.input_data


def test_broker_skips_underpriced(world):
    chain, client, provider = world
    broker = Broker(chain, MockProver(), "prover1",
                    BrokerConfig(min_mcycle_price=10**12), storage=provider)
    broker.start()
    try:
        req = client.build_request(guests.echo(), guests.words([0]))
        rid = client.submit_onchain(req)
        deadline = time.time() + 10
        while time.time() < deadline:
            order = broker.orders.get(rid)
            if order and order.status in (OrderStatus.SKIPPED,
                                          OrderStatus.FAILED):
                break
            time.sleep(0.05)
        assert broker.orders[rid].status == OrderStatus.SKIPPED
        assert "min_mcycle_price" in broker.orders[rid].error
    finally:
        broker.stop()


def test_slash_expired_lock():
    t = [1000.0]
    chain = MarketChain(mock_verifier, clock=lambda: t[0])
    chain.create_account(ALICE.address, funds=1000)
    chain.create_account("prover1", funds=1000)
    chain.deposit_collateral("prover1", 100)
    offer = Offer(min_price=10, max_price=20, bidding_start=1000.0,
                  ramp_up_period=1.0, lock_timeout=5.0, timeout=10.0,
                  lock_collateral=50)
    req = ProofRequest(
        id=RequestId(ALICE.address, 1),
        requirements=Requirements(image_id="ab", predicate=Predicate.prefix_match(b"")),
        image_url="local://elfs/x", input_data=b"", offer=offer)
    chain.submit_request(req, sign_request(req, ALICE))
    chain.lock_request(req.id.encoded(), "prover1")
    assert chain.collateral["prover1"] == 50
    # not yet expired
    with pytest.raises(MarketError):
        chain.slash(req.id.encoded(), "watcher")
    t[0] = 1011.0
    chain.slash(req.id.encoded(), "watcher")
    assert chain.request_status(req.id.encoded()) == "slashed"
    assert chain.balances.get("watcher", 0) == 25
    # double slash rejected
    with pytest.raises(MarketError):
        chain.slash(req.id.encoded(), "watcher")


def test_order_stream_offchain(world):
    chain, client, provider = world
    stream = OrderStream()
    client.order_stream = stream
    got = []
    stream.subscribe(lambda req, sig: got.append(req))
    req = client.build_request(guests.echo(), guests.words([0]))
    client.submit_offchain(req)
    assert got and got[0].id.encoded() == req.id.encoded()
    # unauthenticated submit rejected
    with pytest.raises(PermissionError):
        stream.submit(req, b"b" * 65)


def test_order_stream_http_roundtrip(world):
    import urllib.error

    from boundless_tpu.market.order_stream_http import (
        OrderStreamClient, make_order_stream_server, request_from_json,
        request_to_json)
    from boundless_tpu.market.types import sign_request

    chain, client, provider = world
    stream = OrderStream()
    server, thread = make_order_stream_server(stream)
    thread.start()
    try:
        osc = OrderStreamClient(
            f"http://127.0.0.1:{server.server_address[1]}")
        req = client.build_request(guests.echo(), guests.words([1, 5]))
        # codec roundtrip fidelity
        assert request_from_json(request_to_json(req)) == req
        osc.submit(req, sign_request(req, ALICE))
        orders = osc.orders_since(0)
        assert len(orders) == 1 and orders[0][0].id == req.id
        osc.heartbeat("prover-x")
        assert "prover-x" in stream.heartbeats
        # bad signature -> 403
        with pytest.raises(urllib.error.HTTPError):
            osc.submit(req, b"\x00" * 65)
    finally:
        server.shutdown()


def test_order_stream_websocket_push(world):
    """WS subscription: replay from `since`, then live push on submit
    (reference crates/order-stream WS broadcast)."""
    import threading as _threading

    from boundless_tpu.market.order_stream_http import (
        OrderStreamClient, make_order_stream_server)
    from boundless_tpu.market.types import sign_request

    chain, client, provider = world
    stream = OrderStream()
    server, thread = make_order_stream_server(stream)
    thread.start()
    try:
        osc = OrderStreamClient(
            f"http://127.0.0.1:{server.server_address[1]}")
        r0 = client.build_request(guests.echo(), guests.words([1, 4]))
        osc.submit(r0, sign_request(r0, ALICE))

        got = []
        done = _threading.Event()

        def run():
            for req, sig in osc.subscribe_ws(since=0, max_orders=2):
                got.append((req, sig))
            done.set()

        t = _threading.Thread(target=run, daemon=True)
        t.start()
        time.sleep(0.3)  # subscriber sees the replayed r0 first
        r1 = client.build_request(guests.echo(), guests.words([1, 6]))
        osc.submit(r1, sign_request(r1, ALICE))  # live push
        assert done.wait(5.0), "WS subscriber did not receive both orders"
        assert [r.id.index for r, _ in got] == [r0.id.index, r1.id.index]
        assert got[1][1] == sign_request(r1, ALICE)
    finally:
        server.shutdown()


def test_broker_usd_price_oracle(world):
    """USD-denominated floor through a price oracle (reference
    broker-template.toml:30 `min_mcycle_price = "0.00002 USD"`)."""
    from boundless_tpu.market.broker.pipeline import PriceOracle

    chain, client, provider = world
    # $3000/token; $1 per Mcycle floor -> ~3.3e14 wei per Mcycle, far
    # above the default test offers -> order must be skipped.
    cfg = BrokerConfig(min_mcycle_price=0, min_mcycle_price_usd=1.0,
                       price_oracle=PriceOracle(3000.0))
    assert cfg.price_oracle.usd_to_wei(1.0) == int(1e18 / 3000)
    broker = Broker(chain, MockProver(), "prover1", cfg, storage=provider)
    broker.start()
    try:
        req = client.build_request(guests.echo(), guests.words([0]))
        rid = client.submit_onchain(req)
        deadline = time.time() + 10
        while time.time() < deadline:
            order = broker.orders.get(rid)
            if order and order.status in (OrderStatus.SKIPPED,
                                          OrderStatus.FAILED):
                break
            time.sleep(0.05)
        assert broker.orders[rid].status == OrderStatus.SKIPPED
        assert "min_mcycle_price" in broker.orders[rid].error
    finally:
        broker.stop()


def test_broker_backlog_deadline_feasibility(world):
    """Committed backlog consumes peak_prove_khz capacity: an order that
    fits alone is infeasible once earlier commitments fill the window
    (reference order_pricer/service.rs:2300-2376). Evaluated
    synchronously so the reaper can't cancel the synthetic backlog."""
    from boundless_tpu.market.broker.pipeline import Order

    chain, client, provider = world
    cfg = BrokerConfig(min_mcycle_price=0, peak_prove_khz=1.0)
    broker = Broker(chain, MockProver(), "prover1", cfg, storage=provider)
    blocker = client.build_request(guests.echo(), guests.words([0]))
    req = client.build_request(guests.echo(), guests.words([0]))
    rid = client.submit_onchain(req)
    secs_left = req.offer.expires_at() - time.time()
    cap = cfg.peak_prove_khz * 1000.0 * secs_left

    # feasible with no backlog
    broker._ingest(req)
    broker._evaluate_order(rid)
    assert broker.orders[rid].status == OrderStatus.COMMITTED

    # a committed order due earlier fills the window -> infeasible now
    b = Order(request=blocker, status=OrderStatus.COMMITTED,
              cycles=int(2 * cap))
    broker.orders[blocker.id.encoded()] = b
    assert broker._committed_backlog(req.offer.expires_at()) >= int(cap)
    broker.orders[rid].status = OrderStatus.NEW
    broker._evaluate_order(rid)
    assert broker.orders[rid].status == OrderStatus.SKIPPED
    assert "deadline infeasible" in broker.orders[rid].error


def test_order_stream_durable_across_restart(world, tmp_path):
    """Durable order log (reference order_db.rs role): a restarted stream
    serves the same feed from its sqlite DB, so broker cursors resume."""
    from boundless_tpu.market.types import sign_request

    chain, client, provider = world
    db = str(tmp_path / "orders.sqlite")
    stream = OrderStream(db_path=db)
    r1 = client.build_request(guests.echo(), guests.words([1, 3]))
    r2 = client.build_request(guests.echo(), guests.words([1, 4]))
    stream.submit(r1, sign_request(r1, ALICE))
    stream.submit(r2, sign_request(r2, ALICE))
    with pytest.raises(PermissionError):
        stream.submit(r2, b"x" * 65)  # rejected -> never persisted
    # restart
    stream2 = OrderStream(db_path=db)
    orders = stream2.orders_since(0)
    assert [o[0].id.encoded() for o in orders] == [
        r1.id.encoded(), r2.id.encoded()]
    # resumed feed still verifies signatures and accepts new orders
    assert all(o[0].signing_digest() for o in orders)
    r3 = client.build_request(guests.echo(), guests.words([1, 5]))
    stream2.submit(r3, sign_request(r3, ALICE))
    assert len(OrderStream(db_path=db).orders_since(0)) == 3
