"""Stress / fault-injection tests (reference crates/broker-stress role):
many concurrent orders, a flaky prover, and a slasher racing the broker."""

import hashlib
import random
import time

from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.market.broker.pipeline import (Broker, BrokerConfig,
                                                  OrderStatus)
from boundless_tpu.market.crypto import Wallet

ALICE = Wallet.from_seed(b"alice")
from boundless_tpu.market.chain import MarketChain
from boundless_tpu.market.client import Client, LocalStorageProvider
from boundless_tpu.market.services import Slasher
from boundless_tpu.zkvm import guests
from boundless_tpu.zkvm.executor import Executor


class FlakyProver:
    """Fails a deterministic subset of proofs (fault injection)."""

    def __init__(self, fail_every=4):
        self.fail_every = fail_every
        self.calls = 0

    def preflight(self, image, input_data):
        return Executor(image, input_data).run().total_cycles

    def prove(self, image, input_data):
        self.calls += 1
        if self.calls % self.fail_every == 0:
            raise RuntimeError("injected prover fault")
        res = Executor(image, input_data).run()
        claim = hashlib.sha256(b"claim:" + res.journal).digest()
        return res.journal, {"dev_mode": True, "journal": res.journal,
                             "image_id": res.image_id.hex()}, claim


def test_many_orders_with_faults_and_slasher():
    def verifier(fill, req):
        return fill.seal.get("dev_mode") and \
            fill.seal["journal"] == fill.journal

    chain = MarketChain(verifier)
    chain.create_account(ALICE.address, funds=10**9)
    chain.create_account("prover1", funds=10**7)
    chain.deposit_collateral("prover1", 10**6)
    store = SharedFs()
    provider = LocalStorageProvider(store)
    client = Client(chain, ALICE, storage_provider=provider)
    broker = Broker(chain, FlakyProver(fail_every=5), "prover1",
                    BrokerConfig(min_mcycle_price=0,
                                 max_concurrent_preflights=4,
                                 max_concurrent_proofs=4),
                    storage=provider)
    slasher = Slasher(chain, "watchdog", poll=0.05)
    broker.start()
    slasher.start()
    try:
        rids = []
        for i in range(12):
            payload = [i + 1]
            req = client.build_request(
                guests.echo(), guests.words([len(payload)] + payload))
            rids.append(client.submit_onchain(req))
        deadline = time.time() + 60
        while time.time() < deadline:
            done = sum(1 for r in rids
                       if broker.orders.get(r) is not None
                       and broker.orders[r].status in
                       (OrderStatus.FULFILLED, OrderStatus.FAILED,
                        OrderStatus.SKIPPED))
            if done == len(rids):
                break
            time.sleep(0.1)
        statuses = [broker.orders[r].status for r in rids]
        fulfilled = statuses.count(OrderStatus.FULFILLED)
        failed = statuses.count(OrderStatus.FAILED)
        assert fulfilled + failed == len(rids)
        assert fulfilled >= 8  # faults hit ~1/5 of proofs
        # every fulfilled order is consistent on-chain
        for r, s in zip(rids, statuses):
            if s == OrderStatus.FULFILLED:
                assert chain.request_status(r) == "fulfilled"
        # money conservation: alice's spend equals the sum of fulfill
        # events' prices (lock-time auction price)
        paid = 10**9 - chain.balances[ALICE.address]
        event_total = sum(ev.data["price"] for ev in chain.events
                          if ev.kind == "RequestFulfilled")
        assert paid == event_total
    finally:
        broker.stop()
        slasher.stop()
