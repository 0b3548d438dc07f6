"""Broker driving the proving cluster end-to-end with real STARK seals."""

import pytest

from boundless_tpu.cluster.agent import ClusterContext, run_workers
from boundless_tpu.cluster.api import ClusterApi
from boundless_tpu.cluster.hotstore import HotStore
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.cluster.taskdb import MemoryBackend
from boundless_tpu.market.broker.cluster_prover import (ClusterProver,
                                                        session_seal_verifier)
from boundless_tpu.market.broker.pipeline import Broker, BrokerConfig, \
    OrderStatus
from boundless_tpu.market.crypto import Wallet

ALICE = Wallet.from_seed(b"alice")
from boundless_tpu.market.chain import MarketChain
from boundless_tpu.market.client import Client, LocalStorageProvider
from boundless_tpu.zkvm import guests, prove

PO2 = 8


def test_cluster_prover_preflight():
    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(), store=SharedFs(),
                         ps=prove.TEST_PS, segment_po2=PO2, succinct=None)
    run_workers(ctx, {"exec": 1})
    cp = ClusterProver(ClusterApi(ctx), timeout=30)
    cycles = cp.preflight(guests.echo(), guests.words([1, 5]))
    assert cycles > 0


@pytest.mark.slow
def test_broker_with_cluster_prover_real_seal():
    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(), store=SharedFs(),
                         ps=prove.TEST_PS, segment_po2=PO2, succinct=None)
    run_workers(ctx, {"exec": 1, "prove": 2, "join": 1, "aux": 1})
    cp = ClusterProver(ClusterApi(ctx), timeout=900)

    chain = MarketChain(session_seal_verifier(ps=prove.TEST_PS))
    chain.create_account(ALICE.address, funds=10**9)
    chain.create_account("prover1", funds=10**7)
    chain.deposit_collateral("prover1", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, ALICE, storage_provider=provider)
    broker = Broker(chain, cp, "prover1", BrokerConfig(min_mcycle_price=0),
                    storage=provider)
    broker.start()
    try:
        payload = [4242]
        req = client.build_request(guests.echo(),
                                   guests.words([len(payload)] + payload))
        rid = client.submit_onchain(req)
        journal, seal = client.wait_for_fulfillment(rid, timeout=900)
        assert journal == guests.words(payload)
        assert seal.verify(ps=prove.TEST_PS)
        assert broker.orders[rid].status == OrderStatus.FULFILLED
    finally:
        broker.stop()
