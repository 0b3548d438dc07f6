"""Market flow example: requestor -> market -> broker -> fulfillment.

Counterpart of the reference `examples/counter/apps` requestor app
(SURVEY §3.4): build a request with the layered builder, submit on-chain,
watch a broker price/lock/prove/fulfill it, and fetch (journal, seal).

    python examples/market_flow.py [--real-proofs]

Default uses dev-mode seals (instant). --real-proofs drives the TPU
prover through the cluster (long first-time compile).
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real-proofs", action="store_true")
    args = ap.parse_args()

    from boundless_tpu.cluster.storage import SharedFs
    from boundless_tpu.market.broker.pipeline import Broker, BrokerConfig
    from boundless_tpu.market.chain import MarketChain
    from boundless_tpu.market.crypto import Wallet
    from boundless_tpu.market.client import Client, LocalStorageProvider
    from boundless_tpu.zkvm import guests
    from boundless_tpu.zkvm.executor import Executor

    if args.real_proofs:
        from boundless_tpu.recursion import receipt as rec
        from boundless_tpu.zkvm import prove

        class TpuProver:
            def preflight(self, image, input_data):
                return Executor(image, input_data).run().total_cycles

            def prove(self, image, input_data):
                res = Executor(image, input_data, segment_po2=8).run()
                receipts = [rec.lift(prove.prove_segment(image, s,
                                                         ps=prove.TEST_PS),
                                     ps=prove.TEST_PS, pre_mem=s.pre_mem)
                            for s in res.segments]
                root = receipts[0]
                for r in receipts[1:]:
                    root = rec.join(root, r)
                session = rec.SessionReceipt.finalize(root, image.entry)
                return (res.journal, session,
                        session.root.claim_digest())

        def verifier(fill, req):
            return (fill.seal.verify(ps=prove.TEST_PS)
                    and fill.seal.journal == fill.journal)

        prover = TpuProver()
    else:
        class DevProver:
            def preflight(self, image, input_data):
                return Executor(image, input_data).run().total_cycles

            def prove(self, image, input_data):
                res = Executor(image, input_data).run()
                seal = {"dev_mode": True, "journal": res.journal,
                        "image_id": res.image_id.hex()}
                return (res.journal, seal,
                        hashlib.sha256(res.journal).digest())

        def verifier(fill, req):
            return (fill.seal.get("dev_mode")
                    and fill.seal["journal"] == fill.journal
                    and fill.seal["image_id"] == req.requirements.image_id)

        prover = DevProver()

    chain = MarketChain(verifier)
    alice = Wallet.from_seed(b"alice-key")
    chain.create_account(alice.address, funds=10**9)
    chain.create_account("prover-node", funds=10**7)
    chain.deposit_collateral("prover-node", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, alice, storage_provider=provider)
    broker = Broker(chain, prover, "prover-node",
                    BrokerConfig(min_mcycle_price=0), storage=provider)
    broker.start()
    try:
        payload = [11, 22, 33]
        req = client.build_request(guests.echo(),
                                   guests.words([len(payload)] + payload))
        print(f"submitting request {req.id.encoded()} "
              f"(auction {req.offer.min_price}..{req.offer.max_price} wei)")
        rid = client.submit_onchain(req)
        journal, seal = client.wait_for_fulfillment(rid, timeout=600)
        print(f"fulfilled! journal = {journal.hex()}")
        assert journal == guests.words(payload)
        print(f"prover balance: {chain.balances['prover-node']}")
        print("market flow OK")
    finally:
        broker.stop()


if __name__ == "__main__":
    main()
