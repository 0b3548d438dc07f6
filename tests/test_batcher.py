"""Aggregation batch + assessor + submitRootAndFulfill tests."""

import time

import pytest

from boundless_tpu.market.batcher import (Assessor, Batch, BatchProcessor,
                                          fill_leaf, merkle_path,
                                          merkle_root, merkle_verify,
                                          submit_root_and_fulfill)
from boundless_tpu.market.crypto import Wallet

ALICE = Wallet.from_seed(b"alice")
from boundless_tpu.market.chain import MarketChain, MarketError
from boundless_tpu.market.types import (Fulfillment, Offer, Predicate,
                                        ProofRequest, RequestId,
                                        Requirements, sign_request)


def _req(i, journal):
    offer = Offer(min_price=10, max_price=10, bidding_start=time.time(),
                  ramp_up_period=1, lock_timeout=100, timeout=100,
                  lock_collateral=0)
    return ProofRequest(
        id=RequestId(ALICE.address, i),
        requirements=Requirements(
            image_id="img", predicate=Predicate.digest_match(journal)),
        image_url="local://x", input_data=b"", offer=offer)


def _fill(req, journal):
    return Fulfillment(request_id=req.id, journal=journal,
                       claim_digest=b"c" * 32, seal=None, prover="prover1")


def test_merkle_tree_roundtrip():
    leaves = [fill_leaf(f"r{i}", bytes([i]) * 32, b"j%d" % i)
              for i in range(5)]
    root = merkle_root(leaves)
    for i, leaf in enumerate(leaves):
        path = merkle_path(leaves, i)
        assert merkle_verify(root, leaf, i, path)
        assert not merkle_verify(root, leaves[(i + 1) % 5], i, path)


def test_batch_lifecycle_and_submit():
    chain = MarketChain(lambda f, r: False)  # per-fill verifier would fail
    chain.create_account(ALICE.address, funds=1000)
    chain.create_account("prover1", funds=0)
    assessor = Assessor()
    bp = BatchProcessor(assessor, "prover1", max_batch=3)
    batch = Batch()
    fills_meta = []
    for i in range(3):
        journal = b"journal%d" % i
        req = _req(i, journal)
        chain.submit_request(req, sign_request(req, ALICE))
        fill = _fill(req, journal)
        fills_meta.append((req, sign_request(req, ALICE), fill))
        batch = bp.update_batch(batch, (req, sign_request(req, ALICE), fill))
    assert batch.closed and batch.root is not None
    assert bp.estimate_batch_size(10) == 3

    root, receipt, entries = bp.submission(batch)
    submit_root_and_fulfill(chain, assessor, root, receipt, entries)
    for i in range(3):
        assert chain.request_status(RequestId(ALICE.address, i).encoded()) == \
            "fulfilled"
    assert chain.balances["prover1"] == 30


def test_batch_rejects_bad_inclusion():
    chain = MarketChain(lambda f, r: False)
    chain.create_account(ALICE.address, funds=1000)
    assessor = Assessor()
    bp = BatchProcessor(assessor, "prover1", max_batch=2)
    batch = Batch()
    for i in range(2):
        journal = b"jrnl%d\0\0\0" % i
        req = _req(i, journal)
        chain.submit_request(req, sign_request(req, ALICE))
        batch = bp.update_batch(batch, (req, sign_request(req, ALICE), _fill(req, journal)))
    root, receipt, entries = bp.submission(batch)
    # corrupt one path
    req, sig, fill, idx, path = entries[0]
    entries[0] = (req, sig, fill, idx, [b"\0" * 32] * len(path))
    with pytest.raises(MarketError):
        submit_root_and_fulfill(chain, assessor, root, receipt, entries)


def test_assessor_rejects_predicate_violation():
    assessor = Assessor()
    req = _req(0, b"expected")
    bad_fill = _fill(req, b"different-journal")
    with pytest.raises(MarketError):
        assessor.assess([(req, sign_request(req, ALICE), bad_fill)], "prover1")
