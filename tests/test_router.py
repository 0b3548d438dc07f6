"""Verifier-router selector dispatch tests."""

import pytest

from boundless_tpu.groth16.wrap import SELECTOR_DEV_MODE, SELECTOR_GROTH16
from boundless_tpu.market.router import RouterError, default_router
from boundless_tpu.market.types import (Fulfillment, Predicate, RequestId,
                                        Requirements, Offer, ProofRequest)


def _fill(seal, journal=b"j"):
    return Fulfillment(request_id=RequestId("a", 1), journal=journal,
                       claim_digest=b"c" * 32, seal=seal, prover="p")


def _req(selector=None):
    return ProofRequest(
        id=RequestId("a", 1),
        requirements=Requirements(image_id="i",
                                  predicate=Predicate.prefix_match(b""),
                                  selector=selector),
        image_url="u", input_data=b"",
        offer=Offer(1, 1, 0, 1, 1, 1, 0))


def test_selector_dispatch_and_unknown():
    r = default_router()
    assert SELECTOR_GROTH16 in r.selectors()
    seal = {"dev_mode": True, "journal": b"j"}
    assert r.verify(SELECTOR_DEV_MODE, seal, _fill(seal), _req())
    assert not r.verify(SELECTOR_DEV_MODE, seal, _fill(seal, b"x"), _req())
    with pytest.raises(RouterError):
        r.verify("0x12345678", seal, _fill(seal), _req())


def test_market_verifier_adapter():
    r = default_router()
    mv = r.market_verifier(SELECTOR_DEV_MODE)
    seal = {"dev_mode": True, "journal": b"j"}
    assert mv(_fill(seal), _req())
    # request demanding a groth16 selector rejects a dev seal
    assert not mv(_fill(seal), _req(selector=SELECTOR_GROTH16))
    # unknown selector -> False, not crash
    assert not mv(_fill(seal), _req(selector="0xffffffff"))
