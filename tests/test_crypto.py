"""keccak-256 / secp256k1 ECDSA / EIP-712 request auth (VERDICT #7).

Reference trust model: EIP-712-signed ProofRequests verified by ECDSA
recovery, host-side in the SDK/market and in-guest by the assessor
(`crates/guest/assessor/assessor-guest/src/main.rs:24-115`). Known-vector
checks pin our primitives to the Ethereum ecosystem's.
"""

import time

import pytest

from boundless_tpu.market import crypto as C
from boundless_tpu.market.chain import MarketChain, MarketError
from boundless_tpu.market.types import (Offer, Predicate, ProofRequest,
                                        RequestId, Requirements,
                                        sign_request, verify_signature)


def test_keccak256_known_vectors():
    assert C.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert C.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block input (> 136-byte rate)
    assert len(C.keccak256(b"x" * 1000)) == 32


def test_known_ethereum_address():
    # the canonical address of private key 1
    assert C.Wallet.from_key(1).address == (
        "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf")


def test_sign_recover_roundtrip_and_tamper():
    w = C.Wallet.from_seed(b"requestor-seed")
    digest = C.keccak256(b"a message")
    sig = w.sign(digest)
    assert len(sig) == 65
    assert C.recover_address(digest, sig) == w.address
    # deterministic (RFC 6979): same digest -> same signature
    assert w.sign(digest) == sig
    # tampered digest / signature never recover to the signer
    assert C.recover_address(C.keccak256(b"other"), sig) != w.address
    bad = bytearray(sig)
    bad[5] ^= 0xFF
    assert C.recover_address(digest, bytes(bad)) != w.address
    # garbage sizes rejected
    assert C.recover(digest, b"short") is None


def _request(wallet):
    offer = Offer(min_price=10, max_price=20, bidding_start=time.time(),
                  ramp_up_period=1, lock_timeout=100, timeout=100,
                  lock_collateral=0)
    return ProofRequest(
        id=RequestId(wallet.address, 7),
        requirements=Requirements(image_id="img",
                                  predicate=Predicate.prefix_match(b"")),
        image_url="local://elfs/x", input_data=b"\x01\x02", offer=offer)


def test_eip712_request_auth():
    alice = C.Wallet.from_seed(b"alice")
    mallory = C.Wallet.from_seed(b"mallory")
    req = _request(alice)
    sig = sign_request(req, alice)
    assert verify_signature(req, sig)
    # a different key's signature does not recover to alice
    assert not verify_signature(req, sign_request(req, mallory))
    # changing any EIP-712 field invalidates the signature
    import dataclasses

    bumped = dataclasses.replace(req, offer=dataclasses.replace(
        req.offer, max_price=999))
    assert not verify_signature(bumped, sig)
    assert req.signing_digest() != bumped.signing_digest()


def test_chain_rejects_wrong_key_even_if_funded():
    """The market has no key registry: only recovery to the client
    address authenticates (kills the round-1 server-known-secret model)."""
    alice = C.Wallet.from_seed(b"alice")
    mallory = C.Wallet.from_seed(b"mallory")
    chain = MarketChain(lambda f, r: True)
    chain.create_account(alice.address, funds=100)
    chain.create_account(mallory.address, funds=100)
    req = _request(alice)
    with pytest.raises(MarketError):
        chain.submit_request(req, sign_request(req, mallory))
    chain.submit_request(req, sign_request(req, alice))
    assert chain.request_status(req.id.encoded()) == "open"
