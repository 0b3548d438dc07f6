"""BLAKE3 (core/blake3.py) against known `blake3` crate vectors.

The reference's blake3_groth16 flavor commits journals under BLAKE3
(`blake3_groth16/src/receipt.rs`); these digests must match the Rust
`blake3` crate byte-for-byte."""

from boundless_tpu.core import blake3


def test_known_vectors():
    assert blake3.digest(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert blake3.digest(b"abc").hex() == (
        "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
    assert blake3.digest(b"hello world").hex() == (
        "d74981efa70a0c880b8d8c1985d075dbcbf679b99a5f9914e5aaf96b831a9e24")


def test_block_and_chunk_boundaries():
    # cross 64-byte block and 1024-byte chunk boundaries + the left-heavy
    # chaining tree (3 and 5 chunk spans exercise uneven splits)
    for n in (63, 64, 65, 127, 128, 1023, 1024, 1025, 2048, 3072, 5000):
        d = blake3.digest(bytes(i % 251 for i in range(n)))
        assert len(d) == 32
        # stability: recompute
        assert d == blake3.digest(bytes(i % 251 for i in range(n)))


def test_distinct_inputs_distinct_digests():
    seen = {blake3.digest(bytes([i]) * i) for i in range(1, 64)}
    assert len(seen) == 63
