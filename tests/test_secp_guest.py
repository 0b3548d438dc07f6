"""In-guest secp256k1: bignum/curve subroutines + full ECDSA recovery,
diffed against the host implementation (market/crypto.py).

All runs go through the NATIVE exec-only interpreter (fast_execute) —
these guests burn millions of cycles; proving them rides the normal
segment pipeline (covered at CI scale by the assessor e2e tests)."""

import pytest

from boundless_tpu.market import crypto
from boundless_tpu.zkvm import secp256k1_guest as sg
from boundless_tpu.zkvm.executor import GuestFault, fast_execute
from boundless_tpu.zkvm.guests import words


def _run(op, input_words):
    img = sg.selftest_guest(op)
    cycles, code, journal = fast_execute(img, words(input_words))
    assert code == 0
    out = [int.from_bytes(journal[i : i + 4], "little")
           for i in range(0, len(journal), 4)]
    return out, cycles


def _int_of(ws):
    return sum(w << (32 * i) for i, w in enumerate(ws))


def test_mulred_p():
    a = 0xDEADBEEF << 200 | 0x12345
    b = sg.P - 2
    out, cycles = _run("mulred_p", sg.int_words(a) + sg.int_words(b))
    assert _int_of(out[:8]) == a * b % sg.P
    assert cycles < 20_000


def test_mulred_n():
    a = sg.N - 1
    b = sg.N - 12345
    out, _ = _run("mulred_n", sg.int_words(a) + sg.int_words(b))
    assert _int_of(out[:8]) == a * b % sg.N


def test_mulred_edge_values():
    cases = [(0, 0), (1, sg.P - 1), (sg.P - 1, sg.P - 1),
             (2**256 - 1, 2**256 - 1), (sg.P, 977)]
    for a, b in cases:
        out, _ = _run("mulred_p", sg.int_words(a) + sg.int_words(b))
        assert _int_of(out[:8]) == a * b % sg.P, (a, b)


def test_addsub_mod():
    a, b = sg.P - 5, sg.P - 7
    out, _ = _run("addmod_p", sg.int_words(a) + sg.int_words(b))
    assert _int_of(out[:8]) == (a + b) % sg.P
    out, _ = _run("submod_p", sg.int_words(5) + sg.int_words(9))
    assert _int_of(out[:8]) == (5 - 9) % sg.P


def test_powmod_sqrt():
    ysq = (pow(sg.GX, 3, sg.P) + 7) % sg.P
    out, cycles = _run("powmod_p",
                       sg.int_words(ysq) + sg.int_words((sg.P + 1) // 4))
    y = _int_of(out[:8])
    assert y * y % sg.P == ysq
    assert y in (sg.GY, sg.P - sg.GY)


def test_inv_n():
    r = 0x3A5C1 * 0xFEDCBA987654321 % sg.N
    out, _ = _run("inv_n", sg.int_words(r))
    assert _int_of(out[:8]) * r % sg.N == 1


def test_dsmul_matches_host():
    u1 = 0x1234567890ABCDEF1234567890ABCDEF
    u2 = 0xFEDCBA0987654321FEDCBA0987654321
    R = crypto._mul(7, crypto._G)
    expected = crypto._add(crypto._mul(u1, crypto._G), crypto._mul(u2, R))
    out, cycles = _run(
        "dsmul", sg.int_words(u1) + sg.int_words(u2)
        + sg.int_words(R[0]) + sg.int_words(R[1]))
    assert _int_of(out[:8]) == expected[0]
    assert _int_of(out[8:16]) == expected[1]


def _sig_words(digest, sig, addr_hex):
    z = int.from_bytes(digest, "big")
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:64], "big")
    v = sig[64]
    addr = bytes.fromhex(addr_hex[2:])
    addr_w = [int.from_bytes(addr[4 * i : 4 * i + 4], "little")
              for i in range(5)]
    return (sg.int_words(z) + sg.int_words(r) + sg.int_words(s) + [v]
            + addr_w)


def test_recover_accepts_valid_signature():
    w = crypto.Wallet.from_seed(b"secp-guest-test")
    digest = crypto.keccak256(b"hello boundless")
    sig = w.sign(digest)
    out, cycles = _run("recover", _sig_words(digest, sig, w.address))
    assert out == [1]
    # the whole recovery (incl. the keccak-256 address hash) in-guest
    assert cycles < 25_000_000


def test_recover_rejects_wrong_signer():
    w = crypto.Wallet.from_seed(b"secp-guest-test")
    w2 = crypto.Wallet.from_seed(b"some other key")
    digest = crypto.keccak256(b"hello boundless")
    sig = w.sign(digest)
    with pytest.raises(GuestFault):
        _run("recover", _sig_words(digest, sig, w2.address))


def test_recover_rejects_tampered_digest():
    w = crypto.Wallet.from_seed(b"secp-guest-test")
    digest = crypto.keccak256(b"hello boundless")
    sig = w.sign(digest)
    bad = bytes([digest[0] ^ 1]) + digest[1:]
    with pytest.raises(GuestFault):
        _run("recover", _sig_words(bad, sig, w.address))


def test_recover_rejects_high_s():
    w = crypto.Wallet.from_seed(b"secp-guest-test")
    digest = crypto.keccak256(b"hello boundless")
    sig = w.sign(digest)
    r = sig[:32]
    s = int.from_bytes(sig[32:64], "big")
    high = (sg.N - s).to_bytes(32, "big")  # malleable twin (EIP-2)
    bad = r + high + bytes([sig[64] ^ 1])
    with pytest.raises(GuestFault):
        _run("recover", _sig_words(digest, bad, w.address))
