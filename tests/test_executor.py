"""rv32im executor / assembler / guest ABI tests."""

import numpy as np

from boundless_tpu.zkvm import asm, guests, isa
from boundless_tpu.zkvm.executor import Executor, GuestFault


def run(image, input_bytes=b"", po2=14):
    return Executor(image, input_bytes, segment_po2=po2).run()


def test_echo():
    payload = [0x68656C6C, 0x6F627470, 0x75213432]
    res = run(guests.echo(), guests.words([len(payload)] + payload))
    assert res.journal == guests.words(payload)
    assert res.exit_code == 0
    assert res.total_cycles > 0
    assert len(res.segments) == 1


def test_loop_and_segmentation():
    count = 5000
    res = run(guests.loop_guest(), guests.words([count]), po2=10)
    assert res.journal == guests.words([count])
    # 2 cycles per iteration -> multiple segments at po2=10
    assert len(res.segments) > 1
    assert sum(s.cycles for s in res.segments) == res.total_cycles
    assert res.segments[-1].is_final
    assert not res.segments[0].is_final


def test_identity_assumption():
    digest = bytes(range(32))
    dw = [int.from_bytes(digest[i : i + 4], "little") for i in range(0, 32, 4)]
    res = run(guests.identity(), guests.words(dw))
    assert res.assumptions == [digest]
    assert res.journal == digest


def test_memtest_ram():
    payload = [111, 222, 333, 444]
    res = run(guests.memtest(), guests.words([len(payload)] + payload))
    assert res.journal == guests.words(payload[::-1])


def test_muldiv():
    a, b = 0xDEADBEEF, 12345
    res = run(guests.muldiv(), guests.words([a, b]))
    lo = int.from_bytes(res.journal[0:4], "little")
    hi = int.from_bytes(res.journal[4:8], "little")
    q = int.from_bytes(res.journal[8:12], "little")
    r = int.from_bytes(res.journal[12:16], "little")
    assert lo == (a * b) & 0xFFFFFFFF
    assert hi == (a * b) >> 32
    assert q == a // b
    assert r == a % b


def test_alu_ops_via_asm():
    src = """
    start:
        li a0, -7
        li a1, 3
        add a2, a0, a1      # -4
        sub a3, a0, a1      # -10
        slt a4, a0, a1      # 1
        sltu a5, a0, a1     # 0 (big unsigned)
        srai a6, a0, 1      # -4 (arith shift)
        srli a7, a0, 1      # big
        xor s2, a0, a1
        and s3, a0, a1
        or s4, a0, a1
        li t0, 0
        li a0, 0
        ecall
    """
    img = guests.build(src)
    ex = Executor(img)
    ex.run()
    M = 0xFFFFFFFF
    regs = [int(x) for x in ex.regs]
    assert regs[12] == (-4) & M
    assert regs[13] == (-10) & M
    assert regs[14] == 1
    assert regs[15] == 0
    assert regs[16] == (-4) & M
    assert regs[17] == ((-7) & M) >> 1
    assert regs[18] == ((-7) ^ 3) & M
    assert regs[19] == ((-7) & 3) & M
    assert regs[20] == ((-7) | 3) & M


def test_memory_bytes_halfwords():
    src = """
    start:
        li t1, 0x20000
        li t2, 0x12345678
        sw t2, 0(t1)
        lb a0, 0(t1)       # 0x78
        lb a1, 3(t1)       # 0x12
        lhu a2, 2(t1)      # 0x1234
        sb a1, 4(t1)
        lw a3, 4(t1)       # 0x12
        sh a2, 8(t1)
        lh a4, 8(t1)       # 0x1234
        li t0, 0
        li a0, 0
        ecall
    """
    ex = Executor(guests.build(src))
    ex.run()
    regs = [int(x) for x in ex.regs]
    assert regs[11] == 0x12
    assert regs[12] == 0x1234
    assert regs[13] == 0x12
    assert regs[14] == 0x1234


def test_image_id_stable_and_distinct():
    a = guests.echo().image_id()
    b = guests.echo().image_id()
    c = guests.loop_guest().image_id()
    assert a == b and a != c


def test_illegal_instruction_faults():
    img = guests.build(".word 0xffffffff")
    ex = Executor(img)
    try:
        ex.run()
        assert False, "expected fault"
    except GuestFault:
        pass


def test_keccak_coprocessor_ecall():
    from boundless_tpu.zkvm.executor import keccak_f1600

    res = run(guests.keccak_guest())
    expect = keccak_f1600([0] * 25)[0]
    lo = int.from_bytes(res.journal[0:4], "little")
    hi = int.from_bytes(res.journal[4:8], "little")
    assert lo | (hi << 32) == expect == 0xF1258F7940E1DDE7
    ex = Executor(guests.keccak_guest())
    ex.run()
    assert len(ex.keccak_claims) == 1
    from boundless_tpu.zkvm.executor import keccak_perm_digest
    lanes_in = ex.keccak_states[0]
    from boundless_tpu.zkvm.executor import keccak_f1600 as kf
    assert ex.keccak_claims[0] == keccak_perm_digest(lanes_in, kf(list(lanes_in)))


def test_native_segmenting_executor_parity():
    """bt_run_segment sessions are bit-identical to the Python loop:
    same segments (pre-state, cycles, reads, seqs, kec perms), same
    journal/assumptions/keccak claims — across io, RAM, M, sub-word,
    keccak and multi-segment workloads."""
    from boundless_tpu.zkvm import guests

    cases = [
        (guests.echo(), guests.words([3, 5, 6, 7]), 8),
        (guests.loop_guest(), guests.words([700]), 8),
        (guests.memtest(), guests.words([6, 1, 2, 3, 4, 5, 6]), 9),
        (guests.muldiv(), guests.words([77, 0]), 10),
        (guests.subword_guest(), b"", 10),
        (guests.keccak_guest(), b"", 10),
        (guests.identity(), guests.words(list(range(1, 9))), 8),
    ]
    for image, inp, po2 in cases:
        a = Executor(image, inp, segment_po2=po2).run(native=False)
        b = Executor(image, inp, segment_po2=po2).run(native=True)
        assert a.total_cycles == b.total_cycles
        assert a.journal == b.journal
        assert a.exit_code == b.exit_code
        assert a.assumptions == b.assumptions
        assert len(a.segments) == len(b.segments)
        for sa, sb in zip(a.segments, b.segments):
            assert sa.pre_pc == sb.pre_pc
            assert (sa.pre_regs == sb.pre_regs).all()
            assert sa.pre_mem == sb.pre_mem
            assert sa.cycles == sb.cycles
            assert sa.reads == sb.reads
            assert sa.pre_seqs == sb.pre_seqs
            assert sa.kec_perms == sb.kec_perms
            assert sa.touched_pages == sb.touched_pages
            assert sa.post_mem == sb.post_mem


def test_native_executor_runs_ecdsa_guest_fast():
    """The multi-Mcycle ECDSA assessor guest segments through the
    native loop in seconds (the Python loop would take minutes)."""
    import time

    from boundless_tpu.market import crypto
    from boundless_tpu.market.batcher import assessor_guest_input_v2
    from boundless_tpu.market.types import (Fulfillment, Offer, Predicate,
                                            ProofRequest, RequestId,
                                            Requirements, sign_request)
    from boundless_tpu.zkvm import secp256k1_guest as sg

    w = crypto.Wallet.from_seed(b"native-exec")
    journal = b"jrnl-ok!"
    offer = Offer(min_price=1, max_price=1, bidding_start=0,
                  ramp_up_period=1, lock_timeout=10, timeout=10,
                  lock_collateral=0)
    req = ProofRequest(
        id=RequestId(w.address, 1),
        requirements=Requirements(
            image_id="i", predicate=Predicate.digest_match(journal)),
        image_url="local://x", input_data=b"", offer=offer)
    fill = Fulfillment(request_id=req.id, journal=journal,
                       claim_digest=b"c" * 32, seal=None, prover="p")
    inp = assessor_guest_input_v2([(req, sign_request(req, w), fill)])
    t0 = time.time()
    res = Executor(sg.assessor_ecdsa(), inp,
                   segment_po2=17).run(native=True)
    elapsed = time.time() - t0
    assert res.exit_code == 0
    assert res.total_cycles > 10_000_000
    assert res.segments  # many segments, all consistent pre/post chains
    assert elapsed < 120, f"native segmentation too slow: {elapsed:.1f}s"
