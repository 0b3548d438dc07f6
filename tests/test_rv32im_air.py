"""rv32im AIR: witness-satisfaction checks + full prove/verify e2e."""

import numpy as np
import pytest

from boundless_tpu.core import field as F
from boundless_tpu.air import debug
from boundless_tpu.air.rv32im import Rv32imAir, DC, zk_rows
from boundless_tpu.zkvm import guests, witness, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = 8
REAL = (1 << PO2) - zk_rows(PO2)  # selector scans: real rows only (the
#                                   blinded zk tail is random)

AIR = Rv32imAir()


def run_and_witness(image, input_bytes):
    ex = Executor(image, input_bytes, segment_po2=PO2)
    res = ex.run()
    assert len(res.segments) == 1
    w = witness.trace_segment(image, res.segments[0], PO2)
    return res, w


def check(image, input_bytes):
    res, w = run_and_witness(image, input_bytes)
    pub = witness.to_public_values(w.pub)
    ok, failures = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(w.data), pub)
    assert ok, f"constraint failures (index, rows): {failures}"
    return res, w


def test_echo_witness_satisfies_air():
    payload = [123456, 0xFFFF0001]
    res, w = check(guests.echo(), guests.words([len(payload)] + payload))
    assert res.journal == guests.words(payload)


def test_loop_witness_satisfies_air():
    check(guests.loop_guest(), guests.words([40]))


def test_memtest_witness_satisfies_air():
    payload = [5, 6, 7]
    res, _ = check(guests.memtest(), guests.words([len(payload)] + payload))
    assert res.journal == guests.words(payload[::-1])


def test_identity_witness_satisfies_air():
    digest = bytes(range(32))
    dw = [int.from_bytes(digest[i:i+4], "little") for i in range(0, 32, 4)]
    res, _ = check(guests.identity(), guests.words(dw))
    assert res.assumptions == [digest]


def test_alu_coverage_witness():
    src = """
    start:
        li a0, -7
        li a1, 3
        add a2, a0, a1
        sub a3, a0, a1
        slt a4, a0, a1
        sltu a5, a0, a1
        xor a6, a0, a1
        or a7, a0, a1
        and s2, a0, a1
        slli s3, a0, 4
        srli s4, a0, 3
        srai s5, a0, 3
        sll s6, a0, a1
        srl s7, a0, a1
        sra s8, a0, a1
        sltiu s9, a0, -1
        blt a0, a1, ok
        li t0, 0
        li a0, 1
        ecall
    ok:
        bge a1, a0, ok2
        li t0, 0
        li a0, 2
        ecall
    ok2:
        li t0, 0
        li a0, 0
        ecall
    """
    img = guests.build(src)
    res, _ = check(img, b"")
    assert res.exit_code == 0


def test_auipc_witness_satisfies_air():
    """AUIPC in-circuit: plain, 2^32 wraparound, and low-limb carry."""
    res, _ = check(guests.auipc_guest(), b"")
    assert res.exit_code == 0
    assert res.journal == guests.words([0x12345004, 0, 0x1000C])


def test_auipc_tampered_rdv_fails():
    res, w = run_and_witness(guests.auipc_guest(), b"")
    bad = w.data.copy()
    # first auipc row: corrupt the committed result limb
    rows = np.nonzero(bad[:REAL, DC.sel.start + 1])[0]
    assert rows.size == 4
    bad[rows[0], DC.rdv.start] = (bad[rows[0], DC.rdv.start] + 1) % F.P
    pub = witness.to_public_values(w.pub)
    ok, _ = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad), pub)
    assert not ok


def test_subword_witness_satisfies_air():
    """LB/LBU/LH/LHU/SB/SH: extraction, sign-extension, merge, offsets."""
    res, _ = check(guests.subword_guest(), b"")
    assert res.exit_code == 0
    assert res.journal == guests.words(
        [0x02, 0xFFFF8080, 0x8080, 0x80, 0xFFFFFF80, 0x808002AB])


def test_subword_tampered_merge_fails():
    """Corrupting an unselected byte of a SB's merged word must fail."""
    res, w = run_and_witness(guests.subword_guest(), b"")
    bad = w.data.copy()
    rows = np.nonzero(bad[:REAL, DC.sel.start + 6] *
                      bad[:REAL, DC.f3.start + 0])[0]  # SB rows
    assert rows.size == 1
    r = rows[0]
    # flip a bit of a preserved byte (byte 2) in the merged word
    col = DC.a_bits.start + 16
    bad[r, col] = 1 - bad[r, col]
    pub = witness.to_public_values(w.pub)
    ok, _ = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad), pub)
    assert not ok


def test_subword_misaligned_half_faults():
    src = """
    start:
        li s4, 0x20000
        li t2, 7
        sw t2, 0(s4)
        lh a0, 1(s4)
        li t0, 0
        ecall
    """
    img = guests.build(src)
    ex = Executor(img, b"", segment_po2=PO2)
    with pytest.raises(witness.GuestFault):
        ex.run()


def test_tampered_witness_fails_air():
    payload = [42]
    res, w = run_and_witness(guests.echo(),
                             guests.words([len(payload)] + payload))
    bad = w.data.copy()
    bad[3, DC.rdv.start] = (bad[3, DC.rdv.start] + 1) % F.P
    pub = witness.to_public_values(w.pub)
    ok, failures = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad), pub)
    assert not ok


@pytest.mark.slow
def test_prove_verify_echo_e2e():
    payload = [77, 88]
    ex = Executor(guests.echo(), guests.words([len(payload)] + payload),
                  segment_po2=PO2)
    res = ex.run()
    receipt = prove.prove_segment(guests.echo(), res.segments[0],
                                  ps=prove.TEST_PS)
    assert prove.verify_segment(receipt, ps=prove.TEST_PS)
    # tampered claim (journal word) must fail
    bad_pub = {k: (v.copy() if hasattr(v, "copy") else v)
               for k, v in receipt.pub.items()}
    bad_pub["io"] = bad_pub["io"].copy()
    bad_pub["io"][0, 2] = (bad_pub["io"][0, 2] + 1) % F.P
    bad = prove.SegmentReceipt(proof=receipt.proof, pub=bad_pub,
                               image_id=receipt.image_id, po2=receipt.po2)
    assert not prove.verify_segment(bad, ps=prove.TEST_PS)


@pytest.mark.slow
def test_prove_verify_memtest_e2e():
    """Regression: e2e proof of a guest with a non-empty sorted memory log.

    The original memory-log gate (s_active * s_active_n) pushed the
    read-consistency constraint to degree 6, which aliases on the
    rate-1/4 LDE — but only when the log is non-empty and non-full
    (otherwise s_active interpolates to a constant and the composite
    degree collapses).  echo does IO via ecall and never touches RAM,
    so the original echo e2e couldn't see it; every load/store guest
    failed verification.  Found by the degree auditor (air/degree.py).
    """
    ex = Executor(guests.memtest(), guests.words([3, 5, 6, 7]),
                  segment_po2=PO2)
    res = ex.run()
    receipt = prove.prove_segment(guests.memtest(), res.segments[0],
                                  ps=prove.TEST_PS)
    assert prove.verify_segment(receipt, ps=prove.TEST_PS)


def test_muldiv_witness_satisfies_air():
    """Unsigned M extension in-circuit (mul/mulhu/divu/remu)."""
    res, _ = check(guests.muldiv(),
                   guests.words([0xDEADBEEF, 12345]))
    a, b = 0xDEADBEEF, 12345
    lo = int.from_bytes(res.journal[0:4], "little")
    assert lo == (a * b) & 0xFFFFFFFF


def test_muldiv_edge_cases_satisfy_air():
    # div by zero, b > a, equal operands
    for a, b in [(7, 0), (3, 10), (0xFFFFFFFF, 0xFFFFFFFF), (0, 5)]:
        check(guests.muldiv(), guests.words([a, b]))


def test_mul_tampered_rdv_fails():
    res, w = run_and_witness(guests.muldiv(), guests.words([99, 7]))
    # find the mul row and corrupt its result
    import numpy as np

    rows = np.where((w.data[:, DC.is_m] == 1))[0]
    assert len(rows) >= 4
    bad = w.data.copy()
    bad[rows[0], DC.rdv.start] = (bad[rows[0], DC.rdv.start] + 1) % F.P
    pub = witness.to_public_values(w.pub)
    ok, _ = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad), pub)
    assert not ok


@pytest.mark.slow
def test_prove_verify_muldiv_e2e():
    """Full STARK round-trip over a segment containing M-extension ops."""
    ex = Executor(guests.muldiv(), guests.words([0xCAFEBABE, 77]),
                  segment_po2=PO2)
    res = ex.run()
    receipt = prove.prove_segment(guests.muldiv(), res.segments[0],
                                  ps=prove.TEST_PS)
    assert prove.verify_segment(receipt, ps=prove.TEST_PS)


@pytest.mark.slow
def test_prove_verify_signed_m_e2e():
    """Full STARK round-trip over a segment with signed M ops."""
    ex = Executor(guests.signed_m_guest(),
                  guests.words([0xFFFFFFF9, 3]), segment_po2=PO2)
    res = ex.run()
    receipt = prove.prove_segment(guests.signed_m_guest(),
                                  res.segments[0], ps=prove.TEST_PS)
    assert prove.verify_segment(receipt, ps=prove.TEST_PS)


def _signed_m_ref(a, b):
    """Reference MULH/MULHSU/DIV/REM per the RISC-V spec."""
    M = 0xFFFFFFFF
    sa = a - (1 << 32) if a >> 31 else a
    sb = b - (1 << 32) if b >> 31 else b
    mulh = ((sa * sb) >> 32) & M
    mulhsu = ((sa * b) >> 32) & M
    if sb == 0:
        q, r = M, a
    elif sa == -(1 << 31) and sb == -1:
        q, r = 0x80000000, 0
    else:
        qs = abs(sa) // abs(sb)
        if (sa < 0) != (sb < 0):
            qs = -qs
        q, r = qs & M, (sa - qs * sb) & M
    return [mulh, mulhsu, q, r]


SIGNED_M_CASES = [
    (7, 3), (7, 0xFFFFFFFD), (0xFFFFFFF9, 3), (0xFFFFFFF9, 0xFFFFFFFD),
    (7, 0), (0xFFFFFFF9, 0),                   # div by zero, both signs
    (0x80000000, 0xFFFFFFFF),                  # overflow -2^31 / -1
    (0x80000000, 1), (0x80000000, 3),          # minimum dividend
    (0, 5), (0, 0xFFFFFFFB), (5, 0xFFFFFFFF),  # zero / negative divisors
    (0xDEADBEEF, 0xCAFEBABE), (1, 0x80000000),
]


@pytest.mark.parametrize("a,b", SIGNED_M_CASES)
def test_signed_m_witness_satisfies_air(a, b):
    """mulh/mulhsu/div/rem in-circuit, incl. RISC-V special cases."""
    res, _ = check(guests.signed_m_guest(), guests.words([a, b]))
    assert res.exit_code == 0
    assert res.journal == guests.words(_signed_m_ref(a, b))


def test_signed_div_tampered_quotient_fails():
    """Corrupting the committed quotient must violate the AIR."""
    res, w = run_and_witness(guests.signed_m_guest(),
                             guests.words([0xFFFFFFF9, 3]))  # -7 / 3
    rows = np.nonzero(w.data[:REAL, DC.is_m] * w.data[:REAL, DC.f3.start + 4])[0]
    assert rows.size == 1
    for col in (DC.a_bits.start,          # quotient bit
                DC.rdv.start,             # committed result limb
                DC.m_rem_bits.start):     # remainder bit
        bad = w.data.copy()
        bad[rows[0], col] = (bad[rows[0], col] + 1) % F.P
        pub = witness.to_public_values(w.pub)
        ok, _ = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad), pub)
        assert not ok, f"tamper at col {col} went undetected"


def test_signed_div_wrong_rounding_fails():
    """-7/3: floor rounding (q=-3, r=2) satisfies q*b + r = a and
    |r| < |b|, but breaks sign(r) == sign(a) — only truncation
    (q=-2, r=-1) is provable.  The fake witness is made consistent for
    every OTHER constraint (product chain, carries, comparison), so
    the sign condition alone must catch it."""
    res, w = run_and_witness(guests.signed_m_guest(),
                             guests.words([0xFFFFFFF9, 3]))
    rows = np.nonzero(w.data[:REAL, DC.is_m] * w.data[:REAL, DC.f3.start + 4])[0]
    r0 = rows[0]
    bad = w.data.copy()
    qf, rf, b = (-3) & 0xFFFFFFFF, 2, 3  # floor-division witness
    prod = qf * b
    lo, hi = prod & 0xFFFFFFFF, prod >> 32
    bits = lambda v, n=32: [(v >> i) & 1 for i in range(n)]
    bad[r0, DC.a_bits.start : DC.a_bits.stop] = bits(qf)
    bad[r0, DC.m_rem_bits.start : DC.m_rem_bits.stop] = bits(rf)
    bad[r0, DC.r_bits.start : DC.r_bits.stop] = bits(lo)
    bad[r0, DC.m_hi_bits.start : DC.m_hi_bits.stop] = bits(hi)
    abytes = [(qf >> (8 * i)) & 0xFF for i in range(4)]
    bbytes = [(b >> (8 * i)) & 0xFF for i in range(4)]
    carry = 0
    for k in range(7):
        ck = sum(abytes[i] * bbytes[k - i]
                 for i in range(max(0, k - 3), min(4, k + 1)))
        carry = (ck + carry) >> 8
        bad[r0, DC.m_carry_bits.start + 11 * k :
            DC.m_carry_bits.start + 11 * (k + 1)] = bits(carry, 11)
    a_u = 0xFFFFFFF9
    k0 = ((lo & 0xFFFF) + (rf & 0xFFFF)) >> 16
    k1 = ((lo >> 16) + (rf >> 16) + k0 - (a_u >> 16)) >> 16
    bad[r0, DC.m_ca0], bad[r0, DC.m_ca1] = k0, k1
    alpha, rho, q31, b31 = 1, 0, (qf >> 31) & 1, 0
    U = q31 * (b & 0xFFFF)
    V = q31 * (b >> 16)
    s0 = ((hi & 0xFFFF) + alpha + k1 + (1 << 17) - rho - U) >> 16
    bad[r0, DC.c0], bad[r0, DC.c1] = s0 & 1, s0 >> 1
    e = ((hi >> 16) + s0 + (1 << 16) - V - 2) >> 16
    bad[r0, DC.m_s_bits.start] = e & 1
    bad[r0, DC.m_s_bits.start + 1] = e >> 1
    dd = b - 1 - rf  # case (rho=0, b31=0): r + 1 + D = b
    bad[r0, DC.m_d_bits.start : DC.m_d_bits.stop] = bits(dd)
    bad[r0, DC.m_s_bits.start + 3] = ((rf & 0xFFFF) + 1
                                      + (dd & 0xFFFF)) >> 16
    bad[r0, DC.rdv.start] = qf & 0xFFFF
    bad[r0, DC.rdv.start + 1] = qf >> 16
    pub = witness.to_public_values(w.pub)
    ok, failures = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad),
                                           pub)
    assert not ok


def test_mulh_tampered_result_fails():
    res, w = run_and_witness(guests.signed_m_guest(),
                             guests.words([0xFFFFFFF9, 3]))
    rows = np.nonzero(w.data[:REAL, DC.is_m] * w.data[:REAL, DC.f3.start + 1])[0]
    assert rows.size == 1
    bad = w.data.copy()
    bad[rows[0], DC.rdv.start] = (bad[rows[0], DC.rdv.start] + 1) % F.P
    pub = witness.to_public_values(w.pub)
    ok, _ = debug.check_constraints(AIR, F.fp(w.ctrl), F.fp(bad), pub)
    assert not ok
