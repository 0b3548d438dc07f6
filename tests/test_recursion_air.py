"""Recursion VM + AIR: evaluator parity, witness satisfaction, degrees, e2e.

The recursion circuit is the TPU-native analogue of the reference's
`risc0-circuit-recursion-sys` programs (SURVEY.md §2.4); these tests are
the witness-level development loop for it (same strategy as
test_rv32im_air.py for the rv32im circuit).
"""

import numpy as np
import pytest

from boundless_tpu.air import debug
from boundless_tpu.air.degree import assert_degrees
from boundless_tpu.core import field as F
from boundless_tpu.core import poseidon2 as P2
from boundless_tpu.prover import stark
from boundless_tpu.recursion import air as rair
from boundless_tpu.recursion import vm

PO2 = 8
N = 1 << PO2


def _host_digest_of(elems):
    """Canonical digest words of P2.hash_elems over canonical elems."""
    mont = F.fp(np.asarray(elems, dtype=np.int64))
    return [int(x) for x in F.from_mont(P2.hash_elems(mont))]


def _build_demo():
    """A program exercising every op family.

    in0 (witness) = (7, 1, 2, 3); pub0 = in0 + (5,0,0,0) squared etc.;
    pub groups 1-2 = sponge hash of in0's components.
    """
    p = vm.Prog("demo")
    a = p.const((5, 0, 0, 0))
    b = p.input()
    c0 = p.mul(p.add(a, b), b)         # (a+b)*b
    d = p.muladd(c0, c0, b)            # c0^2 + b
    e = p.inv(d)                       # proves d != 0
    p.assert_eq(p.mul(d, e), p.one())
    # bit decomposition of a 16-bit value (+ canonical 31-bit variant)
    k = p.const((12345, 0, 0, 0))
    bits = p.decompose(k, 0, nbits=16)
    p.decompose(p.const((F.P - 1, 0, 0, 0)), 0, nbits=31)
    # select: bits[0] ? d : c0
    s = p.select(bits[0], d, c0)
    # publish: pub0 == d  (PUB op + assert)
    p.assert_eq(p.pub(0), d)
    # sponge hash of b's 4 components == pub groups 1,2
    h0, h1 = p.hash_packed([b], 4)
    p.assert_eq(p.pub(1), h0)
    p.assert_eq(p.pub(2), h1)
    # transcript usage: init, mix the digest, draw a challenge, use it
    p.t_init()
    p.t_mix_digest((h0, h1))
    chal = p.t_sample_ext()
    p.assert_eq(p.pub(3), chal)
    _ = s
    return p


def _demo_pub():
    """(prog, inputs, pub_vals) with host-computed expected publics."""
    prog = _build_demo()
    bv = (7, 1, 2, 3)
    P = F.P
    a = (5, 0, 0, 0)
    ab = tuple((x + y) % P for x, y in zip(a, bv))
    c0 = F.py_ext_mul(ab, bv)
    d = tuple((x + y) % P for x, y in zip(F.py_ext_mul(c0, c0), bv))
    digest = _host_digest_of(list(bv))
    # challenge: sponge over zero state absorbing digest then squeeze
    st = [0] * 24
    for j in range(8):
        st[j] = (st[j] + digest[j]) % P
    st = vm.perm_canonical(st)
    chal = st[:4]
    pub_vals = list(d) + digest + list(chal)
    return prog, [bv], pub_vals


def test_perm_canonical_matches_core():
    rng = np.random.default_rng(0)
    state = rng.integers(0, F.P, size=24, dtype=np.int64)
    host = vm.perm_canonical([int(x) for x in state])
    core = F.from_mont(P2.permute(F.fp(state)))
    assert host == [int(x) for x in core]


def test_demo_witness_satisfies_air():
    prog, inputs, pub_vals = _demo_pub()
    ctrl = rair.rom_trace(prog, N)
    data = rair.data_trace(prog, inputs, pub_vals)
    pub = rair.pub_array(pub_vals)
    ok, failures = debug.check_constraints(rair.AIR, ctrl, data, pub)
    assert ok, failures


def test_tampered_wire_fails():
    prog, inputs, pub_vals = _demo_pub()
    ctrl = rair.rom_trace(prog, N)
    data = np.asarray(rair.data_trace(prog, inputs, pub_vals)).copy()
    # corrupt one out component of an active row
    data[3, vm.DC.out.start] ^= 5
    pub = rair.pub_array(pub_vals)
    ok, failures = debug.check_constraints(rair.AIR, ctrl, data, pub)
    assert not ok


def test_wrong_pub_unprovable():
    prog, inputs, pub_vals = _demo_pub()
    bad = list(pub_vals)
    bad[0] = (bad[0] + 1) % F.P
    with pytest.raises(vm.EvalError):
        vm.evaluate(prog.finalize(N), inputs, bad)


def test_bad_input_fails_asserts():
    prog, inputs, pub_vals = _demo_pub()
    with pytest.raises(vm.EvalError):
        vm.evaluate(prog.finalize(N), [(8, 1, 2, 3)], pub_vals)


def test_degree_audit():
    pub = rair.pub_array([0] * vm.PUB_VALS)
    degs = assert_degrees(rair.AIR, pub, po2=5, expand=16)
    assert max(d.degree for d in degs) <= 5 * ((1 << 5) - 1)


@pytest.mark.slow
def test_recursion_e2e_prove_verify():
    prog, inputs, pub_vals = _demo_pub()
    ctrl = rair.rom_trace(prog, N)
    data = rair.data_trace(prog, inputs, pub_vals)
    pub = rair.pub_array(pub_vals)
    ps = stark.ProofSystem(queries=8, fri_min_degree=16)
    proof = stark.prove(rair.AIR, data, pub, PO2, ps=ps, ctrl_trace=ctrl)
    root = stark.control_root_of(rair.AIR, PO2, ctrl, ps)
    assert bool(stark.verify(rair.AIR, proof, pub, PO2,
                             control_root=root, ps=ps))
    # tampered pub must fail
    bad = rair.pub_array([(pub_vals[0] + 1) % F.P] + pub_vals[1:])
    assert not bool(stark.verify(rair.AIR, proof, bad, PO2,
                                 control_root=root, ps=ps))


def test_transcript_parity_in_circuit():
    """In-circuit t_* macros replay core.transcript.Transcript exactly,
    including unaligned ext squeezes and mid-transcript mix_elems."""
    from boundless_tpu.core.transcript import Transcript

    rng = np.random.default_rng(3)
    digest = [int(x) for x in rng.integers(0, F.P, size=8)]
    vals = [int(x) for x in rng.integers(0, F.P, size=18)]

    # --- host replay ---
    tr = Transcript()
    tr.mix_digest(F.fp(np.asarray(digest, dtype=np.int64)))
    e1 = [int(x) for x in F.from_mont(tr.sample_ext())]
    idx = int(tr.sample_u32()) & 0x1FF
    tr.mix_elems(F.fp(np.asarray(vals, dtype=np.int64)))
    e2 = [int(x) for x in F.from_mont(tr.sample_ext())]
    _ = int(tr.sample_u32()) & 0x1FF  # shift pool to 6 (unaligned)
    e3 = [int(x) for x in F.from_mont(tr.sample_ext())]

    # --- circuit ---
    p = vm.Prog("transcript")
    d0, d1 = p.input(), p.input()
    ew = [p.input() for _ in range(5)]  # 18 elems packed 4-per-wire
    p.t_init()
    p.t_mix_digest((d0, d1))
    w1 = p.t_sample_ext()
    _, widx = p.t_sample_u32_bits(9)
    p.t_mix_elems(ew, 18)
    w2 = p.t_sample_ext()
    p.t_sample_u32_bits(9)
    w3 = p.t_sample_ext()
    p.assert_eq(w1, p.pub(0))
    p.assert_eq(widx, p.pub(1))
    p.assert_eq(w2, p.pub(2))
    p.assert_eq(w3, p.pub(3))

    pub_vals = e1 + [idx, 0, 0, 0] + e2 + e3
    packed = [tuple(digest[0:4]), tuple(digest[4:8])]
    padded = vals + [0, 0]
    packed += [tuple(padded[4 * i : 4 * i + 4]) for i in range(5)]
    n = 1 << 11
    prog = p.finalize(n)
    data = vm.evaluate(prog, packed, pub_vals)  # raises on any mismatch

    # and the witness satisfies the AIR
    ctrl = rair.rom_trace(prog, n)
    pub = rair.pub_array(pub_vals)
    ok, failures = debug.check_constraints(rair.AIR, ctrl, F.fp(data), pub)
    assert ok, failures
