"""C++ recursion-VM evaluator (native/rec_eval.cpp) parity with the
Python replay (vm.evaluate) — bit-identical traces and matching error
semantics across every op family."""

import numpy as np
import pytest

from boundless_tpu.recursion import claims, programs, vm


def _all_ops_prog():
    """A program touching every op family: GEN algebra, INPUT, BIT
    (bit + eqz hints), PUB, INV, AZ, the Poseidon2 rows (hash + transcript
    macros), decomposition, and selects."""
    p = vm.Prog("parity")
    a = p.input()
    b = p.input()
    s = p.add(a, b)
    d = p.sub(s, b)
    p.assert_eq(d, a)
    m = p.mul(a, b)
    q = p.muladd(a, b, s)
    p.assert_eq(q, p.add(m, s))
    sc = p.scale(m, (3, 1, 4, 1))
    iv = p.inv(p.addc(sc, 1))
    one = p.one()
    p.assert_eq(p.mul(p.addc(sc, 1), iv), one)
    # bits + eqz + select
    bits = p.decompose(a, 0, nbits=31)
    z = p.flag_eqz(p.sub(a, a))
    p.assert_eq(z, one)
    sel = p.select(bits[0], m, q)
    ib = p.input_bit()
    p.select(ib, sel, d)
    # pub groups
    for g in range(vm.NPUB_GROUPS):
        p.pub(g)
    # hashing + transcript macros
    d0, d1 = p.hash_packed([a, b, m], 10)
    p.t_init()
    p.t_mix_digest((d0, d1))
    p.t_sample_ext()
    p.t_sample_elem()
    p.t_sample_u32_bits(13)
    p.t_mix_elems([a, b], 8)
    p.finalize(1 << 13)
    return p


IN = [(5, 0, 0, 0), (7, 11, 0, 0), (1, 0, 0, 0)]
PUB = list(range(1, 25))


def test_native_matches_python_trace():
    p = _all_ops_prog()
    py = vm.evaluate(p, IN, PUB)
    nat = vm.evaluate_native(p, IN, PUB)
    assert py.shape == nat.shape
    assert np.array_equal(py, nat)


def test_native_matches_on_claim_stub():
    """The claim-packing stub (exactly what fast join tests prove)."""
    p = vm.Prog("stub")
    cw = [p.input() for _ in range(claims.CLAIM_WIRES)]
    d0, d1 = p.hash_packed(cw, claims.CLAIM_ELEMS)
    p.assert_eq(d0, p.pub(0))
    p.assert_eq(d1, p.pub(1))
    p.finalize(1 << 11)
    c = claims.Claim(
        image_id=tuple(range(1, 9)), pre_pc=4096, post_pc=4160, halted=1,
        pre_regs=(0,) * 64, post_regs=tuple(range(64)),
        pre_seqs=(0, 0, 0), post_seqs=(1, 0, 0),
        pre_journal=claims.ZERO_CHAIN,
        post_journal=claims.fold_words(claims.ZERO_CHAIN, [9]),
        pre_input=claims.ZERO_CHAIN, post_input=claims.ZERO_CHAIN,
        pre_assumptions=claims.ZERO_CHAIN,
        post_assumptions=claims.ZERO_CHAIN)
    wit = programs._pack4(c.to_elems())
    pub = list(c.digest()) + [0] * 16
    py = vm.evaluate(p, wit, pub)
    nat = vm.evaluate_native(p, wit, pub)
    assert np.array_equal(py, nat)


def test_native_error_parity():
    p = _all_ops_prog()
    # assert_zero failure (corrupt the input_bit witness: 2*2 != 2)
    bad = list(IN)
    bad[2] = (2, 0, 0, 0)
    with pytest.raises(vm.EvalError):
        vm.evaluate(p, bad, PUB)
    with pytest.raises(vm.EvalError):
        vm.evaluate_native(p, bad, PUB)
    # input stream exhausted
    with pytest.raises(vm.EvalError):
        vm.evaluate_native(p, IN[:1], PUB)
    # unconsumed inputs
    with pytest.raises(vm.EvalError):
        vm.evaluate_native(p, IN + [(1, 2, 3, 4)], PUB)
    # inverse of zero
    q = vm.Prog("inv0")
    x = q.input()
    q.inv(x)
    q.finalize(8)
    with pytest.raises(vm.EvalError):
        vm.evaluate_native(q, [(0, 0, 0, 0)], [])
    with pytest.raises(vm.EvalError):
        vm.evaluate(q, [(0, 0, 0, 0)], [])


def test_native_speed_sanity():
    """The native evaluator should beat the Python replay comfortably on
    a hash-heavy program (soft check: >= 5x)."""
    import time

    p = vm.Prog("speed")
    w = p.input()
    for _ in range(200):
        d0, d1 = p.hash_packed([w], 4)
        w = d0
    p.finalize(1 << 15)
    t0 = time.time()
    py = vm.evaluate(p, [(1, 2, 3, 4)], [])
    t_py = time.time() - t0
    vm.evaluate_native(p, [(1, 2, 3, 4)], [])  # warm (compile)
    t0 = time.time()
    nat = vm.evaluate_native(p, [(1, 2, 3, 4)], [])
    t_nat = time.time() - t0
    assert np.array_equal(py, nat)
    assert t_nat < t_py / 5, (t_py, t_nat)
