"""In-circuit STARK verification: the succinct-recursion core.

A recursion-VM program built by `StarkVerifier` verifies a real proof of
an inner AIR (ProdAir: ctrl + data + accum groups, one mix challenge —
the same shape class as rv32im). The program's witness is the serialized
proof; any tampering makes witness generation fail an in-circuit assert.

Reference parity target: risc0's lift/join recursion programs
(`prover/crates/workflow/src/tasks/prove.rs:95`, SURVEY.md §3.1).
"""

import numpy as np
import pytest

import tests.test_stark as ts
from boundless_tpu.air import debug
from boundless_tpu.core import field as F
from boundless_tpu.prover import stark
from boundless_tpu.recursion import air as rair
from boundless_tpu.recursion import programs, vm

INNER_PO2 = 6
PS = stark.ProofSystem(queries=4, fri_min_degree=16, commit_expand=2)
PUB_FLAT = [11, 22, 33]


@pytest.fixture(scope="module")
def inner_proof():
    air = ts.ProdAir()
    n = 1 << INNER_PO2
    rng = np.random.default_rng(5)
    data = F.fp(rng.integers(0, F.P, size=(n, 1), dtype=np.int64))
    pub = F.fp(np.asarray(PUB_FLAT, dtype=np.int64))
    proof = stark.prove(air, data, pub, INNER_PO2, ps=PS)
    root = stark.control_root_of(air, INNER_PO2, ps=PS)
    assert bool(stark.verify(air, proof, pub, INNER_PO2,
                             control_root=root, ps=PS))
    return air, proof, root


@pytest.fixture(scope="module")
def verifier_prog(inner_proof):
    air, _, _ = inner_proof
    res = programs.StarkVerifier(air, INNER_PO2, PS,
                                 pub_len=len(PUB_FLAT)).build()
    return res


def _finalize(prog):
    n = 1 << (len(prog.rows) + 1).bit_length()
    return prog.finalize(n), n


@pytest.mark.slow
def test_incircuit_verify_accepts(inner_proof, verifier_prog):
    air, proof, root = inner_proof
    prog, n = _finalize(verifier_prog.prog)
    inputs = programs.serialize_proof(air, proof, PUB_FLAT, INNER_PO2, PS)
    pub_vals = programs.verifier_pub_vals(PUB_FLAT, root)
    data = vm.evaluate(prog, inputs, pub_vals)  # all asserts pass
    # and the recursion AIR is satisfied by this execution
    ctrl = rair.rom_trace(prog, n)
    pub = rair.pub_array(pub_vals)
    ok, failures = debug.check_constraints(rair.AIR, ctrl, F.fp(data), pub)
    assert ok, failures


@pytest.mark.slow
def test_incircuit_verify_rejects_tampering(inner_proof, verifier_prog):
    air, proof, root = inner_proof
    prog, n = _finalize(verifier_prog.prog)
    base = programs.serialize_proof(air, proof, PUB_FLAT, INNER_PO2, PS)
    pub_vals = programs.verifier_pub_vals(PUB_FLAT, root)
    rng = np.random.default_rng(0)
    # tamper a sample of witness positions across the stream
    for k in sorted(rng.choice(len(base), size=8, replace=False)):
        bad = list(base)
        t = list(bad[k])
        t[0] = (t[0] + 1) % F.P
        bad[k] = tuple(t)
        with pytest.raises(vm.EvalError):
            vm.evaluate(prog, bad, pub_vals)


@pytest.mark.slow
def test_incircuit_verify_rejects_wrong_binding(inner_proof, verifier_prog):
    air, proof, root = inner_proof
    prog, n = _finalize(verifier_prog.prog)
    inputs = programs.serialize_proof(air, proof, PUB_FLAT, INNER_PO2, PS)
    # wrong claimed public values
    bad_pub = programs.verifier_pub_vals([99] + PUB_FLAT[1:], root)
    with pytest.raises(vm.EvalError):
        vm.evaluate(prog, inputs, bad_pub)
    # wrong claimed control root
    bad_root = np.asarray(root) ^ 2
    bad_pub2 = programs.verifier_pub_vals(PUB_FLAT, bad_root)
    with pytest.raises(vm.EvalError):
        vm.evaluate(prog, inputs, bad_pub2)


@pytest.mark.slow
def test_incircuit_verify_recursion_proof():
    """Self-recursion core: a recursion-VM program verifies a RecursionAir
    proof (what join does to its children). Exercises ProgAlg over the
    recursion AIR's own constraints (Poseidon state machine + WOM LogUp)."""
    import tests.test_recursion_air as tra

    prog, inputs, pub_vals = tra._demo_pub()
    n = 1 << 8
    ctrl = rair.rom_trace(prog, n)
    data = rair.data_trace(prog, inputs, pub_vals)
    pub = rair.pub_array(pub_vals)
    ps = stark.ProofSystem(queries=8, fri_min_degree=16)
    proof = stark.prove(rair.AIR, data, pub, 8, ps=ps, ctrl_trace=ctrl)
    root = stark.control_root_of(rair.AIR, 8, ctrl, ps)
    assert bool(stark.verify(rair.AIR, proof, pub, 8,
                             control_root=root, ps=ps))

    res = programs.StarkVerifier(rair.AIR, 8, ps, pub_len=vm.PUB_VALS).build()
    vprog = res.prog
    vn = 1 << (len(vprog.rows) + 1).bit_length()
    vprog.finalize(vn)
    pub_flat = [int(x) for x in pub_vals] + [0] * (vm.PUB_VALS - len(pub_vals))
    wit = programs.serialize_proof(rair.AIR, proof, pub_flat, 8, ps)
    outer_pub = programs.verifier_pub_vals(pub_flat, root)
    vdata = vm.evaluate(vprog, wit, outer_pub)

    vctrl = rair.rom_trace(vprog, vn)
    ok, failures = debug.check_constraints(
        rair.AIR, vctrl, F.fp(vdata), rair.pub_array(outer_pub))
    assert ok, failures

    # tamper: flip one element of the inner proof stream
    bad = list(wit)
    t = list(bad[100]); t[0] = (t[0] + 1) % F.P; bad[100] = tuple(t)
    with pytest.raises(vm.EvalError):
        vm.evaluate(vprog, bad, outer_pub)
