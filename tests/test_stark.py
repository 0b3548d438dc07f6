"""End-to-end STARK prove/verify round-trips on toy AIRs.

Exercises every committed group: ctrl (selectors), data, accum (ext
grand-product with a mix challenge), plus the check polynomial and FRI.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boundless_tpu.core import field as F
from boundless_tpu.air import dsl
from boundless_tpu.prover import stark

rng = np.random.default_rng(4)

PO2 = 6
N = 1 << PO2
PS = stark.ProofSystem(queries=8, fri_min_degree=16)


def selectors(n):
    """ctrl columns: [not_last, is_first] as canonical ints."""
    not_last = np.ones(n, dtype=np.int64)
    not_last[n - 1] = 0
    is_first = np.zeros(n, dtype=np.int64)
    is_first[0] = 1
    return not_last, is_first


class FibAir(dsl.Air):
    name = "fib"
    ctrl_cols = 1  # not_last
    data_cols = 2  # a, b
    accum_cols = 0
    globals_count = 0
    max_degree = 2

    def ctrl_trace(self, n):
        not_last, _ = selectors(n)
        return F.fp(not_last[:, None])

    def constraints(self, alg, now, nxt, globals_, pub):
        nl = now.ctrl[0]
        a, b = now.data[0], now.data[1]
        an, bn = nxt.data[0], nxt.data[1]
        return [
            alg.mul(nl, alg.sub(an, b)),
            alg.mul(nl, alg.sub(bn, alg.add(a, b))),
        ]


def fib_trace(n):
    a, b = 1, 1
    rows = []
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % F.P
    return F.fp(np.array(rows, dtype=np.int64))


class ProdAir(dsl.Air):
    """Grand product accum[i] = prod_{j<=i} (data[j] + gamma)."""

    name = "prod"
    ctrl_cols = 2  # not_last, is_first
    data_cols = 1
    accum_cols = 4  # one ext accumulator
    globals_count = 1
    max_degree = 3

    def ctrl_trace(self, n):
        not_last, is_first = selectors(n)
        return F.fp(np.stack([not_last, is_first], axis=1))

    def accum_trace(self, ctrl, data, globals_):
        gamma = globals_[0]
        terms = F.ext_add(F.ext_from_base(data[:, 0]),
                          jnp.broadcast_to(gamma, (data.shape[0], 4)))
        acc = jax.lax.associative_scan(F.ext_mul, terms, axis=0)
        return acc  # (N, 4) -> 4 base columns

    def constraints(self, alg, now, nxt, globals_, pub):
        gamma = globals_[0]
        nl, fst = now.ctrl[0], now.ctrl[1]
        d_now, d_nxt = now.data[0], nxt.data[0]
        acc_now = alg.read_ext(now.accum, 0)
        acc_nxt = alg.read_ext(nxt.accum, 0)
        term_nxt = alg.eadd(alg.lift(d_nxt), gamma)
        term_now = alg.eadd(alg.lift(d_now), gamma)
        trans = alg.esub(acc_nxt, alg.emul(acc_now, term_nxt))
        init = alg.esub(acc_now, term_now)
        return [
            stark.ExtVal(alg.escale(trans, nl)),
            stark.ExtVal(alg.escale(init, fst)),
        ]


def digest_of(x):
    from boundless_tpu.core import poseidon2 as P2

    return P2.hash_elems(F.fp(np.asarray(x, dtype=np.int64)))


@pytest.mark.slow
def test_fib_roundtrip_and_tamper():
    air = FibAir()
    trace = fib_trace(N)
    pub = digest_of([1, 2, 3])
    prover = stark.make_prover(air, PO2, PS)
    verifier = stark.make_verifier(air, PO2, PS)
    ctrl_root = stark.control_root_of(air, PO2)
    proof = prover(trace, pub)
    ok = verifier(proof, pub, ctrl_root)
    assert bool(ok)

    # Wrong public digest -> fail
    ok2 = verifier(proof, digest_of([9]), ctrl_root)
    assert not bool(ok2)

    # Invalid trace -> proving it yields a proof that fails ALI
    bad = np.asarray(F.from_mont(trace), np.int64).copy()
    bad[5, 0] = (bad[5, 0] + 1) % F.P
    bad_proof = prover(F.fp(bad), pub)
    ok3 = verifier(bad_proof, pub, ctrl_root)
    assert not bool(ok3)


@pytest.mark.slow
def test_prod_air_with_accum_and_globals():
    air = ProdAir()
    data = F.fp(rng.integers(0, F.P, size=(N, 1), dtype=np.int64))
    pub = digest_of([7])
    prover = stark.make_prover(air, PO2, PS)
    verifier = stark.make_verifier(air, PO2, PS)
    ctrl_root = stark.control_root_of(air, PO2)
    proof = prover(data, pub)
    ok = verifier(proof, pub, ctrl_root)
    assert bool(ok)

    # Tampered accum root -> fail
    bad = proof._replace(accum_root=proof.data_root)
    ok2 = verifier(bad, pub, ctrl_root)
    assert not bool(ok2)


@pytest.mark.slow
def test_degree_split_bit_identical():
    """The N/2N/4N constraint domain split (SPLIT_MIN_ROWS) must produce
    the exact proof of the single-grid path (same Q polynomial, exact
    field arithmetic — see stark.prove eval_bucket)."""
    from boundless_tpu.zkvm import prove, guests, witness
    from boundless_tpu.zkvm.executor import Executor

    po2 = 12
    ps = stark.ProofSystem(queries=4, fri_min_degree=16)
    image = guests.echo()
    ex = Executor(image, guests.words([2, 7, 9]), segment_po2=po2)
    seg = ex.run().segments[0]
    w = witness.trace_segment(image, seg, po2)
    variant = prove.air_variant_of(image)
    air = prove._AIRS[variant]
    data = F.fp(witness.data_for_variant(w.data, variant))
    ctrl, _ = prove._image_ctrl(image, po2)
    pub = witness.to_public_values(w.pub)

    assert stark.SPLIT_MIN_ROWS <= (1 << po2)
    p_split = jax.jit(
        lambda d, p, c: stark.prove(air, d, p, po2, ps, c))(data, pub, ctrl)
    old = stark.SPLIT_MIN_ROWS
    try:
        stark.SPLIT_MIN_ROWS = 1 << 30
        p_ref = jax.jit(
            lambda d, p, c: stark.prove(air, d, p, po2, ps, c))(
                data, pub, ctrl)
    finally:
        stark.SPLIT_MIN_ROWS = old
    a = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, p_split))
    b = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, p_ref))
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
