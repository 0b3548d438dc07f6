"""FRI prove/verify round-trip tests (small parameters)."""

import numpy as np
import jax.numpy as jnp

from boundless_tpu.core import field as F
from boundless_tpu.core import ntt as NTT
from boundless_tpu.core import fri
from boundless_tpu.core.transcript import Transcript

rng = np.random.default_rng(3)

N = 256  # poly degree bound
M = N * 4  # domain size
MIN_DEG = 16
Q = 8


def make_evals(degree=N):
    """Random ext poly of given degree evaluated on GENERATOR * H_M."""
    coeffs = rng.integers(0, F.P, size=(degree, 4), dtype=np.int64)
    cm = F.ext(coeffs)
    # Evaluate each ext component independently (linear): coset NTT per comp.
    evals = NTT.coset_evaluate(cm, expand=M // degree)
    return evals, coeffs


def test_fri_roundtrip():
    evals, _ = make_evals()
    tr = Transcript()
    proof, _ = fri.prove(tr, evals, queries=Q, min_degree=MIN_DEG)
    tv = Transcript()
    ok, idx, round0 = fri.verify(tv, proof, M, queries=Q, min_degree=MIN_DEG)
    assert bool(ok)
    # round0 values must equal the committed evaluations at the query points
    expect = np.asarray(evals)[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(round0), expect)


def test_fri_rejects_high_degree():
    # Degree-M/2 polynomial exceeds the M/4 bound -> verification must fail.
    evals, _ = make_evals(degree=M // 2)
    tr = Transcript()
    proof, _ = fri.prove(tr, evals, queries=Q, min_degree=MIN_DEG)
    tv = Transcript()
    ok, _, _ = fri.verify(tv, proof, M, queries=Q, min_degree=MIN_DEG)
    assert not bool(ok)


def test_fri_rejects_tamper():
    evals, _ = make_evals()
    tr = Transcript()
    proof, _ = fri.prove(tr, evals, queries=Q, min_degree=MIN_DEG)
    bad_rows = list(proof.round_rows)
    bad_rows[0] = bad_rows[0].at[0, 0].set(F.add(bad_rows[0][0, 0], F.fp(1)))
    bad = proof._replace(round_rows=tuple(bad_rows))
    tv = Transcript()
    ok, _, _ = fri.verify(tv, bad, M, queries=Q, min_degree=MIN_DEG)
    assert not bool(ok)


def test_fold16_matches_direct_formula():
    """Prover's 4x radix-2 fold == the verifier's direct sum formula."""
    m = 64
    coeffs = rng.integers(0, F.P, size=(m, 4), dtype=np.int64)
    cm = F.ext(coeffs)  # treat as arbitrary evals on GENERATOR*H_m
    evals = cm
    alpha = F.ext(rng.integers(0, F.P, size=4, dtype=np.int64))
    folded = fri._fold16(evals, alpha, m, F.GENERATOR)  # (m/16, 4)
    # direct formula at every group r
    rows_n = m // 16
    inv_tbl = jnp.asarray(fri._domain_inv_table(m, F.GENERATOR))
    got = np.asarray(F.from_mont(folded), np.int64)
    ev = np.asarray(F.from_mont(evals), np.int64)
    invt = np.asarray(F.from_mont(jnp.asarray(inv_tbl)), np.int64)
    a = tuple(int(v) for v in np.asarray(F.from_mont(alpha), np.int64))
    inv16 = pow(16, F.P - 2, F.P)
    for r in range(rows_n):
        acc = (0, 0, 0, 0)
        for t in range(16):
            i = r + t * rows_n
            ax = tuple(int(v) * int(invt[i]) % F.P for v in a)
            s = (1, 0, 0, 0)
            p = ax
            total = (0, 0, 0, 0)
            cur = (1, 0, 0, 0)
            for j in range(16):
                total = tuple((x + y) % F.P for x, y in zip(total, cur))
                cur = F.py_ext_mul(cur, ax)
            term = F.py_ext_mul(tuple(int(v) for v in ev[i]), total)
            acc = tuple((x + y) % F.P for x, y in zip(acc, term))
        acc = tuple(x * inv16 % F.P for x in acc)
        np.testing.assert_array_equal(got[r], np.array(acc, np.int64))
