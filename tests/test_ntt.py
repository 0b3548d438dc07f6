"""NTT / LDE tests against exact O(N^2) Python-int DFT."""

import numpy as np
import jax
import jax.numpy as jnp

from boundless_tpu.core import field as F
from boundless_tpu.core import ntt as NTT

rng = np.random.default_rng(1)


def slow_dft(x, root):
    n = len(x)
    out = []
    for f in range(n):
        acc = 0
        wf = pow(root, f, F.P)
        wfi = 1
        for i in range(n):
            acc = (acc + int(x[i]) * wfi) % F.P
            wfi = wfi * wf % F.P
        out.append(acc)
    return np.array(out, dtype=np.int64)


def test_ntt_matches_slow_dft():
    for n in (2, 4, 8, 16):
        x = rng.integers(0, F.P, size=n, dtype=np.int64)
        got = np.asarray(F.from_mont(NTT.ntt(F.fp(x)[:, None]))[:, 0], np.int64)
        expect = slow_dft(x, F.ROU_FWD[n.bit_length() - 1])
        np.testing.assert_array_equal(got, expect)


def test_ntt_roundtrip_batched():
    n, b = 256, 8
    x = rng.integers(0, F.P, size=(n, b), dtype=np.int64)
    xm = F.fp(x)
    back = np.asarray(F.from_mont(NTT.intt(NTT.ntt(xm))), np.int64)
    np.testing.assert_array_equal(back, x)


def test_coset_lde_roundtrip_and_consistency():
    n, b = 64, 3
    coeffs = rng.integers(0, F.P, size=(n, b), dtype=np.int64)
    cm = F.fp(coeffs)
    evals = NTT.coset_evaluate(cm)  # (4n, b)
    assert evals.shape == (4 * n, b)
    back = np.asarray(F.from_mont(NTT.coset_interpolate(evals)), np.int64)
    np.testing.assert_array_equal(back, coeffs)
    # Check one evaluation point manually: row i is p(g * w^i).
    w = F.ROU_FWD[(4 * n).bit_length() - 1]
    for i in (0, 1, 17):
        x = F.GENERATOR * pow(w, i, F.P) % F.P
        expect = 0
        for d in range(n - 1, -1, -1):
            expect = (expect * x + int(coeffs[d, 0])) % F.P
        assert int(np.asarray(F.from_mont(evals))[i, 0]) == expect


def test_sum_mod():
    x = rng.integers(0, F.P, size=(1000, 5), dtype=np.int64)
    got = np.asarray(F.from_mont(F.sum_mod(F.fp(x), axis=0)), np.int64)
    np.testing.assert_array_equal(got, x.sum(axis=0) % F.P)


def test_eval_poly_ext():
    n, c = 32, 2
    coeffs = rng.integers(0, F.P, size=(n, c), dtype=np.int64)
    z = rng.integers(0, F.P, size=4, dtype=np.int64)
    got = np.asarray(F.from_mont(NTT.eval_poly_ext(F.fp(coeffs), F.ext(z))), np.int64)
    # Reference: Horner in the extension with python ints.
    for col in range(c):
        acc = (0, 0, 0, 0)
        for d in range(n - 1, -1, -1):
            acc = F.py_ext_mul(acc, tuple(int(v) for v in z))
            acc = ((acc[0] + int(coeffs[d, col])) % F.P,) + acc[1:]
        np.testing.assert_array_equal(got[col], np.array(acc, np.int64))


def test_ext_powers():
    z = rng.integers(0, F.P, size=4, dtype=np.int64)
    pows = np.asarray(F.from_mont(NTT.ext_powers(F.ext(z), 9)), np.int64)
    acc = (1, 0, 0, 0)
    for i in range(9):
        np.testing.assert_array_equal(pows[i], np.array(acc, np.int64))
        acc = F.py_ext_mul(acc, tuple(int(v) for v in z))
