"""Baby Bear field tests against exact Python-int arithmetic."""

import numpy as np
import jax.numpy as jnp

from boundless_tpu.core import field as F

rng = np.random.default_rng(0)


def rand_canonical(shape):
    return rng.integers(0, F.P, size=shape, dtype=np.int64)


def test_constants():
    assert F.P == 15 * 2**27 + 1
    assert F.R_MOD_P == (1 << 32) % F.P
    assert F.R2_MOD_P == pow(1 << 32, 2, F.P)
    assert F.NP == (-pow(F.P, -1, 1 << 32)) % (1 << 32)
    assert pow(F.ROU_FWD_27, 1 << 27, F.P) == 1
    assert pow(F.ROU_FWD_27, 1 << 26, F.P) != 1
    for i in range(F.TWO_ADICITY + 1):
        assert pow(F.ROU_FWD[i], 1 << i, F.P) == 1
        assert F.ROU_FWD[i] * F.ROU_REV[i] % F.P == 1


def test_mont_roundtrip():
    x = rand_canonical((64,))
    xm = F.fp(x)
    back = np.asarray(F.from_mont(xm), dtype=np.int64)
    np.testing.assert_array_equal(back, x)


def test_mul32_wide_exact():
    a = rng.integers(0, 1 << 32, size=(1024,), dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=(1024,), dtype=np.uint64)
    hi, lo = F.mul32_wide(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)))
    prod = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi, dtype=np.uint64), np.array([p >> 32 for p in prod], dtype=np.uint64))
    np.testing.assert_array_equal(np.asarray(lo, dtype=np.uint64), np.array([p & 0xFFFFFFFF for p in prod], dtype=np.uint64))


def test_add_sub_mul():
    a = rand_canonical((512,))
    b = rand_canonical((512,))
    am, bm = F.fp(a), F.fp(b)
    np.testing.assert_array_equal(
        np.asarray(F.from_mont(F.add(am, bm)), np.int64), (a + b) % F.P)
    np.testing.assert_array_equal(
        np.asarray(F.from_mont(F.sub(am, bm)), np.int64), (a - b) % F.P)
    np.testing.assert_array_equal(
        np.asarray(F.from_mont(F.mul(am, bm)), np.int64), (a * b) % F.P)


def test_edge_values():
    vals = np.array([0, 1, 2, F.P - 1, F.P - 2, 1 << 16, (1 << 16) - 1], dtype=np.int64)
    a = np.repeat(vals, len(vals))
    b = np.tile(vals, len(vals))
    am, bm = F.fp(a), F.fp(b)
    np.testing.assert_array_equal(
        np.asarray(F.from_mont(F.mul(am, bm)), np.int64), (a * b) % F.P)
    np.testing.assert_array_equal(
        np.asarray(F.from_mont(F.neg(am)), np.int64), (-a) % F.P)


def test_inv():
    a = rand_canonical((128,))
    a[0] = 1
    am = F.fp(a)
    got = np.asarray(F.from_mont(F.inv(am)), np.int64)
    expect = np.array([pow(int(x), F.P - 2, F.P) for x in a], dtype=np.int64)
    np.testing.assert_array_equal(got, expect)


def test_pow_const():
    a = rand_canonical((32,))
    am = F.fp(a)
    for e in (0, 1, 2, 7, 31, F.P - 2):
        got = np.asarray(F.from_mont(F.pow_const(am, e)), np.int64)
        expect = np.array([pow(int(x), e, F.P) for x in a], dtype=np.int64)
        np.testing.assert_array_equal(got, expect)


def test_ext_mul_matches_reference():
    a = rand_canonical((64, 4))
    b = rand_canonical((64, 4))
    am, bm = F.ext(a), F.ext(b)
    got = np.asarray(F.from_mont(F.ext_mul(am, bm)), np.int64)
    for i in range(64):
        expect = F.py_ext_mul(tuple(a[i]), tuple(b[i]))
        np.testing.assert_array_equal(got[i], np.array(expect, np.int64))


def test_ext_inv():
    a = rand_canonical((64, 4))
    am = F.ext(a)
    prod = F.ext_mul(am, F.ext_inv(am))
    got = np.asarray(F.from_mont(prod), np.int64)
    expect = np.zeros((64, 4), np.int64)
    expect[:, 0] = 1
    np.testing.assert_array_equal(got, expect)


def test_ext_embed_and_scale():
    a = rand_canonical((16,))
    s = rand_canonical((16,))
    e = F.ext_from_base(F.fp(a))
    scaled = F.ext_scale(e, F.fp(s))
    got = np.asarray(F.from_mont(scaled), np.int64)
    np.testing.assert_array_equal(got[:, 0], a * s % F.P)
    assert (got[:, 1:] == 0).all()
