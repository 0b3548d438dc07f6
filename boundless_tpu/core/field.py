"""Baby Bear field arithmetic for TPU (JAX, uint32 Montgomery form).

TPU-native replacement for the risc0 CUDA field kernels (reference:
`risc0-sys`/`sppark` invoked behind `ProverServer::prove_segment`, see
reference `prover/crates/workflow/src/tasks/prove.rs:43-49`).

Design notes
------------
* Elements are stored as ``uint32`` arrays in **Montgomery form** with
  ``R = 2**32`` (same representation family as risc0's ``babybear`` Elem).
* The TPU has no native 64-bit integer multiply; we build an exact
  32x32 -> 64 product from four 16x16 partial products (all of which fit in
  uint32) and then do a standard Montgomery reduction. All ops are pure
  ``jnp`` element-wise code and therefore fuse well on the VPU, vectorize
  over arbitrary batch shapes, and run identically on CPU for testing.
* The quartic extension field is F_p[x]/(x^4 - 11) ("ExtElem" in risc0),
  represented as arrays whose trailing dimension is 4.

All functions are shape-polymorphic and jit-friendly (static control flow
only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants (computed with exact Python ints; see tests/test_field.py)
# ---------------------------------------------------------------------------

P = 2013265921  # 15 * 2**27 + 1
P_HEX = 0x78000001
TWO_ADICITY = 27
GENERATOR = 31  # multiplicative generator of F_p^*
R_MOD_P = 268435454  # 2**32 mod P  (Montgomery "one")
R2_MOD_P = 1172168163  # (2**32)**2 mod P (to-Montgomery factor)
NP = 2013265919  # -P^{-1} mod 2**32
ROU_FWD_27 = 440564289  # primitive 2^27-th root of unity (= 31^15 mod P)
BETA = 11  # extension field: x^4 - BETA
EXT_DEGREE = 4

_U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

# Per-order forward/reverse roots of unity, canonical form (Python ints).
ROU_FWD = [1] * (TWO_ADICITY + 1)
ROU_FWD[TWO_ADICITY] = ROU_FWD_27
for _i in range(TWO_ADICITY - 1, -1, -1):
    ROU_FWD[_i] = (ROU_FWD[_i + 1] * ROU_FWD[_i + 1]) % P
ROU_REV = [pow(r, P - 2, P) for r in ROU_FWD]
assert ROU_FWD[1] == P - 1


# ---------------------------------------------------------------------------
# uint32 helpers
# ---------------------------------------------------------------------------


def _u32c(x: int) -> np.uint32:
    # numpy scalar: inlined as a literal in jaxprs (Pallas kernels cannot
    # close over device constants).
    return np.uint32(x & 0xFFFFFFFF)


def mul32_wide(a, b):
    """Exact 32x32 -> 64 bit product as a (hi, lo) pair of uint32.

    Built from four 16x16 partial products; every intermediate provably fits
    in uint32 (see module docstring).
    """
    a = a.astype(_U32)
    b = b.astype(_U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + (ll >> 16): max (2^16-1)^2 + (2^16-1) < 2^32, no overflow.
    mid = lh + (ll >> 16)
    # mid2 = hl + (mid & 0xffff): same bound, no overflow.
    mid2 = hl + (mid & MASK16)
    lo = (mid2 << 16) | (ll & MASK16)
    hi = hh + (mid >> 16) + (mid2 >> 16)
    return hi, lo


# ---------------------------------------------------------------------------
# Base field (Montgomery form)
# ---------------------------------------------------------------------------


def _mont_reduce_generic(hi, lo):
    m = lo * _u32c(NP)  # low 32 bits only, by construction
    h2, l2 = mul32_wide(m, _u32c(P))
    # lo + l2 == 0 mod 2^32 exactly; carry is 1 iff lo != 0.
    carry = (lo != 0).astype(_U32)
    res = hi + h2 + carry  # < 2P, no uint32 overflow (hi<2^30, h2<2^31)
    return jnp.where(res >= _u32c(P), res - _u32c(P), res)


def _mont_reduce_bb(hi, lo):
    """Baby Bear-shaped reduction: hi32(m*P) via P = 15*2^27 + 1.

    m*P = t*2^27 + m with t = 15*m (36 bits), so the wide product with the
    constant P needs only two small multiplies (by 15) instead of the
    generic four 16x16 partials.
    """
    m = lo * _u32c(NP)
    a = (m >> 16) * _u32c(15)  # < 2^20
    b = (m & MASK16) * _u32c(15)  # < 2^20
    t_lo = (a << 16) + b  # low 32 bits of t = 15*m
    t_hi = (a >> 16) + (t_lo < b).astype(_U32)  # top 4 bits of t
    u = (t_hi << 27) | (t_lo >> 5)  # floor(t / 32)
    vm = ((t_lo & _u32c(31)) << 27) + m  # low bits of m*P (mod 2^32)
    h2 = u + (vm < m).astype(_U32)  # hi32(m*P)
    res = hi + h2 + (lo != 0).astype(_U32)
    return jnp.where(res >= _u32c(P), res - _u32c(P), res)


_REDUCE_IMPL = os.environ.get("BT_MONT_REDUCE", "bb")
_mont_reduce = _mont_reduce_bb if _REDUCE_IMPL == "bb" else _mont_reduce_generic

# --- 64-bit Montgomery product (host/CPU path) ------------------------------
# The TPU has no 64-bit integer multiply, so the default `mul` builds the
# wide product from 16x16 partials (~30 traced ops). On CPU (tests, the
# driver's virtual-mesh dryrun) a native uint64 product computes the exact
# same Montgomery result in ~13 ops — halving the traced graph of
# constraint-heavy provers and, with it, XLA CPU compile time. Enable with
# `enable_u64()` (requires jax x64 mode); results are bit-identical.

_USE_U64 = False


def enable_u64():
    """Switch `mul` to the uint64 Montgomery product (CPU only)."""
    global _USE_U64
    jax.config.update("jax_enable_x64", True)
    _USE_U64 = True


def _mul_u64(a, b):
    wide = a.astype(jnp.uint64) * b.astype(jnp.uint64)
    m = wide.astype(_U32) * _u32c(NP)  # low 32 bits of wide, times NP
    t = (wide + m.astype(jnp.uint64) * np.uint64(P)) >> np.uint64(32)
    t32 = t.astype(_U32)  # t < 2P < 2^32: exact
    return jnp.where(t32 >= _u32c(P), t32 - _u32c(P), t32)


def mont_reduce(hi, lo):
    """Montgomery reduction of a 64-bit value (hi*2^32 + lo) -> value*R^{-1} mod P.

    Requires hi*2^32 + lo < P * 2^32 (true for products of reduced elements).
    Result is fully reduced to [0, P).
    """
    return _mont_reduce(hi, lo)


def mul(a, b):
    """Montgomery product: (a * b * R^{-1}) mod P."""
    if _USE_U64:
        return _mul_u64(jnp.asarray(a), jnp.asarray(b))
    hi, lo = mul32_wide(a.astype(_U32), b.astype(_U32))
    return mont_reduce(hi, lo)


def add(a, b):
    s = a.astype(_U32) + b.astype(_U32)  # < 2P < 2^32
    return jnp.where(s >= _u32c(P), s - _u32c(P), s)


def sub(a, b):
    a = a.astype(_U32)
    b = b.astype(_U32)
    return jnp.where(a >= b, a - b, a + _u32c(P) - b)


def neg(a):
    a = a.astype(_U32)
    return jnp.where(a == 0, a, _u32c(P) - a)


def to_mont(x):
    """Canonical uint32 (in [0, P)) -> Montgomery form."""
    return mul(x.astype(_U32), jnp.full_like(x, R2_MOD_P, dtype=_U32))


def from_mont(x):
    """Montgomery form -> canonical uint32 in [0, P)."""
    return mont_reduce(jnp.zeros_like(x, dtype=_U32), x.astype(_U32))


def fp(x) -> jnp.ndarray:
    """Lift Python ints / numpy ints (canonical) into Montgomery device form."""
    arr = jnp.asarray(np.asarray(x, dtype=np.int64) % P, dtype=_U32)
    return to_mont(arr)


ONE = R_MOD_P  # Montgomery encoding of 1
ZERO = 0


def ones(shape):
    return jnp.full(shape, _u32c(ONE), dtype=_U32)


def zeros(shape):
    return jnp.zeros(shape, dtype=_U32)


def pow_const(a, e: int):
    """a ** e for a static Python exponent (binary ladder, unrolled)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        return ones(jnp.shape(a))
    return result


def inv(a):
    """Batched inversion via Fermat: a^(P-2). inv(0) = 0."""
    return pow_const(a, P - 2)


def mont(x: int) -> int:
    """Python-int canonical -> Montgomery encoding (exact)."""
    return (x % P) * (1 << 32) % P


def unmont(x: int) -> int:
    return x * pow(1 << 32, P - 2, P) % P


# ---------------------------------------------------------------------------
# Quartic extension field  F_p[x] / (x^4 - 11)
# ---------------------------------------------------------------------------
# Arrays have trailing dim 4 (coefficients low-to-high), Montgomery form.


def ext_from_base(a):
    """Embed base-field array into the extension (trailing dim 4)."""
    z = jnp.zeros(jnp.shape(a) + (EXT_DEGREE,), dtype=_U32)
    return z.at[..., 0].set(a.astype(_U32))


def ext(coeffs) -> jnp.ndarray:
    """Lift canonical int coeffs (shape (...,4)) to Montgomery ext form."""
    arr = jnp.asarray(np.asarray(coeffs, dtype=np.int64) % P, dtype=_U32)
    assert arr.shape[-1] == EXT_DEGREE
    return to_mont(arr)


def ext_add(a, b):
    return add(a, b)


def ext_sub(a, b):
    return sub(a, b)


def ext_neg(a):
    return neg(a)


def ext_scale(a, s):
    """Multiply ext element(s) by base-field scalar(s). s broadcasts."""
    return mul(a, jnp.asarray(s, dtype=_U32)[..., None])


def ext_mul(a, b):
    """Schoolbook quartic multiply with x^4 = 11 reduction."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    beta = jnp.full_like(a0, mont(BETA), dtype=_U32)

    def m(x, y):
        return mul(x, y)

    c0 = add(m(a0, b0), m(beta, add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = add(add(m(a0, b1), m(a1, b0)), m(beta, add(m(a2, b3), m(a3, b2))))
    c2 = add(add(m(a0, b2), add(m(a1, b1), m(a2, b0))), m(beta, m(a3, b3)))
    c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def ext_pow_const(a, e: int):
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else ext_mul(result, base)
        e >>= 1
        if e:
            base = ext_mul(base, base)
    if result is None:
        return ext_ones(jnp.shape(a)[:-1])
    return result


def ext_ones(shape=()):
    z = jnp.zeros(tuple(shape) + (EXT_DEGREE,), dtype=_U32)
    return z.at[..., 0].set(_u32c(ONE))


def ext_zeros(shape=()):
    return jnp.zeros(tuple(shape) + (EXT_DEGREE,), dtype=_U32)


def ext_inv(a):
    """Inverse in the quartic extension via the norm map.

    For q = (a0 + a1 x + a2 x^2 + a3 x^3), compute b = conj product such
    that a * abar lands in the subfield generated by x^2, then reduce to the
    base field and invert there with Fermat. Uses:
      N1 = a * frob2(a)    (frob2: x -> -x) has only even coefficients.
    """
    # abar = a(-x): negate odd coefficients.
    abar = a.at[..., 1].set(neg(a[..., 1])).at[..., 3].set(neg(a[..., 3]))
    n1 = ext_mul(a, abar)  # only even coeffs nonzero: n1 = e0 + e2 x^2
    e0, e2 = n1[..., 0], n1[..., 2]
    # (e0 + e2 y) * (e0 - e2 y) = e0^2 - 11 * e2^2  with y = x^2, y^2 = 11.
    beta = jnp.full_like(e0, mont(BETA), dtype=_U32)
    norm = sub(mul(e0, e0), mul(beta, mul(e2, e2)))  # base field
    norm_inv = inv(norm)
    # n1_conj = e0 - e2 x^2
    n1c = jnp.zeros_like(n1)
    n1c = n1c.at[..., 0].set(e0).at[..., 2].set(neg(e2))
    out = ext_mul(abar, n1c)
    return mul(out, norm_inv[..., None])


def sum_mod(x, axis: int = 0):
    """Modular sum along `axis` via a log-depth tree of `add` ops.

    jnp.sum would overflow uint32; this keeps every partial in [0, P) and
    maps to pure vector ops (pad to a power of two, halve repeatedly).
    """
    x = jnp.moveaxis(x.astype(_U32), axis, 0)
    n = x.shape[0]
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        pad = jnp.zeros((pow2 - n,) + x.shape[1:], dtype=_U32)
        x = jnp.concatenate([x, pad], axis=0)
        n = pow2
    while n > 1:
        n //= 2
        x = add(x[:n], x[n:])
    return x[0]


# ---------------------------------------------------------------------------
# Exact Python-int reference helpers (used by tests and host-side transcript)
# ---------------------------------------------------------------------------


def py_ext_mul(a, b):
    """Reference quartic multiply on canonical Python int 4-tuples."""
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + a[i] * b[j]) % P
    for k in range(6, 3, -1):
        c[k - 4] = (c[k - 4] + BETA * c[k]) % P
    return tuple(c[:4])
