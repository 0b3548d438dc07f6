"""Number-theoretic transform and low-degree extension over Baby Bear.

TPU-native replacement for the radix-2 NTT/LDE device kernels that the
reference pulls in via `risc0-sys`/`sppark` (reference call-site:
`prover/crates/workflow/src/tasks/prove.rs:43-49`, see SURVEY.md §2.4).

Design
------
* **Stockham autosort radix-2**: every stage is a (take-halves, butterfly,
  concat) on contiguous blocks — no bit-reversal permutation and no gathers,
  so XLA lowers it to pure vector ops + layout changes. Natural order in,
  natural order out (verified against an O(N^2) DFT in tests).
* Transforms act along **axis 0** of an (N, ...) array, vectorizing over all
  trace columns at once — the batch dimension maps onto VPU lanes.
* Commitments live on a **coset** `GENERATOR * H_{rate*N}` so the vanishing
  polynomial `x^N - 1` of the trace domain never vanishes on the evaluation
  domain (needed by the DEEP-ALI quotient, see prover/segment.py).

All twiddle tables are precomputed host-side with exact Python ints and
embedded as constants into the jitted caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

INV_RATE = 4  # blowup factor (reference: risc0 INV_RATE = 4)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n: int, forward: bool):
    """Per-stage twiddle tables (Montgomery uint32 numpy) for size-n NTT."""
    logn = n.bit_length() - 1
    assert 1 << logn == n and logn <= F.TWO_ADICITY
    roots = F.ROU_FWD if forward else F.ROU_REV
    tables = []
    for t in range(logn):
        m = 1 << t  # current sub-transform length
        w = roots[t + 1]  # root of order 2m
        tw = np.empty(m, dtype=np.int64)
        acc = 1
        for i in range(m):
            tw[i] = acc
            acc = acc * w % F.P
        tables.append(np.asarray([F.mont(int(x)) for x in tw], dtype=np.uint32))
    return tables


def ntt(x, forward: bool = True):
    """In-order NTT along axis 0. x: uint32 Montgomery, shape (N, ...).

    Pure radix-2 Stockham stages. A radix-4 two-stage fusion was tried
    in round 4 (BT_NTT_RADIX4) and MEASURED SLOWER on the v5e (round-5
    2x2 matrix: 0.1883 vs 0.2058 Mcycles/s at po2 17 / q100 — the fused
    step's concatenate-of-four defeats XLA's in-place butterfly fusion
    and the extra live intermediates raise HBM pressure), so the fused
    path was deleted per the keep-the-winner rule."""
    n = x.shape[0]
    logn = n.bit_length() - 1
    assert 1 << logn == n, f"NTT size must be a power of two, got {n}"
    from . import ntt_pallas as NP

    if n >= NP.MIN_N and NP.enabled():
        # four-step with the VMEM-resident Pallas sub-transform — exact
        # field math, bit-identical output (see ntt_pallas.py)
        return NP.ntt_four_step(x, forward)
    tables = _stage_twiddles(n, forward)
    batch_shape = x.shape[1:]
    tw = [jnp.asarray(t).reshape((1, -1) + (1,) * len(batch_shape))
          for t in tables]
    # View as (L, m, batch...): L sub-transforms of length m.
    y = x.reshape((n, 1) + batch_shape)
    for t in range(logn):
        half = y.shape[0] // 2
        a = y[:half]
        b = y[half:]
        wb = F.mul(b, tw[t])
        y = jnp.concatenate([F.add(a, wb), F.sub(a, wb)], axis=1)
    return y.reshape((n,) + batch_shape)


def intt(x):
    """Inverse NTT along axis 0 (includes the 1/N scale)."""
    n = x.shape[0]
    y = ntt(x, forward=False)
    n_inv = jnp.asarray(F.mont(pow(n, F.P - 2, F.P)), dtype=jnp.uint32)
    return F.mul(y, n_inv)


@functools.lru_cache(maxsize=None)
def _coset_powers(n: int, inverse: bool = False):
    """g^i (or g^-i) for i < n, Montgomery uint32 numpy array."""
    g = F.GENERATOR if not inverse else pow(F.GENERATOR, F.P - 2, F.P)
    out = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        out[i] = F.mont(acc)
        acc = acc * g % F.P
    return out


def coset_evaluate(coeffs, expand: int = INV_RATE):
    """Evaluate a coefficient array (N, ...) on the coset g * H_{expand*N}.

    Row i of the output is the evaluation at g * w^i where w generates
    H_{expand*N} (natural order).
    """
    n = coeffs.shape[0]
    big = n * expand
    shift = jnp.asarray(_coset_powers(n)).reshape((n,) + (1,) * (coeffs.ndim - 1))
    shifted = F.mul(coeffs, shift)
    pad = jnp.zeros((big - n,) + coeffs.shape[1:], dtype=jnp.uint32)
    return ntt(jnp.concatenate([shifted, pad], axis=0))


def coset_interpolate(evals, expand: int = INV_RATE):
    """Inverse of coset_evaluate: recover the low N coefficients."""
    big = evals.shape[0]
    n = big // expand
    coeffs = intt(evals)[:n]
    unshift = jnp.asarray(_coset_powers(n, inverse=True)).reshape(
        (n,) + (1,) * (evals.ndim - 1))
    return F.mul(coeffs, unshift)


def interpolate(evals):
    """Trace evaluations on H_N (natural order) -> coefficients."""
    return intt(evals)


def ext_powers(z, n: int):
    """Powers z^0..z^{n-1} of an ext element, shape (n, 4), by log-doubling."""
    pows = F.ext_ones((1,))
    cur = z.reshape(1, F.EXT_DEGREE)
    while pows.shape[0] < n:
        nxt = F.ext_mul(pows, jnp.broadcast_to(cur, pows.shape))
        pows = jnp.concatenate([pows, nxt], axis=0)
        cur = F.ext_mul(cur, cur)
    return pows[:n]


def eval_poly_ext(coeffs, z):
    """Evaluate base-field polynomial(s) at an extension point z.

    coeffs: (N, C) base field; z: (4,) ext. Returns (C, 4).
    """
    n = coeffs.shape[0]
    pows = ext_powers(z, n)  # (N, 4)
    terms = F.mul(coeffs[..., None], pows[:, None, :])  # (N, C, 4)
    return F.sum_mod(terms, axis=0)


def eval_ext_poly_ext(coeffs, z):
    """Evaluate an ext-coefficient polynomial (N, 4) at ext point z -> (4,)."""
    n = coeffs.shape[0]
    pows = ext_powers(z, n)
    terms = F.ext_mul(coeffs, pows)
    return F.sum_mod(terms, axis=0)
