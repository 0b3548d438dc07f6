"""Pallas TPU kernel for batched Poseidon2 sponge hashing.

This is the Merkle-commitment hot path (reference: the CUDA Poseidon2
kernels behind `risc0-sys`, SURVEY.md §2.4): every STARK commit hashes
one sponge per LDE row over all trace columns, plus one 2-to-1
compression per internal tree node.

The pure-jnp path (`poseidon2.py`) round-trips the (N, 24) state through
HBM once per scan step — ~29 rounds x ~37 absorb blocks per data-tree
leaf makes the commit HBM-bound. This kernel keeps a (24, TILE) state
tile resident in VMEM for the whole sponge:

  * layout is transposed: state rows (the 24 Poseidon2 cells) live on
    sublanes, independent hashes live on lanes (TILE a multiple of 128);
  * the absorb loop over rate-16 blocks is a `fori_loop` with a dynamic
    sublane slice of the input tile, so kernel graph size is one
    permutation regardless of column count;
  * external/internal linear layers are static sublane slices +
    shift-add small-constant multiplies (M4 entries <= 7), so the only
    real multiplies are the Montgomery products inside the x^7 sbox.

Semantics are bit-identical to `poseidon2.hash_elems` / `hash_pair`
(same constants, same zero-padded final block); parity is enforced by
tests/test_hash.py on CPU (interpret mode) and the TPU suite.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from . import poseidon2 as P2

TILE = 256  # lanes per kernel program (multiple of 128)

_U32 = jnp.uint32


def _small(x, c: int):
    """c * x (mod P) via doubling chains, c in 1..7 (M4 entries)."""
    if c == 1:
        return x
    if c == 2:
        return F.add(x, x)
    if c == 3:
        return F.add(F.add(x, x), x)
    if c == 4:
        d = F.add(x, x)
        return F.add(d, d)
    if c == 5:
        d = F.add(x, x)
        return F.add(F.add(d, d), x)
    if c == 6:
        t = F.add(F.add(x, x), x)
        return F.add(t, t)
    if c == 7:
        d = F.add(x, x)
        q = F.add(d, d)
        return F.add(F.add(q, d), x)
    raise ValueError(c)


def _sbox(x):
    x2 = F.mul(x, x)
    x3 = F.mul(x2, x)
    x6 = F.mul(x3, x3)
    return F.mul(x6, x)


_HALF = np.uint32((F.P + 1) // 2)  # 2^-1 mod P


def _halve(x):
    """x * 2^-1 mod P: odd residues add (P+1)/2 after the shift."""
    return (x >> 1) + (x & np.uint32(1)) * _HALF


def _small_any(x, c: int):
    """c * x (mod P) for small c via a doubling chain (c in 1..16)."""
    if c <= 7:
        return _small(x, c)
    if c == 8:
        return _small(F.add(x, x), 4)
    if c == 12:
        return _small(F.add(x, x), 6)
    if c == 16:
        d = F.add(x, x)
        return _small(F.add(d, d), 4)
    raise ValueError(c)


def _mul_diag_t(s):
    """diag(mu) @ state for transposed (24, T) state.

    The diagonal is the addition-chain-cheap DIAG_SPEC set
    (core/poseidon2.py): each cell costs a few shifts/adds instead of a
    Montgomery product — this is the partial rounds' dominant linear cost.
    """
    rows = []
    for i, (op, k) in enumerate(P2.DIAG_SPEC):
        x = s[i : i + 1]
        if op == "i":
            r = _small_any(x, k)
        elif op == "n":
            r = F.neg(_small_any(x, k))
        elif op == "h":
            r = x
            for _ in range(k):
                r = _halve(r)
        else:  # "nh"
            r = x
            for _ in range(k):
                r = _halve(r)
            r = F.neg(r)
        rows.append(r)
    return jnp.concatenate(rows, axis=0)


def _ext_linear_t(s):
    """M_E @ state for transposed state (24, T): per-chunk M4 + chunk-sum."""
    ts = []
    for k in range(P2.WIDTH // 4):
        chunk = s[4 * k : 4 * k + 4]
        xs = [chunk[i : i + 1] for i in range(4)]
        rows = []
        for r in range(4):
            acc = None
            for c, x in zip(P2.M4[r], xs):
                term = _small(x, int(c))
                acc = term if acc is None else F.add(acc, term)
            rows.append(acc)
        ts.append(jnp.concatenate(rows, axis=0))  # (4, T)
    total = ts[0]
    for t in ts[1:]:
        total = F.add(total, t)  # (4, T)
    return jnp.concatenate([F.add(t, total) for t in ts], axis=0)


def _row_sum(s):
    """Modular sum over the 24 sublane rows -> (1, T)."""
    t = jnp.concatenate([s, jnp.zeros((8,) + s.shape[1:], _U32)], axis=0)
    n = 32
    while n > 1:
        n //= 2
        t = F.add(t[:n], t[n:])
    return t  # (1, T)


@functools.lru_cache(maxsize=1)
def _np_constants():
    """(ext_rc_t (24, 8), int_rc (1, 21), mu (24, 1)) Montgomery, host numpy."""
    ext_rc, int_rc, mu = P2._constants()
    return (
        np.asarray(ext_rc).T.copy(),
        np.asarray(int_rc)[None, :].copy(),
        np.asarray(mu)[:, None].copy(),
    )


def _permute_t(state, ext_rc_t, int_rc, mu_col):
    """Poseidon2 permutation on transposed (24, T) Montgomery state.

    ext_rc_t (24, 8), int_rc (1, 21), mu_col (24, 1): kernel refs/values.
    """
    half = P2.ROUNDS_FULL // 2

    def ext_round(s, r):
        s = F.add(s, ext_rc_t[:, r : r + 1])
        s = _sbox(s)
        return _ext_linear_t(s)

    def int_round(s, r):
        rc = int_rc[0:1, r : r + 1]  # (1, 1)
        s0 = _sbox(F.add(s[0:1], rc))
        s = jnp.concatenate([s0, s[1:]], axis=0)
        return F.add(_mul_diag_t(s), _row_sum(s))

    state = _ext_linear_t(state)
    for r in range(half):
        state = ext_round(state, r)
    for r in range(P2.ROUNDS_PARTIAL):
        state = int_round(state, r)
    for r in range(half, P2.ROUNDS_FULL):
        state = ext_round(state, r)
    return state


def _sponge_kernel(in_ref, ext_rc_ref, int_rc_ref, mu_ref, out_ref):
    cp, t = in_ref.shape
    nblocks = cp // P2.RATE
    ext_rc_t = ext_rc_ref[:, :]
    int_rc = int_rc_ref[:, :]
    mu_col = mu_ref[:, :]
    state = jnp.zeros((P2.WIDTH, t), dtype=_U32)

    def absorb(b, s):
        blk = in_ref[pl.ds(pl.multiple_of(b * P2.RATE, P2.RATE), P2.RATE), :]
        top = F.add(s[: P2.RATE], blk)
        s = jnp.concatenate([top, s[P2.RATE :]], axis=0)
        return _permute_t(s, ext_rc_t, int_rc, mu_col)

    state = jax.lax.fori_loop(0, nblocks, absorb, state)
    out_ref[:, :] = state[: P2.DIGEST_WORDS]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sponge_t(mat_t, interpret=False):
    """Sponge over columns of mat_t (Cp, N), Cp % 16 == 0, N % TILE == 0.

    Returns digests transposed: (8, N).
    """
    cp, n = mat_t.shape
    ext_rc_t, int_rc, mu_col = _np_constants()
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sponge_kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((cp, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            const_spec(ext_rc_t.shape),
            const_spec(int_rc.shape),
            const_spec(mu_col.shape),
        ],
        out_specs=pl.BlockSpec((P2.DIGEST_WORDS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P2.DIGEST_WORDS, n), _U32),
        interpret=interpret,
    )(mat_t, jnp.asarray(ext_rc_t), jnp.asarray(int_rc), jnp.asarray(mu_col))


def _pad_cols(mat_t):
    cp = mat_t.shape[0]
    rem = (-cp) % P2.RATE
    if rem == 0 and cp > 0:
        return mat_t
    pad = jnp.zeros((rem if cp else P2.RATE,) + mat_t.shape[1:], _U32)
    return jnp.concatenate([mat_t, pad], axis=0)


def hash_rows(matrix, interpret=False):
    """Pallas equivalent of P2.hash_elems over the rows of (N, C)."""
    mat_t = _pad_cols(jnp.swapaxes(matrix.astype(_U32), 0, 1))
    return jnp.swapaxes(_sponge_t(mat_t, interpret=interpret), 0, 1)


def hash_pairs(left, right, interpret=False):
    """Pallas equivalent of P2.hash_pair on (M, 8) digest arrays."""
    mat_t = jnp.concatenate(
        [jnp.swapaxes(left.astype(_U32), 0, 1), jnp.swapaxes(right.astype(_U32), 0, 1)], axis=0
    )
    return jnp.swapaxes(_sponge_t(mat_t, interpret=interpret), 0, 1)


@functools.lru_cache(maxsize=1)
def enabled() -> bool:
    """Use the kernel on real TPU backends (override: BT_P2_PALLAS=0/1)."""
    env = os.environ.get("BT_P2_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def usable(n_rows: int) -> bool:
    return enabled() and n_rows % TILE == 0 and n_rows >= TILE
