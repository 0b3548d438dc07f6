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
    if matrix.shape[0] % TILE_V2 == 0:
        return _digests_of(_sponge_v2(_lanes_of(mat_t), interpret=interpret))
    return jnp.swapaxes(_sponge_t(mat_t, interpret=interpret), 0, 1)


def hash_pairs(left, right, interpret=False):
    """Pallas equivalent of P2.hash_pair on (M, 8) digest arrays."""
    mat_t = jnp.concatenate(
        [jnp.swapaxes(left.astype(_U32), 0, 1), jnp.swapaxes(right.astype(_U32), 0, 1)], axis=0
    )
    if left.shape[0] % TILE_V2 == 0:
        return _digests_of(_sponge_v2(_lanes_of(mat_t), interpret=interpret))
    return jnp.swapaxes(_sponge_t(mat_t, interpret=interpret), 0, 1)


# ---------------------------------------------------------------------------
# v2 kernel: vreg-per-cell layout
# ---------------------------------------------------------------------------
# The v1 kernel keeps the transposed (24, T) state on sublanes, so every
# per-cell op is a (1, T) sublane slice — Mosaic pads those to full
# (8, 128) vregs at ~1/8 lane utilization, and the concat/slice traffic
# dominates. v2 keeps the state as (24, 8, 128): every Poseidon2 cell is
# exactly one u32 vreg, 1024 independent hashes per grid step, and every
# add/mul is a dense full-vreg VPU op with no sublane slicing anywhere.
# The M4 block product uses the Poseidon2 paper's 14-add sequence.
# Semantics are bit-identical to v1 / poseidon2.hash_elems
# (tests/test_hash.py).

TILE_V2 = 1024  # 8 sublanes x 128 lanes


def _m4_seq(x0, x1, x2, x3):
    """M4 @ (x0..x3) via the Poseidon2 paper's 14-add sequence.

    Operands are (6, 8, 128) chunk slabs (all 6 state chunks at once)."""
    t0 = F.add(x0, x1)
    t1 = F.add(x2, x3)
    t2 = F.add(F.add(x1, x1), t1)  # 2*x1 + t1
    t3 = F.add(F.add(x3, x3), t0)  # 2*x3 + t0
    d1 = F.add(t1, t1)
    t4 = F.add(F.add(d1, d1), t3)  # 4*t1 + t3
    d0 = F.add(t0, t0)
    t5 = F.add(F.add(d0, d0), t2)  # 4*t0 + t2
    t6 = F.add(t3, t5)
    t7 = F.add(t2, t4)
    return t6, t5, t7, t4


def _ext_linear_v2(s):
    """M_E @ state for (24, 8, 128): per-chunk M4 + chunk-sum broadcast."""
    s6 = s.reshape(P2.WIDTH // 4, 4, 8, 128)
    ys = _m4_seq(s6[:, 0], s6[:, 1], s6[:, 2], s6[:, 3])
    y = jnp.stack(ys, axis=1)  # (6, 4, 8, 128)
    tot = F.add(F.add(y[0], y[1]), F.add(y[2], y[3]))
    tot = F.add(tot, F.add(y[4], y[5]))  # (4, 8, 128)
    return F.add(y, tot[None]).reshape(P2.WIDTH, 8, 128)


def _lead_sum24(s):
    """Modular sum over the leading 24 axis -> (1, 8, 128)."""
    t = F.add(F.add(s[0:8], s[8:16]), s[16:24])  # (8, 8, 128)
    t = F.add(t[0:4], t[4:8])
    t = F.add(t[0:2], t[2:4])
    return F.add(t[0:1], t[1:2])


@functools.lru_cache(maxsize=1)
def _v2_consts():
    """Round constants broadcast to vreg tiles (host numpy u32).

    Pallas kernels cannot close over device constants, so these travel as
    VMEM operands: ext_rc (8,24,8,128), int_rc (21,8,128), mu (24,8,128)
    — ~1.1 MB total, read-only, resident for the whole grid.
    """
    ext_rc, int_rc, mu = P2._constants()
    return (
        np.broadcast_to(np.asarray(ext_rc)[:, :, None, None],
                        (P2.ROUNDS_FULL, P2.WIDTH, 8, 128)).copy(),
        np.broadcast_to(np.asarray(int_rc)[:, None, None],
                        (P2.ROUNDS_PARTIAL, 8, 128)).copy(),
        np.broadcast_to(np.asarray(mu)[:, None, None],
                        (P2.WIDTH, 8, 128)).copy(),
    )


def _permute_v2(s, ext_rc, int_rc, mu):
    """Poseidon2 permutation on a (24, 8, 128) state tile."""
    half = P2.ROUNDS_FULL // 2

    def ext_round(s, r):
        return _ext_linear_v2(_sbox(F.add(s, ext_rc[r])))

    def int_round(s, r):
        s0 = _sbox(F.add(s[0:1], int_rc[r : r + 1]))
        s = jnp.concatenate([s0, s[1:]], axis=0)
        # M_I = J + diag(mu): one dense Montgomery product + the row sum
        return F.add(F.mul(s, mu), _lead_sum24(s))

    s = _ext_linear_v2(s)
    for r in range(half):
        s = ext_round(s, r)
    for r in range(P2.ROUNDS_PARTIAL):
        s = int_round(s, r)
    for r in range(half, P2.ROUNDS_FULL):
        s = ext_round(s, r)
    return s


def _sponge_kernel_v2(in_ref, ext_rc_ref, int_rc_ref, mu_ref, out_ref):
    cp = in_ref.shape[1]
    nblocks = cp // P2.RATE
    ext_rc = ext_rc_ref[:, :]
    int_rc = int_rc_ref[:, :]
    mu = mu_ref[:, :]
    state = jnp.zeros((P2.WIDTH, 8, 128), _U32)

    def absorb(b, st):
        blk = in_ref[0, pl.ds(b * P2.RATE, P2.RATE)]  # (16, 8, 128)
        top = F.add(st[: P2.RATE], blk)
        return _permute_v2(jnp.concatenate([top, st[P2.RATE :]], axis=0),
                           ext_rc, int_rc, mu)

    state = jax.lax.fori_loop(0, nblocks, absorb, state)
    out_ref[0] = state[: P2.DIGEST_WORDS]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sponge_v2(mat4, interpret=False):
    """Sponge over (G, Cp, 8, 128): lane (g, s, l) = hash g*1024+s*128+l.

    Returns digests (G, 8, 8, 128).
    """
    g, cp = mat4.shape[:2]
    ext_rc, int_rc, mu = _v2_consts()
    const4 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sponge_kernel_v2,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, cp, 8, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  const4(ext_rc.shape), const4(int_rc.shape),
                  const4(mu.shape)],
        out_specs=pl.BlockSpec((1, P2.DIGEST_WORDS, 8, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, P2.DIGEST_WORDS, 8, 128), _U32),
        interpret=interpret,
    )(mat4, jnp.asarray(ext_rc), jnp.asarray(int_rc), jnp.asarray(mu))


def _lanes_of(mat_t):
    """(Cp, N) -> (G, Cp, 8, 128) lane layout (one HBM transpose)."""
    cp, n = mat_t.shape
    g = n // TILE_V2
    return mat_t.reshape(cp, g, 8, 128).transpose(1, 0, 2, 3)


def _digests_of(out4):
    """(G, 8, 8, 128) -> (N, 8)."""
    g = out4.shape[0]
    return out4.transpose(0, 2, 3, 1).reshape(g * TILE_V2, P2.DIGEST_WORDS)


@functools.lru_cache(maxsize=1)
def enabled() -> bool:
    """Opt-in (BT_P2_PALLAS=1): on this TPU relay a Mosaic kernel's first
    execution pays a ~10-minute server-side compile per process that no
    cache captures (measured: compile 2.4 s, run1 597 s, run2 0.03 s), so
    the default hot path is the pure-XLA cells sponge
    (`poseidon2.hash_rows_cells`), which the local persistent cache makes
    warm-start fast. Kernels kept for A/B measurement (docs/ROOFLINE.md)."""
    env = os.environ.get("BT_P2_PALLAS")
    if env is None:
        return False
    if env not in ("0", "false", ""):
        try:
            return jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover - backend probing
            return False
    return False


def usable(n_rows: int) -> bool:
    # v2 (vreg-per-cell) only: small tree levels stay on the scanned jnp
    # path, so enabling the kernels costs exactly one Mosaic program per
    # (column-count) shape.
    return enabled() and n_rows % TILE_V2 == 0 and n_rows >= TILE_V2
