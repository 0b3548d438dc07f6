"""Four-step NTT with a VMEM-resident Pallas sub-transform.

The Stockham NTT in `ntt.py` streams the full (N, C) array through HBM
once per radix-2 stage — log2(N) ~ 17-19 round trips for a memory-bound
transform measured at 10-21% of HBM peak (docs/ROOFLINE.md lever #2).
This module cuts the HBM traffic to ~4 passes with the classic
four-step decomposition N = N1*N2 (n = n1*N2 + n2, k = k2*N1 + k1):

  1. A[k1, n2]   = NTT_N1 along n1            (Pallas: whole sub-
                                               transform in VMEM)
  2. B[k1, n2]   = A * w_N^(k1*n2)            (one fused elementwise
                                               pass)
  3. transpose to (N2, N1, C)                 (one HBM pass)
  4. Y[k2, k1]   = NTT_N2 along n2            (Pallas again)

and the output (N2, N1, C) view IS the natural-order (N, C) result
(k = k2*N1 + k1). All arithmetic is exact Baby Bear field math, so the
result is bit-identical to the Stockham path (and the O(N^2) DFT) —
dispatch cannot change transcripts.

The Pallas kernel runs the full log2(M)-stage radix-2 sub-transform on
a (M, TILE)-lane tile without leaving VMEM; twiddle tables are closure
constants. Like the other Mosaic kernels, first execution per process
pays the relay's one-time compile (docs/ROOFLINE.md), so the kernel is
opt-in: BT_NTT_PALLAS=1 (bench.py sets it; long-lived cluster workers
amortize it).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import field as F

TILE = 128   # lanes per kernel program (multiple of 128)
MAX_M = 512  # sub-transform rows per tile (VMEM: the unrolled stage
#              chain keeps ~log2(M) intermediates live; M=512, TILE=128
#              stays well inside Mosaic's 16M scoped-vmem budget)
MIN_N = 1 << 12  # below this the plain Stockham wins


def enabled() -> bool:
    return os.environ.get("BT_NTT_PALLAS", "0") == "1"


@functools.lru_cache(maxsize=None)
def _stage_tables_flat(m: int, forward: bool):
    """Concatenated per-stage twiddles (m-1 values, Montgomery) padded
    to one (1, m) operand row (the kernel slices per stage)."""
    from . import ntt as NTT

    tables = NTT._stage_twiddles(m, forward)
    flat = np.concatenate([np.zeros(1, dtype=np.uint32)]
                          + [np.asarray(t) for t in tables])
    assert flat.shape[0] == m
    return flat.reshape(1, m)


def _sub_ntt_kernel(tw_ref, x_ref, o_ref, *, m: int):
    """One (m, TILE) tile: full radix-2 Stockham in VMEM."""
    logm = m.bit_length() - 1
    y = x_ref[...].reshape(m, 1, TILE)
    off = 1
    for t in range(logm):
        half = y.shape[0] // 2
        a = y[:half]
        b = y[half:]
        tw = tw_ref[0, off : off + (1 << t)].reshape(1, -1, 1)
        off += 1 << t
        wb = F.mul(b, tw)
        y = jnp.concatenate([F.add(a, wb), F.sub(a, wb)], axis=1)
    o_ref[...] = y.reshape(m, TILE)


@functools.lru_cache(maxsize=None)
def _sub_ntt_call(m: int, n_lanes: int):
    kern = functools.partial(_sub_ntt_kernel, m=m)
    grid = (n_lanes // TILE,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, m), lambda i: (0, 0)),
                  pl.BlockSpec((m, TILE), lambda i: (0, i))],
        out_specs=pl.BlockSpec((m, TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n_lanes), jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )


def _sub_ntt(x2d, forward: bool):
    """(m, L) -> size-m NTT along axis 0 (L padded to TILE)."""
    m, lanes = x2d.shape
    pad = (-lanes) % TILE
    if pad:
        x2d = jnp.pad(x2d, ((0, 0), (0, pad)))
    tw = jnp.asarray(_stage_tables_flat(m, forward))
    out = _sub_ntt_call(m, x2d.shape[1])(tw, x2d)
    return out[:, :lanes] if pad else out


@functools.lru_cache(maxsize=None)
def _mid_twiddles(n1: int, n2: int, forward: bool):
    """w_N^(k1*n2) (Montgomery uint32, shape (n1, n2))."""
    n = n1 * n2
    logn = n.bit_length() - 1
    roots = F.ROU_FWD if forward else F.ROU_REV
    w = roots[logn]
    k1 = np.arange(n1, dtype=object)[:, None]
    nn2 = np.arange(n2, dtype=object)[None, :]
    exps = (k1 * nn2)
    tbl = np.empty((n1, n2), dtype=np.uint32)
    # pow over the small n2 row, then row-wise powers (exact ints)
    base = [pow(int(w), int(j), F.P) for j in range(n2)]
    row = [1] * n2
    for i in range(n1):
        tbl[i] = [F.mont(v) for v in row]
        row = [r * b % F.P for r, b in zip(row, base)]
    return tbl


def _split(n: int):
    logn = n.bit_length() - 1
    log1 = min((logn + 1) // 2, MAX_M.bit_length() - 1)
    return 1 << log1, 1 << (logn - log1)


def _leading_ntt(x2d, forward: bool):
    """Leading-axis NTT of (m, L): Pallas tile when m fits VMEM, else
    recurse through another four-step level."""
    m = x2d.shape[0]
    if m <= MAX_M:
        return _sub_ntt(x2d, forward)
    return ntt_four_step(x2d, forward)


def ntt_four_step(x, forward: bool = True):
    """Bit-identical drop-in for ntt.ntt on large N (see module doc)."""
    n = x.shape[0]
    batch_shape = x.shape[1:]
    c = int(np.prod(batch_shape)) if batch_shape else 1
    n1, n2 = _split(n)
    xv = x.reshape(n1, n2 * c)
    a = _leading_ntt(xv, forward)                    # (n1, n2*c)
    tw = jnp.asarray(_mid_twiddles(n1, n2, forward))
    b = F.mul(a.reshape(n1, n2, c), tw[:, :, None])
    bt = jnp.swapaxes(b, 0, 1)                       # (n2, n1, c)
    y = _leading_ntt(bt.reshape(n2, n1 * c), forward)
    return y.reshape((n,) + batch_shape)
