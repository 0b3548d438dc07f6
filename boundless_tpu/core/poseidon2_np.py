"""Pure-numpy Poseidon2 (canonical domain, batched) for host-side hashing.

Bit-identical to core.poseidon2 (same constants, same sponge) but runs
as vectorized int64 numpy on the host — no XLA dispatch. Used where the
host hashes many small items (page trees, claim digests, witness prep)
and a per-call JAX dispatch would dominate (this box: ~1 ms+/call).

Parity with the jitted kernels is pinned by tests/test_poseidon2_np.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from . import field as F
from . import poseidon2 as P2

P = F.P
WIDTH = P2.WIDTH
RATE = P2.RATE


def _consts():
    ext_rc = P2._nothing_up_my_sleeve(b"ext", P2.ROUNDS_FULL * WIDTH
                                      ).reshape(P2.ROUNDS_FULL, WIDTH)
    int_rc = P2._nothing_up_my_sleeve(b"int", P2.ROUNDS_PARTIAL)
    mu = P2._diag_values()
    return ext_rc, int_rc, mu


_EXT_RC, _INT_RC, _MU = _consts()

# full 24x24 external matrix (entries <= 14, so row-dot fits int64 with
# one mod at the end: 24 * 14 * (P-1)^2 < 2^63 is false — keep mod per
# chunk instead; we use the M4 block structure like the jitted kernel)
_M4 = P2.M4  # (4,4) entries <= 7


def _mul_m4_np(chunk):
    """M4 @ chunk over last axis (..., 4); entries small, one mod."""
    out = np.einsum("ij,...j->...i", _M4, chunk)  # <= 4*7*(P-1) < 2^36
    return out % P


def _external_linear_np(state):
    """M_E = circ(2*M4, M4, ..): y_i = M4 @ (chunk_i + S) with
    S = sum of all chunks (per lane)."""
    s = state.reshape(*state.shape[:-1], 6, 4)
    tot = s.sum(axis=-2) % P  # (..., 4), sum of 6 values < 2^34 ok
    y = (s + tot[..., None, :]) % P
    return _mul_m4_np(y).reshape(state.shape)


def _sbox7(x):
    x2 = x * x % P
    x3 = x2 * x % P
    return x3 * x3 % P * x % P


def permute_np(states: np.ndarray) -> np.ndarray:
    """Poseidon2 permutation on canonical int64 (..., 24)."""
    st = np.asarray(states, dtype=np.int64) % P
    st = _external_linear_np(st)
    half = P2.ROUNDS_FULL // 2
    for r in range(half):
        st = _external_linear_np(_sbox7((st + _EXT_RC[r]) % P))
    for r in range(P2.ROUNDS_PARTIAL):
        v0 = _sbox7((st[..., 0] + int(_INT_RC[r])) % P)
        v = st.copy()
        v[..., 0] = v0
        tot = v.sum(axis=-1) % P  # 24 * (P-1) < 2^36
        st = (tot[..., None] + _MU * v) % P  # mu*v < 2^62
    for r in range(half, P2.ROUNDS_FULL):
        st = _external_linear_np(_sbox7((st + _EXT_RC[r]) % P))
    return st


def hash_elems_np(elems: Sequence[int]) -> tuple:
    """Sponge hash of canonical elements (parity: P2.hash_elems)."""
    vals = np.asarray(list(elems), dtype=np.int64) % P
    n = len(vals)
    nblocks = max(1, -(-n // RATE))
    pad = np.zeros(nblocks * RATE, dtype=np.int64)
    pad[:n] = vals
    st = np.zeros(WIDTH, dtype=np.int64)
    for b in range(nblocks):
        st[:RATE] = (st[:RATE] + pad[b * RATE : (b + 1) * RATE]) % P
        st = permute_np(st)
    return tuple(int(x) for x in st[:8])


def hash_many_np(rows: np.ndarray) -> np.ndarray:
    """Batched single-block-per-row sponge over (B, K<=RATE*blocks) rows.

    rows: (B, K) canonical; returns (B, 8) canonical digests. Matches
    hash_elems_np row-wise (zero-padded to the block boundary).
    """
    rows = np.asarray(rows, dtype=np.int64) % P
    b, k = rows.shape
    nblocks = max(1, -(-k // RATE))
    pad = np.zeros((b, nblocks * RATE), dtype=np.int64)
    pad[:, :k] = rows
    st = np.zeros((b, WIDTH), dtype=np.int64)
    for blk in range(nblocks):
        st[:, :RATE] = (st[:, :RATE]
                        + pad[:, blk * RATE : (blk + 1) * RATE]) % P
        st = permute_np(st)
    return st[:, :8].copy()


def hash_pair_np(left: Sequence[int], right: Sequence[int]) -> tuple:
    """Parity: P2.hash_pair (one block absorbing left||right)."""
    st = np.zeros(WIDTH, dtype=np.int64)
    st[:8] = np.asarray(list(left), dtype=np.int64) % P
    st[8:16] = np.asarray(list(right), dtype=np.int64) % P
    st = permute_np(st)
    return tuple(int(x) for x in st[:8])


def hash_pairs_np(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Batched hash_pair: (B, 8) x (B, 8) -> (B, 8)."""
    left = np.asarray(left, dtype=np.int64) % P
    right = np.asarray(right, dtype=np.int64) % P
    st = np.zeros((left.shape[0], WIDTH), dtype=np.int64)
    st[:, :8] = left
    st[:, 8:16] = right
    return permute_np(st)[:, :8].copy()
