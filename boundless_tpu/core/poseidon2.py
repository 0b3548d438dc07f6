"""Poseidon2 permutation / sponge over Baby Bear (TPU-native, batched).

Replaces the CUDA Poseidon2 kernels the reference uses for Merkle hashing
and Fiat-Shamir (via `risc0-sys`, SURVEY.md §2.4). Geometry follows the
risc0 / Poseidon2-paper Baby Bear instance:

  * width t = 24 cells, rate 16, capacity 8, digest = 8 cells
  * 8 external (full) rounds (4 + 4), 21 internal (partial) rounds
  * S-box x^7  (gcd(7, P-1) = 1, a permutation)
  * external matrix M_E = circ(2*M4, M4, ..., M4) with the paper's
    M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]]
  * internal matrix M_I = J + diag(mu)  (J = all-ones)

Round constants are generated deterministically ("nothing up my sleeve")
from SHA-256 counters; the internal diagonal uses small addition-chain
constants (see `_diag_values`). Together they intentionally form our own
parameter set — bit-exact interop with risc0's constants would require
vendoring their tables (tracked as future work in README).

All functions are batched: a state is a uint32 Montgomery array (..., 24),
and any number of permutations run in parallel on the VPU lanes.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

WIDTH = 24
RATE = 16
CAPACITY = 8
DIGEST_WORDS = 8
ROUNDS_FULL = 8  # 4 + 4
ROUNDS_PARTIAL = 21
SBOX_DEGREE = 7

M4 = np.array(
    [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]], dtype=np.int64
)


def _nothing_up_my_sleeve(tag: bytes, count: int) -> np.ndarray:
    """Deterministic field constants from SHA-256 counter mode (canonical)."""
    out = np.empty(count, dtype=np.int64)
    for i in range(count):
        h = hashlib.sha256(b"boundless-tpu.poseidon2.babybear.v1:" + tag + b":" + str(i).encode()).digest()
        out[i] = int.from_bytes(h[:8], "little") % F.P
    return out


# Internal-matrix diagonal spec: ("i", c) = +c, ("n", c) = -c,
# ("h", k) = 2^-k, ("nh", k) = -2^-k. All 24 values distinct and nonzero.
DIAG_SPEC = (
    ("i", 1), ("i", 2), ("i", 3), ("i", 4), ("i", 5), ("i", 6),
    ("i", 8), ("i", 12), ("i", 16),
    ("n", 2), ("n", 3), ("n", 4), ("n", 5), ("n", 6), ("n", 8),
    ("n", 12), ("n", 16),
    ("h", 1), ("h", 2), ("h", 3), ("h", 4),
    ("nh", 1), ("nh", 2), ("nh", 3),
)


def _diag_values() -> np.ndarray:
    """Internal-matrix diagonal mu: small addition-chain-cheap constants.

    Poseidon2's internal matrix M_I = J + diag(mu) needs the mu_i distinct
    and the matrix free of invariant subspaces (tests/test_hash.py checks
    the Krylov rank of M_I is full, i.e. its minimal polynomial has degree
    WIDTH). Small +-c and +-2^-k values make the 21 partial-round diagonal
    multiplies shift/add chains instead of Montgomery products on the TPU —
    the same instance family public Baby Bear Poseidon2 deployments use
    (Plonky3-style +-small / +-2^-k diagonals).
    """
    inv2 = (F.P + 1) // 2
    out = []
    for op, k in DIAG_SPEC:
        if op == "i":
            out.append(k % F.P)
        elif op == "n":
            out.append((-k) % F.P)
        elif op == "h":
            out.append(pow(inv2, k, F.P))
        else:  # "nh"
            out.append((-pow(inv2, k, F.P)) % F.P)
    assert len(set(out)) == WIDTH and 0 not in out
    return np.array(out, dtype=np.int64)


@functools.lru_cache(maxsize=1)
def _constants():
    """(external_rc (8,24), internal_rc (21,), mu (24,)) in Montgomery form."""
    ext_rc = _nothing_up_my_sleeve(b"ext", ROUNDS_FULL * WIDTH).reshape(ROUNDS_FULL, WIDTH)
    int_rc = _nothing_up_my_sleeve(b"int", ROUNDS_PARTIAL)
    mu = _diag_values()
    to = lambda a: np.vectorize(F.mont)(a).astype(np.uint32)
    return to(ext_rc), to(int_rc), to(mu)


def _sbox(x):
    x2 = F.mul(x, x)
    x3 = F.mul(x2, x)
    x6 = F.mul(x3, x3)
    return F.mul(x6, x)


def _mul_m4(chunk):
    """M4 @ chunk for chunk (..., 4), via shift-add (entries <= 7)."""
    x0, x1, x2, x3 = (chunk[..., i] for i in range(4))

    def small(x, c):
        # c * x via doubling chains, c in 1..7
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

    rows = []
    for r in range(4):
        acc = None
        for c, x in zip(M4[r], (x0, x1, x2, x3)):
            term = small(x, int(c))
            acc = term if acc is None else F.add(acc, term)
        rows.append(acc)
    return jnp.stack(rows, axis=-1)


def _external_linear(state):
    """M_E @ state: per-4-chunk M4 product plus the chunk-sum broadcast."""
    s = state.reshape(state.shape[:-1] + (WIDTH // 4, 4))
    t = _mul_m4(s)  # (..., 6, 4)
    total = F.sum_mod(t, axis=-2)  # (..., 4)
    out = F.add(t, total[..., None, :])
    return out.reshape(state.shape)


def _internal_linear(state, mu):
    total = F.sum_mod(state, axis=-1)  # (...,)
    return F.add(F.mul(state, mu), total[..., None])


def permute(state):
    """Poseidon2 permutation on (..., 24) Montgomery uint32 state.

    Round loops are lax.scans so the permutation contributes O(1) ops to a
    traced graph regardless of round count (compile latency on this stack
    is proportional to graph size; a Merkle build calls permute per level).
    """
    ext_rc, int_rc, mu = _constants()
    ext_rc = jnp.asarray(ext_rc)
    int_rc = jnp.asarray(int_rc)
    mu = jnp.asarray(mu)
    half = ROUNDS_FULL // 2

    def ext_round(s, rc):
        s = F.add(s, rc)
        s = _sbox(s)
        return _external_linear(s), None

    def int_round(s, rc):
        s0 = _sbox(F.add(s[..., 0], rc))
        s = s.at[..., 0].set(s0)
        return _internal_linear(s, mu), None

    state = _external_linear(state)  # initial linear layer (Poseidon2 spec)
    state, _ = jax.lax.scan(ext_round, state, ext_rc[:half])
    state, _ = jax.lax.scan(int_round, state, int_rc)
    state, _ = jax.lax.scan(ext_round, state, ext_rc[half:])
    return state


# ---------------------------------------------------------------------------
# Cells-layout sponge (the Merkle leaf-hash hot path, pure XLA)
# ---------------------------------------------------------------------------
# Layout: state as (24, N) — each Poseidon2 cell is a full row vector, so
# every op is a dense (N,)-wide VPU op with no lane padding (the (..., 24)
# trailing layout wastes 104/128 lanes per vreg). Rounds are UNROLLED
# inside the absorb-block scan body: XLA fuses the whole permutation into
# one kernel, so the (24, N) state round-trips HBM once per absorbed
# block (~2 ms/tree at po2 17) instead of once per round. This is the
# replacement for the reference's CUDA Poseidon2 Merkle kernels
# (`risc0-sys`, SURVEY.md §2.4) on the TPU: pure XLA (no Mosaic) keeps
# first-run latency cacheable while matching hand-kernel throughput for
# this elementwise pattern.


def _m4_seq_cells(x0, x1, x2, x3):
    """M4 @ (x0..x3) via the Poseidon2 paper's 14-add sequence."""
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


def _ext_linear_cells(s):
    """M_E @ state for (24, ...): per-chunk M4 + chunk-sum broadcast."""
    rest = s.shape[1:]
    s6 = s.reshape((WIDTH // 4, 4) + rest)
    ys = _m4_seq_cells(s6[:, 0], s6[:, 1], s6[:, 2], s6[:, 3])
    y = jnp.stack(ys, axis=1)  # (6, 4, ...)
    tot = F.add(F.add(y[0], y[1]), F.add(y[2], y[3]))
    tot = F.add(tot, F.add(y[4], y[5]))  # (4, ...)
    return F.add(y, tot[None]).reshape((WIDTH,) + rest)


def _lead_sum24(s):
    """Modular sum over the leading 24 axis -> (1, ...)."""
    t = F.add(F.add(s[0:8], s[8:16]), s[16:24])
    t = F.add(t[0:4], t[4:8])
    t = F.add(t[0:2], t[2:4])
    return F.add(t[0:1], t[1:2])


def permute_cells(s):
    """Poseidon2 permutation on a (24, ...) cells-layout state.

    Bit-identical to `permute` on the transposed state; rounds unrolled
    (callers embed this in a scan over absorb blocks, keeping the traced
    graph proportional to one permutation)."""
    ext_rc, int_rc, mu = _constants()
    bc = (slice(None),) + (None,) * (s.ndim - 1)
    mu_b = jnp.asarray(mu)[bc]
    half = ROUNDS_FULL // 2

    def ext_round(s, r):
        return _ext_linear_cells(_sbox(F.add(s, jnp.asarray(ext_rc[r])[bc])))

    def int_round(s, r):
        s0 = _sbox(F.add(s[0:1], jnp.uint32(int_rc[r])))
        s = jnp.concatenate([s0, s[1:]], axis=0)
        # M_I = J + diag(mu): dense Montgomery product + the row sum
        return F.add(F.mul(s, mu_b), _lead_sum24(s))

    s = _ext_linear_cells(s)
    for r in range(half):
        s = ext_round(s, r)
    for r in range(ROUNDS_PARTIAL):
        s = int_round(s, r)
    for r in range(half, ROUNDS_FULL):
        s = ext_round(s, r)
    return s


def hash_rows_cells(matrix):
    """Sponge-hash the rows of (N, C) in the cells layout -> (N, 8).

    Semantics identical to `hash_elems` (rate-16 absorb, zero-padded
    final block). This is the high-throughput leaf-hash path; inner tree
    levels keep the O(1)-graph scanned `hash_pair`."""
    n, c = matrix.shape
    blocks = max(1, -(-c // RATE))
    mat_t = jnp.swapaxes(matrix.astype(jnp.uint32), 0, 1)  # (C, N)
    if blocks * RATE != c:
        pad = jnp.zeros((blocks * RATE - c, n), jnp.uint32)
        mat_t = jnp.concatenate([mat_t, pad], axis=0)
    xs = mat_t.reshape(blocks, RATE, n)
    state = jnp.zeros((WIDTH, n), dtype=jnp.uint32)

    def absorb(s, blk):
        top = F.add(s[:RATE], blk)
        s = jnp.concatenate([top, s[RATE:]], axis=0)
        return permute_cells(s), None

    state, _ = jax.lax.scan(absorb, state, xs)
    return jnp.swapaxes(state[:DIGEST_WORDS], 0, 1)


def hash_elems(elems):
    """Sponge-hash rows of Baby Bear elements.

    elems: (..., L) Montgomery uint32; hashes along the last axis, absorbing
    RATE elements per permutation (zero-padded final block — callers hash
    fixed-length rows, e.g. Merkle leaves over trace columns).
    Returns a digest (..., 8) in Montgomery form.
    """
    batch = elems.shape[:-1]
    length = elems.shape[-1]
    blocks = max(1, -(-length // RATE))
    padded = jnp.zeros(batch + (blocks * RATE,), dtype=jnp.uint32)
    padded = padded.at[..., :length].set(elems)
    # (blocks, batch..., RATE) — scan the absorb loop (graph-size O(1)).
    xs = jnp.moveaxis(padded.reshape(batch + (blocks, RATE)), -2, 0)
    state = jnp.zeros(batch + (WIDTH,), dtype=jnp.uint32)

    def absorb(s, block):
        s = s.at[..., :RATE].set(F.add(s[..., :RATE], block))
        return permute(s), None

    state, _ = jax.lax.scan(absorb, state, xs)
    return state[..., :DIGEST_WORDS]


def hash_pair(left, right):
    """2-to-1 compression of two digests (..., 8) -> (..., 8)."""
    batch = left.shape[:-1]
    state = jnp.zeros(batch + (WIDTH,), dtype=jnp.uint32)
    state = state.at[..., :DIGEST_WORDS].set(left)
    state = state.at[..., DIGEST_WORDS : 2 * DIGEST_WORDS].set(right)
    return permute(state)[..., :DIGEST_WORDS]


def digest_canonical(digest):
    """Montgomery digest -> canonical uint32 words (for wire formats)."""
    return F.from_mont(digest)
