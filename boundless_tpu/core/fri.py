"""FRI low-degree test over Baby Bear's quartic extension (TPU-native).

Replaces the FRI commit/fold/query CUDA kernels behind the reference's
`ProverServer::prove_segment` (SURVEY.md §2.4). Parameters follow risc0:
fold factor 16, 50 queries at rate 1/4 (~100 bits), final degree 256.

Prover folding: one fold-by-16 round = four radix-2 folds with challenges
alpha, alpha^2, alpha^4, alpha^8 (equivalent to the direct
``sum_j alpha^j f_j(y)`` definition — proven in tests). Each radix-2 fold
is a pure vector op over the half-domain; every round's evaluations are
committed as a Merkle matrix whose row r holds the 16 coset-group values
{r + t*M/16}, so one query opens a whole group.

Verifier recomputes each fold at the query point with the direct formula
    f'(y_r) = (1/16) * sum_t v_t * sum_{j<16} (alpha / x_t)^j
which is O(256) ext-ops per query per round, fully vectorized over queries.

Domain bookkeeping: round k lives on the coset  shift_k * H_{M_k}  with
shift_0 = GENERATOR and shift_{k+1} = shift_k^16, M_{k+1} = M_k / 16.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import merkle
from .transcript import Transcript

FRI_FOLD = 16
FRI_FOLD_LOG = 4
QUERIES = 50
FRI_MIN_DEGREE = 256
INV_RATE = 4


def _np_powers(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^{n-1}] mod P as int64 numpy, via log-doubling."""
    out = np.ones(1, dtype=np.int64)
    cur = base % F.P
    while len(out) < n:
        out = np.concatenate([out, out * cur % F.P])
        cur = cur * cur % F.P
    return out[:n]


@functools.lru_cache(maxsize=None)
def _domain_inv_table(m: int, shift: int) -> np.ndarray:
    """x_i^{-1} = shift^{-1} w^{-i} for the coset shift*H_m, Montgomery u32."""
    w_inv = F.ROU_REV[m.bit_length() - 1]
    shift_inv = pow(shift, F.P - 2, F.P)
    tbl = _np_powers(w_inv, m) * shift_inv % F.P
    return (tbl * (1 << 32) % F.P).astype(np.uint32)  # to Montgomery


def _fold2(evals, beta, m: int, shift: int):
    """One radix-2 fold of ext evals (m, 4) on coset shift*H_m.

    Returns evals of fe + beta*fo on (shift^2)*H_{m/2}.
    """
    half = m // 2
    a = evals[:half]
    b = evals[half:]
    # fe = (a + b)/2 ; fo = (a - b) / (2 x_i)
    inv2 = jnp.uint32(F.mont(pow(2, F.P - 2, F.P)))
    fe = F.mul(F.add(a, b), inv2)
    xinv = jnp.asarray(_domain_inv_table(m, shift)[:half])
    fo = F.mul(F.mul(F.sub(a, b), inv2), xinv[:, None])
    return F.ext_add(fe, F.ext_mul(fo, jnp.broadcast_to(beta, fo.shape)))


def _fold16(evals, alpha, m: int, shift: int):
    beta = alpha
    cur = evals
    cur_m, cur_shift = m, shift
    for _ in range(FRI_FOLD_LOG):
        cur = _fold2(cur, beta, cur_m, cur_shift)
        cur_m //= 2
        cur_shift = cur_shift * cur_shift % F.P
        beta = F.ext_mul(beta, beta)
    return cur


def _group_matrix(evals, m: int):
    """(m, 4) ext evals -> (m/16, 64) row-per-coset-group matrix."""
    rows = m // FRI_FOLD
    return evals.reshape(FRI_FOLD, rows, 4).transpose(1, 0, 2).reshape(rows, FRI_FOLD * 4)


class FriProof(NamedTuple):
    round_roots: tuple  # per-round Merkle roots (8,)
    round_rows: tuple  # per-round opened rows (Q, 64)
    round_paths: tuple  # per-round sibling paths (Q, depth, 8)
    final_coeffs: jnp.ndarray  # (final_degree, 4) ext coefficients


def num_rounds(m: int, min_degree: int = FRI_MIN_DEGREE,
               inv_rate: int = INV_RATE) -> int:
    rounds = 0
    degree = m // inv_rate
    while degree > min_degree:
        rounds += 1
        degree //= FRI_FOLD
    return rounds


def prove(tr: Transcript, evals, queries: int = QUERIES,
          min_degree: int = FRI_MIN_DEGREE, inv_rate: int = INV_RATE,
          suite=None):
    """FRI-prove that `evals` ((M,4) ext, on GENERATOR*H_M) has degree
    < M/inv_rate.

    Returns (FriProof, round0_query_indices) — callers open their own
    commitments at the same indices.
    """
    m = evals.shape[0]
    shift = F.GENERATOR
    trees = []
    cur = evals
    cur_m, cur_shift = m, shift
    if suite is None:
        from . import suites

        suite = suites.get("poseidon2")
    for _ in range(num_rounds(m, min_degree, inv_rate)):
        tree = suite.commit(_group_matrix(cur, cur_m))
        trees.append(tree)
        tr.mix_digest(tree.root)
        alpha = tr.sample_ext()
        cur = _fold16(cur, alpha, cur_m, cur_shift)
        cur_m //= FRI_FOLD
        cur_shift = pow(cur_shift, FRI_FOLD, F.P)

    # Final polynomial: interpolate on the remaining coset, keep degree M/4.
    from . import ntt as NTT

    coeffs = NTT.intt(cur)  # (cur_m, 4); trailing ext dim is batch for NTT
    unshift = jnp.asarray(
        (_np_powers(pow(cur_shift, F.P - 2, F.P), cur_m) * (1 << 32) % F.P
         ).astype(np.uint32))
    coeffs = F.mul(coeffs, unshift[:, None])
    final_coeffs = coeffs[: cur_m // inv_rate]
    tr.mix_elems(final_coeffs)

    # Query phase.
    bits = m.bit_length() - 1
    indices = tr.sample_indices(queries, bits)
    round_rows, round_paths, round_roots = [], [], []
    idx = indices
    red_m = m
    for tree in trees:
        rows_n = red_m // FRI_FOLD
        r = jnp.mod(idx, rows_n)
        rows, paths = merkle.open_rows(tree, r)
        round_rows.append(rows)
        round_paths.append(paths)
        round_roots.append(tree.root)
        idx = r
        red_m = rows_n
    return FriProof(tuple(round_roots), tuple(round_rows), tuple(round_paths),
                    final_coeffs), indices


def verify(tr: Transcript, proof: FriProof, m: int, queries: int = QUERIES,
           min_degree: int = FRI_MIN_DEGREE, inv_rate: int = INV_RATE,
           suite=None):
    """Replay the transcript and check the FRI proof.

    Returns (ok, indices, round0_values) where round0_values[(q,)] is the
    committed evaluation of the tested polynomial at query index q — the
    caller (DEEP-ALI verifier) must check these against values it derives
    from the trace openings.
    """
    if suite is None:
        from . import suites

        suite = suites.get("poseidon2")
    rounds = num_rounds(m, min_degree, inv_rate)
    assert len(proof.round_roots) == rounds
    alphas = []
    for root in proof.round_roots:
        tr.mix_digest(root)
        alphas.append(tr.sample_ext())
    tr.mix_elems(proof.final_coeffs)
    bits = m.bit_length() - 1
    indices = tr.sample_indices(queries, bits)

    ok = jnp.bool_(True)
    idx = indices
    cur_m, cur_shift = m, F.GENERATOR
    value = None  # folded value carried between rounds, (Q, 4)
    round0 = None
    for k in range(rounds):
        rows_n = cur_m // FRI_FOLD
        r = jnp.mod(idx, rows_n)
        t_pos = idx // rows_n  # which of the 16 group slots is our point
        rows = proof.round_rows[k]  # (Q, 64)
        ok = ok & jnp.all(suite.verify_rows(proof.round_roots[k], r, rows,
                                            proof.round_paths[k]))
        group = rows.reshape(-1, FRI_FOLD, 4)  # (Q, 16, 4)
        mine = jnp.take_along_axis(group, t_pos[:, None, None], axis=1)[:, 0]
        if value is None:
            round0 = mine
        else:
            ok = ok & jnp.all(F.sub(mine, value) == 0)
        # Fold at the query group with the direct formula.
        inv_tbl = jnp.asarray(_domain_inv_table(cur_m, cur_shift))
        pos = r[:, None] + jnp.arange(FRI_FOLD)[None, :] * rows_n  # (Q,16)
        xinv = inv_tbl[pos]  # (Q, 16) base field
        ax = F.ext_scale(jnp.broadcast_to(alphas[k], (queries, FRI_FOLD, 4)),
                         xinv)  # alpha * x_t^{-1}
        # s_t = sum_{j<16} (alpha/x_t)^j  via Horner-free doubling:
        s = F.ext_ones((queries, FRI_FOLD))
        p = ax
        for _ in range(FRI_FOLD_LOG):  # 1 + p, then (1+p)(1+p^2)...
            s = F.ext_add(s, F.ext_mul(s, p))
            p = F.ext_mul(p, p)
        inv16 = jnp.uint32(F.mont(pow(FRI_FOLD, F.P - 2, F.P)))
        terms = F.ext_mul(group, s)
        value = F.mul(F.sum_mod(terms, axis=1), inv16)
        idx = r
        cur_m = rows_n
        cur_shift = pow(cur_shift, FRI_FOLD, F.P)

    # Final check: evaluate final_coeffs at the surviving points.
    w = F.ROU_FWD[cur_m.bit_length() - 1]
    xs = jnp.asarray((_np_powers(w, cur_m) * cur_shift % F.P * (1 << 32) % F.P
                      ).astype(np.uint32))
    x_at = xs[idx]  # (Q,) base field points
    deg = proof.final_coeffs.shape[0]
    # Horner over ext coeffs with base-field x (vectorized over queries).
    acc = jnp.zeros((queries, 4), dtype=jnp.uint32)
    for d in range(deg - 1, -1, -1):
        acc = F.ext_scale(acc, x_at)
        acc = F.ext_add(acc, jnp.broadcast_to(proof.final_coeffs[d], (queries, 4)))
    ok = ok & jnp.all(F.sub(acc, value) == 0)
    return ok, indices, round0
