"""Exact Baby Bear matrix products on the MXU (int8 limb matmuls).

The STARK prover's two hottest non-hash stages are weighted column sums:

  * the constraint combiner  Σ_k α^k · C_k(x)   over ~10^3 constraint values
    per row of the 4N grid (`prover/stark.py combine_constraints`), and
  * the DEEP batch combination Σ_j β^j · P_j(x) over all committed columns
    on the commit domain (`prover/stark.py _deep_combo_evals`).

Both are (M, K) @ (K, 4) products over F_p — matmuls. On the VPU each
term costs a full Montgomery multiply (~16 u32 ops); on the MXU the same
contraction runs as int8 matmuls at hundreds of Tops (reference replaces
CUDA `risc0-sys` constraint/poly kernels, SURVEY.md §2.4).

Exactness: operands (< 2^31, Montgomery form) are decomposed into five
7-bit limbs, so every limb fits int8 with headroom and the int32
accumulator is exact for K ≤ 2^31 / (127^2 · ...) — we chunk K at
K_CHUNK to stay far inside the bound. Limb-pair products are regrouped
by total shift s = l+m and folded mod P with one Montgomery multiply per
group, yielding *bit-identical* results to the VPU path:

  bb_weighted_sum(V, W) == F.sum_mod(F.mul(V[..., None], W[None]), axis=1)

(the verifier can therefore keep the cheap VPU path for its Q ~ 100 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

_U32 = jnp.uint32
LIMBS = 5  # 7-bit limbs cover 2^31 > P
LIMB_BITS = 7
K_CHUNK = 16384  # per-matmul contraction bound (int32 accum headroom ~8x)


def _limbs_i8(x):
    """(..., K) uint32 -> (LIMBS, ..., K) int8 of 7-bit limbs (low first)."""
    planes = [((x >> (LIMB_BITS * l)) & jnp.uint32(0x7F)).astype(jnp.int8)
              for l in range(LIMBS)]
    return jnp.stack(planes, axis=0)


@functools.lru_cache(maxsize=1)
def _shift_consts():
    """2^(7s) mod P for s = 0..2*(LIMBS-1), canonical uint32 numpy."""
    return np.array([(1 << (LIMB_BITS * s)) % F.P
                     for s in range(2 * LIMBS - 1)], dtype=np.uint32)


def _fold_groups(groups):
    """groups: (S, ..., ) uint32 raw sums -> Σ_s groups[s] * 2^(7s) * R^-1.

    montmul(S_s, 2^(7s)) = S_s * 2^(7s) * R^-1 mod P — correct for any
    uint32 S_s (mont_reduce only needs the wide product < P * 2^32).
    """
    consts = _shift_consts()
    acc = None
    for s in range(groups.shape[0]):
        term = F.mul(groups[s], jnp.uint32(consts[s]))
        acc = term if acc is None else F.add(acc, term)
    return acc


def bb_weighted_sum(values, weights):
    """Montgomery weighted column sum on the MXU.

    values:  (M, K) uint32 (Montgomery or any u32 < 2^31)
    weights: (K, W) uint32
    Returns (M, W) uint32 == F.sum_mod(F.mul(values[:,:,None],
             weights[None,:,:]), axis=1) — bit-identical, exact.
    """
    m, k = values.shape
    k2, w = weights.shape
    assert k == k2
    out = None
    for k0 in range(0, k, K_CHUNK):
        k1 = min(k0 + K_CHUNK, k)
        part = _bb_ws_chunk(values[:, k0:k1], weights[k0:k1])
        out = part if out is None else F.add(out, part)
    return out


def bb_weighted_sum_t(values_t, weights):
    """bb_weighted_sum for transposed values: (K, M) @ weights (K, W).

    Identical accumulation order/fold as bb_weighted_sum (bit-identical
    result); avoids an HBM transpose when the values already live
    row-major by column (the Pallas constraint-eval kernel's output).
    """
    k, m = values_t.shape
    k2, w = weights.shape
    assert k == k2
    out = None
    for k0 in range(0, k, K_CHUNK):
        k1 = min(k0 + K_CHUNK, k)
        part = _bb_ws_chunk(values_t[k0:k1], weights[k0:k1], transposed=True)
        out = part if out is None else F.add(out, part)
    return out


def _bb_ws_chunk(values, weights, transposed: bool = False):
    if transposed:
        k, m = values.shape
    else:
        m, k = values.shape
    w = weights.shape[1]
    va = _limbs_i8(values)  # (L, M, K) or (L, K, M) when transposed
    wb = _limbs_i8(weights)  # (L, K, W)
    # rhs: stack B-limbs along the output axis -> (K, L*W), broadcast to
    # every A-limb batch slot.
    rhs = jnp.moveaxis(wb, 0, 1).reshape(k, LIMBS * w)  # (K, L*W)
    rhs = jnp.broadcast_to(rhs[None], (LIMBS, k, LIMBS * w))
    contract = ((1,), (1,)) if transposed else ((2,), (1,))
    prod = jax.lax.dot_general(
        va, rhs,
        dimension_numbers=(contract, ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (L, M, L*W): prod[l, :, m*W+j] = Σ_k A_l B_m
    prod = prod.reshape(LIMBS, m, LIMBS, w).astype(_U32)
    # regroup by s = l + m
    ngroups = 2 * LIMBS - 1
    groups = jnp.zeros((ngroups, m, w), dtype=_U32)
    for l in range(LIMBS):
        for mm in range(LIMBS):
            groups = groups.at[l + mm].add(prod[:, :, mm][l])
    return _fold_groups(groups)


def bb_matmul(a, b):
    """Full Montgomery matmul (M, K) @ (K, N) -> (M, N) on the MXU.

    Semantics match a Montgomery-product dot: out = (Σ_k a*b) * R^-1 mod P,
    i.e. Montgomery-form inputs give a Montgomery-form field matmul.
    """
    return bb_weighted_sum(a, b)
