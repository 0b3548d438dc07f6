"""BN254 base-field arithmetic on TPU lanes: 13-bit x 20-limb vectors.

The device layer under the Groth16 MSM (SURVEY §2.4: "multi-limb BN254 MSM
on TPU (limb-decomposed integer matmuls)"). Representation chosen for
int32 accumulation safety: with 13-bit limbs, a schoolbook product column
sums at most 20 partials of < 2^26 each (< 2^31, no overflow), so the
whole multiply runs on plain uint32 vector ops — and the partial-product
matrix maps onto the MXU as int8/int16 matmuls in the optimized path.

Montgomery form with R = 2^260 (20 limbs); CIOS-style reduction, one limb
per step (static 20-step Python loop = O(1) graph via fori over a scan).
Batched: arrays are (..., 20) uint32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bn254 import P as N_INT

B = 13  # limb bits
L = 20  # limbs (260 bits >= 254)
MASK = (1 << B) - 1
R_INT = 1 << (B * L)
R_MOD_N = R_INT % N_INT
R2_MOD_N = R_INT * R_INT % N_INT
NPRIME = (-pow(N_INT, -1, 1 << B)) % (1 << B)  # -N^{-1} mod 2^13


def to_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (B * i)) & MASK for i in range(L)],
                    dtype=np.uint32)


def from_limbs(limbs) -> int:
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(v) << (B * i) for i, v in enumerate(arr))


N_LIMBS = jnp.asarray(to_limbs(N_INT))


def to_mont(x: int) -> np.ndarray:
    return to_limbs(x * R_MOD_N % N_INT)


def from_mont(limbs) -> int:
    return from_limbs(limbs) * pow(R_INT, -1, N_INT) % N_INT


def _carry_propagate(acc):
    """Normalize (..., L) uint32 accumulators to 13-bit limbs.

    acc values < 2^31; three passes guarantee full propagation for CIOS
    intermediate magnitudes.
    """
    for _ in range(3):
        carry = acc >> B
        acc = (acc & MASK) + jnp.concatenate(
            [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)
    return acc


def add(a, b):
    """(a + b) mod N, limbs in, limbs out."""
    s = _carry_propagate(a + b)
    return _cond_sub_n(s)


def _ge_n(x):
    """x >= N for 13-bit-normalized (..., L) limbs."""
    diff = x.astype(jnp.int32) - N_LIMBS.astype(jnp.int32)
    # lexicographic from the top limb
    ge = jnp.zeros(x.shape[:-1], dtype=jnp.bool_)
    decided = jnp.zeros(x.shape[:-1], dtype=jnp.bool_)
    for i in range(L - 1, -1, -1):
        gt = diff[..., i] > 0
        lt = diff[..., i] < 0
        ge = jnp.where(~decided & gt, True, ge)
        decided = decided | gt | lt
    ge = jnp.where(~decided, True, ge)  # equal counts as >=
    return ge


def _cond_sub_n(x):
    """Subtract N where x >= N (x < 2N, normalized 13-bit limbs)."""
    ge = _ge_n(x)[..., None]
    outs = []
    borrow = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    for i in range(L):
        v = x[..., i].astype(jnp.int32) - N_LIMBS[i].astype(jnp.int32) - borrow
        neg = (v < 0).astype(jnp.int32)
        outs.append((v + neg * (1 << B)).astype(jnp.uint32))
        borrow = neg
    sub = jnp.stack(outs, axis=-1)
    return jnp.where(ge, sub, x)


def mont_mul(a, b):
    """Montgomery product (a * b * R^{-1} mod N) on (..., L) uint32 limbs.

    CIOS: one schoolbook row + one reduction limb per step, as a lax.scan
    over a's limbs (O(1) traced graph per multiply — compile-latency
    discipline; see core/field.py docstring for why that matters here).
    """
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (L,))
    b = jnp.broadcast_to(b, batch + (L,))
    acc0 = jnp.zeros(batch + (L + 1,), dtype=jnp.uint32)
    np_c = jnp.uint32(NPRIME)
    a_limbs = jnp.moveaxis(a, -1, 0)  # (L, ...batch)

    def step(acc, ai):
        acc = acc.at[..., :L].add(ai[..., None] * b)  # sums < 2^31
        acc = _partial_carry(acc)
        m = (acc[..., 0] * np_c) & MASK
        acc = acc.at[..., :L].add(m[..., None] * N_LIMBS)
        acc = _partial_carry(acc)
        # shift right one limb (divide by 2^B; low limb now zero mod 2^B)
        low_carry = acc[..., 0] >> B
        acc = jnp.concatenate(
            [acc[..., 1:], jnp.zeros_like(acc[..., :1])], axis=-1)
        acc = acc.at[..., 0].add(low_carry)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, a_limbs)
    res = _carry_propagate(acc[..., :L])
    return _cond_sub_n(res)


def _partial_carry(acc):
    carry = acc >> B
    return (acc & MASK) + jnp.concatenate(
        [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)


def mul(a, b):
    """Plain modular product of Montgomery-form operands."""
    return mont_mul(a, b)


def is_zero(a):
    """(...,) bool: all limbs zero."""
    return jnp.all(a == 0, axis=-1)


def neg(a):
    """(-a) mod N on normalized limbs."""
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.int32)
    for i in range(L):
        v = N_LIMBS[i].astype(jnp.int32) - a[..., i].astype(jnp.int32) - borrow
        nb = (v < 0).astype(jnp.int32)
        outs.append((v + nb * (1 << B)).astype(jnp.uint32))
        borrow = nb
    out = jnp.stack(outs, axis=-1)
    return jnp.where(is_zero(a)[..., None], a, out)


def sub(a, b):
    """(a - b) mod N."""
    return add(a, neg(b))


def eq(a, b):
    return jnp.all(a == b, axis=-1)
