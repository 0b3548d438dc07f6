"""BN254 G1 multi-scalar multiplication on TPU.

The device path for the Groth16 wrap's dominant cost (SURVEY §2.4:
`risc0-groth16-sys` CUDA MSM). Built on the 13-bit-limb field layer
(limbs.py); curve points are Jacobian with Z=0 marking infinity, all ops
branchless (both add/double paths computed, jnp.where-selected) so they
batch over point vectors on the VPU.

The v1 schedule is a lax.scan over the 254 scalar bits:
  acc = 2*acc;  acc += tree_reduce(where(bit_i, P_i, inf))
— O(254·(1 + log n)) batched EC ops with an O(1)-size traced graph
(compile-latency discipline). Pippenger bucketing on sorted digits is the
round-2 upgrade; the field layer and group ops here are what it reuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as LB
from .bn254 import G1, P as P_INT


def _pt(x_int, y_int, inf=False):
    """Host: affine ints -> Montgomery limb Jacobian (stacked [X, Y, Z])."""
    if inf:
        z = np.zeros(LB.L, dtype=np.uint32)
        return np.stack([LB.to_mont(1), LB.to_mont(1), z])
    return np.stack([LB.to_mont(x_int), LB.to_mont(y_int),
                     LB.to_mont(1)])


def points_to_device(points):
    """List[G1] -> (n, 3, L) uint32 array."""
    rows = []
    for p in points:
        aff = p.to_affine()
        rows.append(_pt(0, 0, inf=True) if aff is None else _pt(*aff))
    return jnp.asarray(np.stack(rows))


def point_from_device(pt) -> G1:
    x = LB.from_mont(np.asarray(pt[0]))
    y = LB.from_mont(np.asarray(pt[1]))
    z = LB.from_mont(np.asarray(pt[2]))
    if z == 0:
        return G1.infinity()
    return G1(x, y, z)


def _is_inf(p):
    return LB.is_zero(p[..., 2, :])


def ec_double(p):
    """Jacobian doubling, branchless; infinity propagates (Z stays 0)."""
    X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    A = LB.mul(X, X)
    Bv = LB.mul(Y, Y)
    C = LB.mul(Bv, Bv)
    t = LB.add(X, Bv)
    D = LB.sub(LB.mul(t, t), LB.add(A, C))
    D = LB.add(D, D)  # 2*((X+B)^2 - A - C)
    E = LB.add(LB.add(A, A), A)  # 3A
    F = LB.mul(E, E)
    X3 = LB.sub(F, LB.add(D, D))
    eightC = LB.add(C, C)
    eightC = LB.add(eightC, eightC)
    eightC = LB.add(eightC, eightC)
    Y3 = LB.sub(LB.mul(E, LB.sub(D, X3)), eightC)
    YZ = LB.mul(Y, Z)
    Z3 = LB.add(YZ, YZ)
    return jnp.stack([X3, Y3, Z3], axis=-2)


def ec_add(p, q):
    """Branchless Jacobian addition covering inf/equal/negation cases."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    Z1Z1 = LB.mul(Z1, Z1)
    Z2Z2 = LB.mul(Z2, Z2)
    U1 = LB.mul(X1, Z2Z2)
    U2 = LB.mul(X2, Z1Z1)
    S1 = LB.mul(LB.mul(Y1, Z2), Z2Z2)
    S2 = LB.mul(LB.mul(Y2, Z1), Z1Z1)
    H = LB.sub(U2, U1)
    r = LB.sub(S2, S1)
    r = LB.add(r, r)  # 2(S2-S1)
    I = LB.mul(H, H)
    I = LB.add(LB.add(I, I), LB.add(I, I))  # 4H^2
    J = LB.mul(H, I)
    V = LB.mul(U1, I)
    X3 = LB.sub(LB.sub(LB.mul(r, r), J), LB.add(V, V))
    S1J = LB.mul(S1, J)
    Y3 = LB.sub(LB.mul(r, LB.sub(V, X3)), LB.add(S1J, S1J))
    ZZ = LB.mul(Z1, Z2)
    Z3 = LB.mul(LB.add(ZZ, ZZ), H)
    added = jnp.stack([X3, Y3, Z3], axis=-2)

    same_x = LB.eq(U1, U2)
    same_y = LB.eq(S1, S2)
    doubled = ec_double(p)
    inf = jnp.zeros_like(p)
    p_inf = _is_inf(p)[..., None, None]
    q_inf = _is_inf(q)[..., None, None]
    out = jnp.where((same_x & same_y)[..., None, None], doubled, added)
    out = jnp.where((same_x & ~same_y)[..., None, None], inf, out)
    out = jnp.where(q_inf, p, out)
    out = jnp.where(p_inf, q, out)
    return out


def _tree_reduce(pts):
    """(n, 3, L) -> (3, L) via log-depth pairwise ec_add (n power of two)."""
    n = pts.shape[0]
    while n > 1:
        n //= 2
        pts = ec_add(pts[:n], pts[n:])
    return pts[0]


def msm_device(points_dev, bits_dev):
    """points (n,3,L) uint32, bits (254, n) uint32 (MSB first) -> (3,L)."""
    n = points_dev.shape[0]
    inf = jnp.zeros_like(points_dev)

    def body(acc, bit_row):
        sel = jnp.where(bit_row[:, None, None].astype(bool), points_dev, inf)
        contrib = _tree_reduce(sel)
        acc = ec_double(acc)
        acc = ec_add(acc, contrib[None])[0]
        return acc, None

    acc0 = jnp.zeros((3, LB.L), dtype=jnp.uint32)
    acc, _ = jax.lax.scan(lambda a, b: body(a, b), acc0, bits_dev)
    return acc


def msm(points, scalars) -> G1:
    """Host-facing MSM: List[G1], List[int] -> G1 (runs on device)."""
    from .bn254 import R

    n = len(points)
    if n == 0:
        return G1.infinity()
    pow2 = 1 << (n - 1).bit_length()
    pts = list(points) + [G1.infinity()] * (pow2 - n)
    scs = [s % R for s in scalars] + [0] * (pow2 - n)
    bits = np.zeros((254, pow2), dtype=np.uint32)
    for i, s in enumerate(scs):
        for b in range(254):
            bits[253 - b, i] = (s >> b) & 1
    out = jax.jit(msm_device)(points_to_device(pts), jnp.asarray(bits))
    return point_from_device(out)
