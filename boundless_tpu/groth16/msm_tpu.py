"""BN254 G1 multi-scalar multiplication on TPU.

The device path for the Groth16 wrap's dominant cost (SURVEY §2.4:
`risc0-groth16-sys` CUDA MSM). Built on the 13-bit-limb field layer
(limbs.py); curve points are Jacobian with Z=0 marking infinity, all ops
branchless (both add/double paths computed, jnp.where-selected) so they
batch over point vectors on the VPU.

Two schedules:

* **Pippenger (default)** — windowed bucketing, TPU-shaped: scalars are
  HOST-known, so all bucketing control flow (per-window digit sort,
  zero-digit elision, segment boundaries) is precomputed host-side into
  gather indices; the device runs one big gather + a SEGMENTED
  associative scan whose combine is the branchless Jacobian add (a
  segmented scan is associative: (f1,x1)+(f2,x2) = (f1|f2, f2? x2 :
  x1+x2) — so lax.associative_scan gives log-depth bucket sums), then a
  suffix associative scan over buckets for the weighted reduce
  (sum_d d*B_d = sum_k sum_{d>=k} B_d), and w doublings + 1 add per
  window. EC-add work ~ 2*ceil(254/w)*n for the scans vs the bit-scan's
  254*n — measured faster from ~2^10 points up (bench_msm below; the
  CUDA reference's Pippenger role, blake3_groth16/src/prove/cuda.rs:40).
* **bit-scan (fallback / tiny n)** — lax.scan over the 254 scalar bits:
  acc = 2*acc; acc += tree_reduce(where(bit_i, P_i, inf)). O(1)-size
  traced graph, best below the Pippenger crossover.
"""

from __future__ import annotations

import functools

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


def msm_scan(points, scalars) -> G1:
    """Bit-scan MSM (fallback schedule; see module docstring)."""
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


# ---------------------------------------------------------------------------
# Pippenger (windowed buckets via host-prepped segmented scans)
# ---------------------------------------------------------------------------


def _seg_combine(a, b):
    """Segmented-scan monoid over (boundary flag, Jacobian point)."""
    fa, pa = a
    fb, pb = b
    summed = ec_add(pa, pb)
    out = jnp.where(fb[..., None, None].astype(bool), pb, summed)
    return fa | fb, out


def _pip_device(pts_sorted, flags, end_idx, n_windows, n_buckets, w):
    """Device half of Pippenger.

    pts_sorted: (m, 3, L) points gathered in (window, digit) order;
    flags: (m,) uint32, 1 at each segment START;
    end_idx: (n_windows, n_buckets) gather index of each bucket's last
    element in the scan (0 for empty buckets);
    bucket 0 of end_idx must point at an infinity sentinel (index 0 is
    reserved by the host prep).
    """
    _, sums = jax.lax.associative_scan(_seg_combine,
                                       (flags, pts_sorted), axis=0)
    buckets = sums[end_idx.reshape(-1)]
    buckets = buckets.reshape(n_windows, n_buckets, 3, LB.L)
    # weighted reduce per window: sum_d d*B_d via suffix partial sums
    rev = buckets[:, ::-1]  # descending digit order (B_0 sentinel last)
    suffix = jax.lax.associative_scan(ec_add, rev, axis=1)
    # sum_d d*B_d = sum_{k>=1} (sum_{d>=k} B_d): drop the k=0 suffix
    t = _tree_reduce_axis1(suffix[:, :-1])  # (n_windows, 3, L)

    # combine windows MSB-first: acc = 2^w * acc + T_j
    def body(acc, tj):
        for _ in range(w):
            acc = ec_double(acc)
        return ec_add(acc[None], tj[None])[0], None

    acc0 = jnp.zeros((3, LB.L), dtype=jnp.uint32)
    acc, _ = jax.lax.scan(body, acc0, t)
    return acc


def _tree_reduce_axis1(pts):
    """(W, n, 3, L) -> (W, 3, L) pairwise reduce along axis 1."""
    n = pts.shape[1]
    while n > 1:
        if n % 2:
            pts = jnp.concatenate(
                [pts, jnp.zeros_like(pts[:, :1])], axis=1)
            n += 1
        n //= 2
        pts = ec_add(pts[:, :n], pts[:, n:])
    return pts[:, 0]


@functools.lru_cache(maxsize=8)
def _pip_jit(m, n_windows, n_buckets, w):
    return jax.jit(functools.partial(_pip_device, n_windows=n_windows,
                                     n_buckets=n_buckets, w=w))


def msm_pippenger(points, scalars, w: int = 8) -> G1:
    """Windowed-bucket MSM; all control flow host-prepped (docstring)."""
    from .bn254 import R

    n = len(points)
    if n == 0:
        return G1.infinity()
    scs = [s % R for s in scalars]
    n_windows = (254 + w - 1) // w
    n_buckets = 1 << w
    # (window, digit, point) entries, zero digits elided
    entries = []  # per window: list of (digit, point index)
    for j in range(n_windows):
        shift = w * (n_windows - 1 - j)  # MSB window first
        rows = []
        for i, s in enumerate(scs):
            d = (s >> shift) & (n_buckets - 1)
            if d:
                rows.append((d, i))
        rows.sort()
        entries.append(rows)
    gather = [0]  # index 0 reserved: infinity sentinel
    flags = [1]
    end_idx = np.zeros((n_windows, n_buckets), dtype=np.int32)
    pos = 1
    for j, rows in enumerate(entries):
        prev_d = None
        for d, i in rows:
            gather.append(i + 1)
            flags.append(1 if d != prev_d else 0)
            end_idx[j, d] = pos  # last write per digit wins
            prev_d = d
            pos += 1
    m = len(gather)
    # pad to a power of two for the associative scans (padding rows are
    # their own single-element segments of infinity)
    mp = 1 << max(1, (m - 1).bit_length())
    gather += [0] * (mp - m)
    flags += [1] * (mp - m)
    pts_dev = points_to_device([G1.infinity()] + list(points))
    pts_sorted = pts_dev[np.asarray(gather, dtype=np.int32)]
    out = _pip_jit(mp, n_windows, n_buckets, w)(
        pts_sorted, jnp.asarray(np.asarray(flags, dtype=np.uint32)),
        jnp.asarray(end_idx))
    return point_from_device(out)


# Pippenger pays off once the gather/scan setup amortizes; below the
# crossover the O(1)-graph bit-scan wins (bench_msm measurement).
PIPPENGER_MIN_POINTS = 64


def msm(points, scalars) -> G1:
    """Host-facing MSM: List[G1], List[int] -> G1 (runs on device)."""
    if len(points) >= PIPPENGER_MIN_POINTS:
        return msm_pippenger(points, scalars)
    return msm_scan(points, scalars)
