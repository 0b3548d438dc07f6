"""Fused Pallas TPU kernel for pointwise AIR constraint evaluation.

This replaces the prover's hottest non-hash stage (reference: the
generated CUDA constraint-eval "steps" kernels in
`risc0-circuit-rv32im-sys`, SURVEY.md §2.4): evaluating every AIR
constraint family over the 4N coset grid and α-combining them into the
composition numerator.

The pure-XLA path (`prover/stark.py`) materialises hundreds of (M, G)
intermediates in HBM — constraint eval is HBM-bound at a few percent of
the VPU ceiling (docs/ROOFLINE.md). This kernel evaluates the ENTIRE
constraint DAG for a tile of rows inside VMEM:

  * rows live on (sublane, lane) tiles: every per-row scalar is a
    (SB, 128) u32 vreg block, grouped families are (G, SB, 128), and
    extension values are (4, SB, 128) — all ops dense full-vreg VPU ops
    (same layout discipline as `core/poseidon2_pallas.py` v2);
  * `Air.constraints` runs unmodified inside the kernel against `TAlg`,
    a transposed implementation of the `air/dsl.py` algebra surface —
    the same polymorphism that serves the DEEP point and the recursion
    wire-VM serves the kernel;
  * the `nxt` row view reads pre-rolled operands (no in-kernel shifts);
  * row-independent public work (the rv32im LogUp public sum) is
    precomputed outside and enters through one small operand vector
    (`air.pallas_pub_pack` / `pallas_pub_unpack`);
  * the kernel writes the stacked (K, M) constraint-value matrix; the
    α-combine stays one exact MXU weighted sum (`core/bbmm.py`,
    transposed variant — no HBM transpose of the kernel output).

Results are exact field values — identical to the XLA path (both are
canonical Montgomery arithmetic), enforced by tests/test_pallas_cons.py
in interpret mode on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import field as F
from ..core import ntt as NTT
from .dsl import BaseAlg, Columns

_U32 = jnp.uint32


def enabled() -> bool:
    """Opt-in (BT_CONS_PALLAS=1): first execution pays the relay's
    one-time per-process Mosaic compile (docs/ROOFLINE.md)."""
    return os.environ.get("BT_CONS_PALLAS", "0") == "1"


# ---------------------------------------------------------------------------
# Transposed extension-field helpers: ext values carry their 4 components
# on the LEADING axis ((4, SB, 128)), so each component is a dense vreg.
# ---------------------------------------------------------------------------


def _rankup(vec, shape):
    """1-D value -> `shape` with trailing unit dims, via broadcast_in_dim
    (Mosaic rejects the equivalent shape-cast reshape of sub-lane-width
    vectors: "infer-vector-layout: unsupported shape cast")."""
    vec = jnp.asarray(vec).reshape(-1)
    assert int(np.prod(shape)) == vec.shape[0] and shape[1:] == (1, 1), shape
    return jax.lax.broadcast_in_dim(vec, shape, (0,))


def t_ext_add(a, b):
    return F.add(a, b)


def t_ext_sub(a, b):
    return F.sub(a, b)


def t_ext_neg(a):
    return F.neg(a)


def t_ext_mul(a, b):
    """Schoolbook quartic multiply, components on axis 0 (x^4 = 11)."""
    a0, a1, a2, a3 = a[0], a[1], a[2], a[3]
    b0, b1, b2, b3 = b[0], b[1], b[2], b[3]
    beta = np.uint32(F.mont(F.BETA))
    m, add = F.mul, F.add
    c0 = add(m(a0, b0), m(beta, add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = add(add(m(a0, b1), m(a1, b0)), m(beta, add(m(a2, b3), m(a3, b2))))
    c2 = add(add(m(a0, b2), add(m(a1, b1), m(a2, b0))), m(beta, m(a3, b3)))
    c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
    return jnp.stack(
        [c0, c1, c2, c3] if c0.ndim else
        [jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(c3)],
        axis=0)


class TAlg:
    """Transposed in-kernel algebra: scalars (SB, 128), groups
    (G, SB, 128), extension values (4, SB, 128). Implements the same
    surface as `dsl.BaseAlg` (constraints code is agnostic).

    Constant tables (gconst/ext_const weight vectors) cannot live in the
    kernel: Pallas rejects ANY captured array constant ("captures
    constants [...] pass them as inputs"), numpy or jnp alike. They ride
    a packed operand instead, in two phases sharing this class:

      * collect mode (`collect=[]`): an abstract `jax.eval_shape` pass of
        the kernel body records every requested table (np Montgomery
        arrays, in call order) and computes with the np values directly;
      * consume mode (`consume=iter(...)`): the real kernel pops the
        matching slice of the packed const operand for each request —
        the constraints code is deterministic, so call order matches.

    Scalar-shaped constants (`const`/`one`/`zero`) stay np scalars
    (Mosaic literals). Zero/broadcast tiles derive from `self._zero`, a
    kernel-input-derived zero tile, never from `jnp.zeros` (which would
    be a capture)."""

    is_ext = False

    def __init__(self, sb: int, collect=None, consume=None):
        self.sb = sb
        self.s_pub_const = None
        self._collect = collect
        self._consume = consume
        # (sb, 128) zero tile; consumers must set this from an input-
        # derived value before running kernel code (see _cons_kernel).
        self._zero = None

    def _table(self, arr_int64, shape):
        """Register/fetch a Montgomery constant table of `shape`."""
        if self._consume is not None:
            return _rankup(next(self._consume), shape)
        tab = np.asarray(
            (np.asarray(arr_int64, dtype=np.int64) % F.P) * (1 << 32) % F.P,
            dtype=np.uint32)
        if self._collect is not None:
            self._collect.append(tab.ravel())
        return tab.reshape(shape)

    # --- base ops ---
    add = staticmethod(F.add)
    sub = staticmethod(F.sub)
    mul = staticmethod(F.mul)
    neg = staticmethod(F.neg)

    def const(self, c: int):
        return np.uint32(F.mont(int(c)))

    def one(self):
        return np.uint32(F.ONE)

    def zero(self):
        return np.uint32(0)

    def _full(self, x):
        # `+ zero-tile` (plain uint32 add of 0: value-preserving) keeps
        # np-scalar inputs from materialising as captured constants.
        if self._zero is not None:
            return self._zero + jnp.asarray(x, _U32)
        return jnp.broadcast_to(jnp.asarray(x, _U32), (self.sb, 128))

    # --- ext ops (leading axis 4) ---
    def lift(self, b):
        b = self._full(b)
        z = b * _U32(0)
        return jnp.stack([b, z, z, z], axis=0)

    emul = staticmethod(t_ext_mul)
    eadd = staticmethod(t_ext_add)
    esub = staticmethod(t_ext_sub)
    eneg = staticmethod(t_ext_neg)

    def escale(self, e, b):
        return F.mul(e, jnp.asarray(b, _U32))

    def read_ext(self, accessor, base_idx: int):
        return jnp.stack([accessor[base_idx + c] for c in range(4)], axis=0)

    def stack(self, items):
        return jnp.stack([self._full(x) for x in items], axis=0)

    def pubval(self, x):
        return jnp.asarray(x, _U32)

    def ext_const(self, vec):
        return self._table(vec, (4, 1, 1))

    def ext_powers(self, x, n: int):
        x = jnp.asarray(x, _U32)
        x = _rankup(x, (4, 1, 1)) if x.shape != (4, 1, 1) else x
        pows = [self.ext_const([1, 0, 0, 0])]
        for _ in range(n - 1):
            pows.append(t_ext_mul(pows[-1], x))
        return jnp.stack(pows, axis=0)  # (n, 4, 1, 1)

    def einv(self, e):
        raise NotImplementedError("no in-kernel ext inversion")

    def bc(self, e, like):
        return jnp.broadcast_to(e, jnp.shape(like))

    # --- grouped ops: (G, SB, 128) ---
    gmul = staticmethod(F.mul)
    gadd = staticmethod(F.add)
    gsub = staticmethod(F.sub)

    def B(self, s):
        s = jnp.asarray(s)
        return s[None] if s.ndim else s

    def gsize(self, group) -> int:
        return group.shape[0]

    def gconst(self, vec):
        return self._table(vec, (len(np.asarray(vec).ravel()), 1, 1))

    def gsum(self, x):
        return F.sum_mod(x, axis=0)

    def gweighted(self, x, w_vec):
        return self.gsum(F.mul(x, self.gconst(w_vec)))

    def gweighted_ext(self, x, w_ext):
        # x (G, SB, 128); w_ext (G, 4, 1, 1) -> (4, SB, 128)
        return F.sum_mod(F.mul(w_ext, x[:, None]), axis=0)

    def gslice(self, x, a, b):
        return x[a:b]

    def gshift_sll(self, x, s):
        if not s:
            return x
        g = x.shape[0]
        z = jnp.broadcast_to(x[:1] * _U32(0), (s,) + x.shape[1:])
        return jnp.concatenate([z, x[: g - s]], axis=0)

    def gshift_srl(self, x, s):
        if not s:
            return x
        z = jnp.broadcast_to(x[:1] * _U32(0), (s,) + x.shape[1:])
        return jnp.concatenate([x[s:], z], axis=0)

    def gshift_sra(self, x, s):
        if not s:
            return x
        fill = jnp.broadcast_to(x[-1:], (s,) + x.shape[1:])
        return jnp.concatenate([x[s:], fill], axis=0)

    def gconcat(self, groups):
        return jnp.concatenate(groups, axis=0)

    def gpub(self, vec):
        return jnp.asarray(vec, _U32)[:, None, None]


class _TAcc:
    """Column accessor over an in-VMEM (C, SB, 128) tile."""

    __slots__ = ("_arr",)

    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, i):
        return self._arr[i]

    def block(self, idx):
        if isinstance(idx, slice):
            return self._arr[idx]
        idx = list(idx)
        if idx == list(range(idx[0], idx[0] + len(idx))):
            return self._arr[idx[0] : idx[0] + len(idx)]
        return jnp.stack([self._arr[i] for i in idx], axis=0)


# ---------------------------------------------------------------------------
# Constraint-list structure (kinds) and the α-weight matrix
# ---------------------------------------------------------------------------


def _cons_kinds(air, ctrl_cols, data_cols, accum_cols, globals_, pub):
    """[('base'|'vec'|'ext', G), ...] in constraint order, via abstract
    tracing of the XLA path (no FLOPs; cached per air/layout)."""
    from ..prover import stark

    cache = air.__dict__.setdefault("_pallas_kinds", {})
    key = (ctrl_cols, data_cols, accum_cols)
    if key in cache:
        return cache[key]
    kinds = []

    def probe(ce, de, ae, g, pubv):
        mk = lambda e: stark._ColAccessor(e)
        now = Columns(ctrl=mk(ce), data=mk(de), accum=mk(ae))
        nxt = Columns(ctrl=mk(jnp.roll(ce, -1, axis=0)),
                      data=mk(jnp.roll(de, -1, axis=0)),
                      accum=mk(jnp.roll(ae, -1, axis=0)))
        cons = air.constraints(BaseAlg(), now, nxt, g, pubv)
        for c in cons:
            if isinstance(c, stark.VecVal):
                kinds.append(("vec", c.v.shape[-1]))
            elif isinstance(c, stark.ExtVal):
                kinds.append(("ext", 1))
            else:
                kinds.append(("base", 1))
        return jnp.zeros(())

    sds = lambda c: jax.ShapeDtypeStruct((8, c), _U32)
    jax.eval_shape(probe, sds(ctrl_cols), sds(data_cols), sds(accum_cols),
                   jax.ShapeDtypeStruct(jnp.shape(globals_), _U32), pub)
    cache[key] = tuple(kinds)
    return cache[key]


def _rows_of(kinds) -> int:
    return sum(g if k == "vec" else (4 if k == "ext" else 1)
               for k, g in kinds)


@functools.lru_cache(maxsize=8)
def _basis_np(c: int) -> np.ndarray:
    z = np.zeros(4, dtype=np.int64)
    z[c] = 1
    return (z % F.P) * (1 << 32) % F.P


def _alpha_weight_rows(kinds, alpha):
    """(K, 4) ext weights matching the kernel's stacked row order and the
    verifier's α-power assignment (`combine_constraints` sizes)."""
    total = sum(g if k == "vec" else 1 for k, g in kinds)
    apows = NTT.ext_powers(alpha, total)
    rows = []
    k = 0
    for kind, g in kinds:
        if kind == "vec":
            rows.append(apows[k : k + g])
            k += g
        elif kind == "base":
            rows.append(apows[k : k + 1])
            k += 1
        else:  # ext: 4 base component rows, weight α^k ⊗ X^c
            basis = jnp.stack([jnp.asarray(_basis_np(c), _U32)
                               for c in range(4)])  # (4, 4) Montgomery
            rows.append(jax.vmap(F.ext_mul, in_axes=(None, 0))(
                apows[k], basis))
            k += 1
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# Kernel + wrapper
# ---------------------------------------------------------------------------


def _kernel_body(alg, air, data, datan, ctrl, ctrln, acc, accn, sm):
    """Shared constraint-eval body: runs in the real kernel (consume
    mode) and in the abstract const-collection pass (collect mode)."""
    from ..prover import stark

    globals_list, pub, s_pub = air.pallas_pub_unpack(sm)
    alg.s_pub_const = s_pub
    now = Columns(ctrl=_TAcc(ctrl), data=_TAcc(data), accum=_TAcc(acc))
    nxt = Columns(ctrl=_TAcc(ctrln), data=_TAcc(datan), accum=_TAcc(accn))
    cons = air.constraints(alg, now, nxt, globals_list, pub)
    rows = []
    for c in cons:
        if isinstance(c, (stark.VecVal, stark.ExtVal)):
            rows.append(c.v)
        else:
            rows.append(alg._full(c)[None])
    return jnp.concatenate(rows, axis=0)


def _cons_kernel(data_ref, datan_ref, ctrl_ref, ctrln_ref, acc_ref,
                 accn_ref, sm_ref, ctab_ref, out_ref, *, air, sb, sizes):
    flat = ctab_ref[0]
    slices = []
    off = 0
    for n in sizes:
        slices.append(flat[off : off + n])
        off += n
    alg = TAlg(sb, consume=iter(slices))
    alg._zero = data_ref[0][0] * _U32(0)  # input-derived zero tile
    out_ref[0] = _kernel_body(alg, air, data_ref[0], datan_ref[0],
                              ctrl_ref[0], ctrln_ref[0], acc_ref[0],
                              accn_ref[0], sm_ref[0])


def _collect_consts(air, sb, shapes, sm_shape):
    """Abstract pass recording the constant tables (np, call order)."""
    tables = []

    def probe(data, ctrl, acc, sm):
        alg = TAlg(sb, collect=tables)
        alg._zero = jnp.zeros((sb, 128), _U32)
        _kernel_body(alg, air, data, data, ctrl, ctrl, acc, acc, sm)
        return jnp.zeros(())

    dshape, cshape, ashape = shapes
    sds = lambda c: jax.ShapeDtypeStruct((c, sb, 128), _U32)
    jax.eval_shape(probe, sds(dshape), sds(cshape), sds(ashape),
                   jax.ShapeDtypeStruct(sm_shape, _U32))
    return tables


def _lanes(x_t, sb: int):
    """(C, M) -> (G, C, SB, 128); row m = g*SB*128 + s*128 + l."""
    c, m = x_t.shape
    g = m // (sb * 128)
    return x_t.reshape(c, g, sb, 128).transpose(1, 0, 2, 3)


def combined_eval(air, ctrl_evals, data_evals, accum_evals, globals_, pub,
                  alpha, interpret=None, class_masks=None):
    """Σ_k α^k C_k over the whole grid -> (M, 4); exact field values.

    Inputs are the (M, C) coset-grid evaluations from `stark.prove`.
    `class_masks`: optional list of per-constraint-item keep masks (ZK
    divisor classes) — the kernel runs once; each mask yields its own
    α-combine (non-kept items get zero weights, an exact no-op), and a
    LIST of (M, 4) arrays is returned.
    """
    from ..core import bbmm
    from ..prover.stark import INV_RATE

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = data_evals.shape[0]
    sb = int(os.environ.get("BT_CONS_TILE_SB", "8"))
    while m % (sb * 128) and sb > 1:
        sb //= 2
    assert m % (sb * 128) == 0, f"grid rows {m} not lane-tileable"

    kinds = _cons_kinds(air, ctrl_evals.shape[1], data_evals.shape[1],
                        accum_evals.shape[1], globals_, pub)
    k_rows = _rows_of(kinds)

    roll = lambda x: jnp.roll(x, -INV_RATE, axis=0)
    ops = []
    for x in (data_evals, roll(data_evals), ctrl_evals, roll(ctrl_evals),
              accum_evals, roll(accum_evals)):
        ops.append(_lanes(x.T, sb))
    small = air.pallas_pub_pack(pub, globals_)[None]  # (1, S)

    # Constant tables: collected once per (air, layout, sb) and packed
    # into one flat operand (Pallas rejects captured array constants).
    ckey = (ctrl_evals.shape[1], data_evals.shape[1],
            accum_evals.shape[1], sb, small.shape[1])
    ccache = air.__dict__.setdefault("_pallas_consts", {})
    if ckey not in ccache:
        tables = _collect_consts(
            air, sb, (data_evals.shape[1], ctrl_evals.shape[1],
                      accum_evals.shape[1]), small.shape[1:])
        sizes = tuple(int(t.size) for t in tables)
        flat = (np.concatenate(tables) if tables
                else np.zeros((1,), np.uint32))
        ccache[ckey] = (sizes, flat)
    sizes, ctab_np = ccache[ckey]
    ctab = jnp.asarray(ctab_np)[None]  # (1, S2)

    g = m // (sb * 128)
    spec = lambda c: pl.BlockSpec((1, c, sb, 128), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    sm_spec = pl.BlockSpec(small.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec(ctab.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_cons_kernel, air=air, sb=sb, sizes=sizes),
        grid=(g,),
        in_specs=[spec(data_evals.shape[1]), spec(data_evals.shape[1]),
                  spec(ctrl_evals.shape[1]), spec(ctrl_evals.shape[1]),
                  spec(accum_evals.shape[1]), spec(accum_evals.shape[1]),
                  sm_spec, ct_spec],
        out_specs=pl.BlockSpec((1, k_rows, sb, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, k_rows, sb, 128), _U32),
        interpret=interpret,
    )(*ops, small, ctab)

    out_t = out.transpose(1, 0, 2, 3).reshape(k_rows, m)  # (K, M)
    weights = _alpha_weight_rows(kinds, alpha)  # (K, 4)
    if class_masks is None:
        return bbmm.bb_weighted_sum_t(out_t, weights)
    # Expand item-level masks to kernel-row level; zero weights for
    # non-kept items (exact: zero-weight terms contribute 0 mod P).
    results = []
    for mask in class_masks:
        if mask is None:
            results.append(bbmm.bb_weighted_sum_t(out_t, weights))
            continue
        lane_keep = []
        for (kind, g), keep in zip(kinds, mask):
            rows = g if kind == "vec" else (4 if kind == "ext" else 1)
            lane_keep.extend([keep] * rows)
        sel = jnp.asarray(np.asarray(lane_keep, dtype=np.uint32))[:, None]
        results.append(bbmm.bb_weighted_sum_t(out_t, weights * sel))
    return results
