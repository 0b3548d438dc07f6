"""AIR definition interface, polymorphic over base/extension algebra.

The reference's constraint systems live in generated C++/CUDA "steps"
(`risc0-circuit-rv32im-sys`, SURVEY.md §2.4). Here an AIR is a Python class
whose `constraints` method is written against an abstract algebra `alg`, so
the same code:

  * evaluates pointwise over the whole LDE domain in the base field
    (prover hot path — fuses into one XLA program on the VPU), and
  * evaluates at the DEEP point z in the quartic extension
    (verifier / recursion circuit).

Columns are split into three committed groups, mirroring risc0's
ctrl/data/accum: `ctrl` is circuit-static (its Merkle root is the circuit's
"control ID"), `data` is the execution trace, `accum` holds grand-product /
permutation accumulators built after the mix challenges are sampled.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import field as F


class BaseAlg:
    """Algebra over base-field arrays (pointwise LDE evaluation).

    "Witness" values (column reads) are base-field arrays (M,); "ext"
    values (anything touched by mix challenges) are raw ext arrays (M, 4).
    """

    is_ext = False

    def const(self, c: int):
        return jnp.uint32(F.mont(int(c)))

    add = staticmethod(F.add)
    sub = staticmethod(F.sub)
    mul = staticmethod(F.mul)
    neg = staticmethod(F.neg)

    def one(self):
        return jnp.uint32(F.ONE)

    def zero(self):
        return jnp.uint32(0)

    # --- mixed base/ext operations ---
    def lift(self, b):
        """base -> ext."""
        return F.ext_from_base(b)

    emul = staticmethod(F.ext_mul)
    eadd = staticmethod(F.ext_add)
    esub = staticmethod(F.ext_sub)

    def escale(self, e, b):
        """ext * base."""
        return F.ext_scale(e, b)

    def read_ext(self, accessor, base_idx: int):
        """Read 4 consecutive base columns as one ext value."""
        return jnp.stack([accessor[base_idx + c] for c in range(4)], axis=-1)

    def stack(self, items):
        """Stack base constraint values for a VecVal group: (M,)xG -> (M,G)."""
        return jnp.stack([jnp.broadcast_to(x, _common_shape(items))
                          for x in items], axis=-1)

    eneg = staticmethod(F.ext_neg)

    def pubval(self, x):
        """Lift a public scalar (base u32) into this algebra's value type."""
        return x

    # --- algebra-pure helpers (so constraints never call F/NTT/jnp
    #     directly on algebra values; the recursion circuit's wire algebra
    #     implements the same surface over Prog wires) ---

    def ext_const(self, vec):
        """Canonical 4-vector -> ext constant."""
        import numpy as np

        return F.ext(np.asarray(vec, dtype=np.int64))

    def ext_powers(self, x, n: int):
        """[x^0 .. x^{n-1}] for an ext value (indexable by [i])."""
        from ..core import ntt as NTT

        return NTT.ext_powers(x, n)

    def einv(self, e):
        """Extension-field inverse (einv(0) = 0 in array algebras)."""
        return F.ext_inv(e)

    def bc(self, e, like):
        """Broadcast an ext value against another (no-op on wires)."""
        return jnp.broadcast_to(e, jnp.shape(like))

    # --- grouped (stacked-column) operations: groups are (M, G) ---
    # Graph-size discipline: a group op contributes O(1) traced ops no
    # matter how many columns it covers (compile latency ∝ graph size).

    gmul = staticmethod(F.mul)
    gadd = staticmethod(F.add)
    gsub = staticmethod(F.sub)

    def B(self, s):
        """Scalar value -> broadcastable against a group."""
        s = jnp.asarray(s)
        return s[..., None] if s.ndim else s

    def gconst(self, vec):
        """Canonical int vector -> group constant (G,)."""
        import numpy as np

        return jnp.asarray(
            (np.asarray(vec, dtype=np.int64) % F.P) * (1 << 32) % F.P
        ).astype(jnp.uint32)

    def gsum(self, x):
        return F.sum_mod(x, axis=-1)

    def gweighted(self, x, w_vec):
        """Σ_g w_g * x_g with canonical int weights."""
        return self.gsum(F.mul(x, self.gconst(w_vec)))

    def gweighted_ext(self, x, w_ext):
        """Σ_g w_ext[g] ⊗ x_g -> ext (M, 4). w_ext: (G, 4)."""
        from ..prover.stark import _weighted_col_sum

        return _weighted_col_sum(x, w_ext)

    def gslice(self, x, a, b):
        return x[..., a:b]

    def gshift_sll(self, x, s):
        g = x.shape[-1]
        return jnp.pad(x[:, : g - s], ((0, 0), (s, 0))) if s else x

    def gshift_srl(self, x, s):
        g = x.shape[-1]
        return jnp.pad(x[:, s:], ((0, 0), (0, s))) if s else x

    def gshift_sra(self, x, s):
        if not s:
            return x
        fill = jnp.broadcast_to(x[:, -1:], (x.shape[0], s))
        return jnp.concatenate([x[:, s:], fill], axis=-1)

    def gconcat(self, groups):
        return jnp.concatenate(groups, axis=-1)

    def gpub(self, vec):
        """Public base-field vector (G,) -> group-compatible value."""
        return vec


class ExtAlg:
    """Algebra at the DEEP point: every value is an ext (4,) array."""

    is_ext = True

    def const(self, c: int):
        z = jnp.zeros((4,), dtype=jnp.uint32)
        return z.at[0].set(jnp.uint32(F.mont(int(c))))

    add = staticmethod(F.ext_add)
    sub = staticmethod(F.ext_sub)
    mul = staticmethod(F.ext_mul)
    neg = staticmethod(F.ext_neg)

    def one(self):
        return self.const(1)

    def zero(self):
        return jnp.zeros((4,), dtype=jnp.uint32)

    # --- mixed ops degenerate to ext ops (witness reads are ext here) ---
    def lift(self, b):
        return b

    emul = staticmethod(F.ext_mul)
    eadd = staticmethod(F.ext_add)
    esub = staticmethod(F.ext_sub)
    escale = staticmethod(F.ext_mul)

    def read_ext(self, accessor, base_idx: int):
        """Taps of 4 base component columns -> the committed ext value."""
        import numpy as np

        acc = None
        for c in range(4):
            basis = np.zeros(4, dtype=np.int64)
            basis[c] = 1
            term = F.ext_mul(accessor[base_idx + c], F.ext(basis))
            acc = term if acc is None else F.ext_add(acc, term)
        return acc

    def stack(self, items):
        """Stack constraint values for a VecVal group: (4,)xG -> (G, 4)."""
        return jnp.stack([jnp.broadcast_to(x, (4,)) for x in items], axis=0)

    eneg = staticmethod(F.ext_neg)

    def pubval(self, x):
        """Public scalars become ext constants at the DEEP point."""
        return F.ext_from_base(x)

    # --- algebra-pure helpers (mirror BaseAlg) ---

    def ext_const(self, vec):
        import numpy as np

        return F.ext(np.asarray(vec, dtype=np.int64))

    def ext_powers(self, x, n: int):
        from ..core import ntt as NTT

        return NTT.ext_powers(x, n)

    def einv(self, e):
        return F.ext_inv(e)

    def bc(self, e, like):
        return jnp.broadcast_to(e, jnp.shape(like))

    # --- grouped operations: groups are (G, 4) ext stacks ---

    gmul = staticmethod(F.ext_mul)
    gadd = staticmethod(F.ext_add)
    gsub = staticmethod(F.ext_sub)

    def B(self, s):
        return jnp.asarray(s)[None, :]  # (1, 4)

    def gconst(self, vec):
        import numpy as np

        base = jnp.asarray(
            (np.asarray(vec, dtype=np.int64) % F.P) * (1 << 32) % F.P
        ).astype(jnp.uint32)
        return F.ext_from_base(base)  # (G, 4)

    def gsum(self, x):
        return F.sum_mod(x, axis=0)

    def gweighted(self, x, w_vec):
        import numpy as np

        w = jnp.asarray(
            (np.asarray(w_vec, dtype=np.int64) % F.P) * (1 << 32) % F.P
        ).astype(jnp.uint32)
        return self.gsum(F.mul(x, w[:, None]))

    def gweighted_ext(self, x, w_ext):
        return F.sum_mod(F.ext_mul(x, w_ext), axis=0)

    def gslice(self, x, a, b):
        return x[a:b]

    def gshift_sll(self, x, s):
        g = x.shape[0]
        return jnp.pad(x[: g - s], ((s, 0), (0, 0))) if s else x

    def gshift_srl(self, x, s):
        g = x.shape[0]
        return jnp.pad(x[s:], ((0, s), (0, 0))) if s else x

    def gshift_sra(self, x, s):
        if not s:
            return x
        fill = jnp.broadcast_to(x[-1:], (s, 4))
        return jnp.concatenate([x[s:], fill], axis=0)

    def gconcat(self, groups):
        return jnp.concatenate(groups, axis=0)

    def gpub(self, vec):
        """Public base-field vector (G,) -> (G, 4) ext group."""
        return F.ext_from_base(vec)


class DegreeAlg:
    """Symbolic degree-bound algebra: values are multiplicative degrees.

    A value is an int (or np int array for groups): the degree of the
    constraint expression in trace-polynomial units (column reads = 1,
    constants/publics/challenges = 0, mul adds, add/sub take max).
    Running `Air.constraints` under this algebra yields a per-constraint
    degree bound in microseconds (pure Python ints, no tracing) — used by
    the prover to evaluate low-degree constraint families on the smaller
    2N grid (`prover/stark.py`; deg <= 2 means deg C(T(x)) <= 2(N-1) <
    2N, so 2N coset points determine the composition term exactly).

    These are upper bounds (no cancellation modeling); the empirical
    auditor (`air/degree.py`) remains the soundness check that no bound
    is EXCEEDED."""

    is_ext = False

    def const(self, c):
        return 0

    @staticmethod
    def add(a, b):
        return np.maximum(a, b)

    sub = add
    eadd = add
    esub = add
    gadd = add
    gsub = add

    @staticmethod
    def mul(a, b):
        return np.add(a, b)

    emul = mul
    gmul = mul
    escale = mul

    @staticmethod
    def neg(a):
        return a

    eneg = neg

    def one(self):
        return 0

    def zero(self):
        return 0

    def lift(self, b):
        return b

    def read_ext(self, accessor, base_idx: int):
        return max(int(np.max(accessor[base_idx + c])) for c in range(4))

    def stack(self, items):
        return np.array([int(np.max(x)) for x in items], dtype=np.int64)

    def pubval(self, x):
        return 0

    def ext_const(self, vec):
        return 0

    def ext_powers(self, x, n: int):
        return np.full(n, int(np.max(x)), dtype=np.int64) * np.arange(n)

    def einv(self, e):
        raise NotImplementedError("einv is not polynomial")

    def bc(self, e, like):
        return e

    def B(self, s):
        return s

    def gconst(self, vec):
        return np.zeros(len(np.asarray(vec).ravel()), dtype=np.int64)

    def gsize(self, group):
        return len(np.asarray(group).ravel())

    def gsum(self, x):
        return int(np.max(x))

    def gweighted(self, x, w_vec):
        return int(np.max(x))

    def gweighted_ext(self, x, w_ext):
        x = np.atleast_1d(np.asarray(x))
        w = np.atleast_1d(np.asarray(w_ext))[: len(x)]
        return int(np.max(x + w))

    def gslice(self, x, a, b):
        return np.atleast_1d(x)[a:b]

    def gshift_sll(self, x, s):
        x = np.atleast_1d(x)
        return np.concatenate([np.zeros(s, np.int64), x[: len(x) - s]]) \
            if s else x

    def gshift_srl(self, x, s):
        x = np.atleast_1d(x)
        return np.concatenate([x[s:], np.zeros(s, np.int64)]) if s else x

    def gshift_sra(self, x, s):
        x = np.atleast_1d(x)
        if not s:
            return x
        return np.concatenate([x[s:], np.full(s, x[-1])])

    def gconcat(self, groups):
        return np.concatenate([np.atleast_1d(g) for g in groups])

    def gpub(self, vec):
        return np.zeros(np.shape(vec)[0], dtype=np.int64)


class DegreeCols:
    """Column accessor for DegreeAlg: every read has degree 1."""

    def __getitem__(self, i):
        return 1

    def block(self, idx):
        if isinstance(idx, slice):
            g = idx.stop - idx.start
        else:
            g = len(idx)
        return np.ones(g, dtype=np.int64)


def constraint_degrees(air, pub) -> list:
    """Per-constraint degree bounds, aligned with air.constraints order.

    Returns [int | np array] per constraint item (VecVal items yield
    per-lane arrays). `pub` only supplies shapes."""
    alg = DegreeAlg()
    alg.s_pub_const = 0
    acc = DegreeCols()
    cols = Columns(ctrl=acc, data=acc, accum=acc)
    cons = air.constraints(alg, cols, cols, [0, 0] * 4, pub)
    from ..prover.stark import ExtVal, VecVal

    out = []
    for c in cons:
        if isinstance(c, (ExtVal, VecVal)):
            out.append(np.max(np.atleast_1d(c.v)) if isinstance(
                c, ExtVal) else np.atleast_1d(c.v))
        else:
            out.append(int(np.max(c)))
    return out


def _common_shape(items):
    shape = ()
    for x in items:
        s = jnp.shape(x)
        if len(s) > len(shape):
            shape = s
    return shape


class Columns:
    """Row accessor handed to `Air.constraints`: cols[i] -> algebra value."""

    def __init__(self, ctrl, data, accum):
        self.ctrl = ctrl
        self.data = data
        self.accum = accum


class Air:
    """Subclass and define the class attributes + methods below.

    Attributes:
      name: circuit name (bound into the transcript).
      ctrl_cols / data_cols / accum_cols: column counts per group.
      globals_count: number of extension-field mix challenges sampled
        between the data and accum commitments.
      max_degree: max multiplicative degree of any constraint (<= 5 with
        the rate-1/4 LDE used by prover/stark.py).
    """

    name = "air"
    ctrl_cols = 0
    data_cols = 0
    accum_cols = 0
    globals_count = 0
    max_degree = 2

    def zk_rows(self, po2: int) -> int:
        """Blinded (free random) tail rows per trace; 0 = no blinding.

        Blinded AIRs must also classify constraints (trans vs point —
        see prover/stark._cons_plan) via `_zclass`."""
        return 0

    def ctrl_trace(self, n: int):
        """(n, ctrl_cols) Montgomery uint32; deterministic per circuit."""
        return jnp.zeros((n, self.ctrl_cols), dtype=jnp.uint32)

    def accum_trace(self, ctrl, data, globals_):
        """(n, accum_cols) built from the witness + mix challenges."""
        n = data.shape[0]
        assert self.accum_cols == 0
        return jnp.zeros((n, 0), dtype=jnp.uint32)

    def constraints(self, alg, now: Columns, nxt: Columns, globals_, pub):
        """Return a list of algebra values that must vanish on every row.

        `pub` is the circuit's public-values pytree (Montgomery uint32
        arrays): journal/input words, pre/post state, etc. The protocol
        binds it by mixing its Poseidon2 hash into the transcript before
        any commitment (prover/stark.py).
        """
        raise NotImplementedError
