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
