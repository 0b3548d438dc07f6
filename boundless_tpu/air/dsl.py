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
