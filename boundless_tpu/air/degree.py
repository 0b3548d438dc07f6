"""Empirical constraint-degree auditor.

Why this exists: the prover's composition split assumes every constraint
has multiplicative degree <= CHECK_SPLIT + 1 (deg C(x) <= 5(N-1) with the
rate-1/4 LDE).  A constraint that silently exceeds the budget *aliases* on
the LDE — pointwise trace-domain witness checks still pass, the prover
still produces a proof, but verification fails (or worse, soundness bends)
only on traces that exercise the over-degree term.  This bit us once: an
M-extension regating pushed the per-bit logic constraint to degree 6 and
only REMU-bearing segments failed (docs/ROUND1.md "war story").

The reference audits degrees structurally in its circuit compiler
(risc0 circuit codegen tracks degree per expression, e.g.
risc0/zirgen poly_ext steps).  Our constraints are plain JAX code over the
algebra in dsl.py, and some helpers call field ops directly, so instead of
a symbolic algebra we measure the *actual* polynomial degree:

  1. fill data/accum/ctrl with uniformly random field elements (the generic
     formula degree is realized with overwhelming probability — any
     cancellation on random inputs would require the formula itself to be
     lower-degree),
  2. evaluate the constraint set pointwise on an oversampled coset LDE
     g*H_{E*N} (E = `expand`, default 16, so degrees up to 16N-1 are
     measurable without aliasing),
  3. INTT back to coefficients — exact field arithmetic, no numerical
     noise — and read off the top nonzero coefficient per constraint.

This is the same pointwise evaluation path the prover uses, so anything
the prover would commit is exactly what gets audited.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..core import ntt as NTT
from .dsl import Air, BaseAlg, Columns


@dataclasses.dataclass(frozen=True)
class ConstraintDegree:
    """Measured degree of one constraint lane."""

    index: int  # position in the list returned by air.constraints()
    lane: int  # lane within a VecVal group / ext component (0 for scalars)
    kind: str  # "base" | "ext" | "vec"
    degree: int  # actual deg C(x) on a size-N trace (N = 1 << po2)

    def mult_degree(self, po2: int) -> float:
        """Degree in trace-polynomial units: deg C / (N - 1)."""
        n = 1 << po2
        return self.degree / (n - 1) if self.degree else 0.0


def _rand_field(rng: np.random.Generator, shape) -> jnp.ndarray:
    return jnp.asarray(rng.integers(0, F.P, size=shape, dtype=np.uint32))


def _flatten_constraints(cons):
    """Constraint list -> ((M, K) base column block, per-column labels)."""
    from ..prover.stark import ExtVal, VecVal

    cols = []
    labels = []
    for idx, c in enumerate(cons):
        if isinstance(c, VecVal):
            v = c.v  # (M, G)
            for g in range(v.shape[-1]):
                labels.append((idx, g, "vec"))
            cols.append(v)
        elif isinstance(c, ExtVal):
            v = c.v  # (M, 4): ext degree = max component degree
            for g in range(v.shape[-1]):
                labels.append((idx, g, "ext"))
            cols.append(v)
        else:
            v = jnp.asarray(c)
            if v.ndim == 0:
                v = v[None]
            cols.append(v[:, None])
            labels.append((idx, 0, "base"))
    m = max(x.shape[0] for x in cols)
    cols = [jnp.broadcast_to(x, (m,) + x.shape[1:]) for x in cols]
    return jnp.concatenate(cols, axis=1), labels


def audit_degrees(air: Air, pub, po2: int = 5, expand: int = 16,
                  seed: int = 0) -> list[ConstraintDegree]:
    """Measure the actual polynomial degree of every constraint of `air`.

    `pub` must have the AIR's public-values shape (values are irrelevant —
    they enter constraints as degree-0 constants; random is fine).
    Returns one ConstraintDegree per scalar constraint lane.  Degrees up to
    expand*N - 1 are measured exactly; anything at the ceiling means
    "at least this" (raise `expand`).
    """
    n = 1 << po2
    rng = np.random.default_rng(seed)
    traces = {
        "ctrl": _rand_field(rng, (n, air.ctrl_cols)) if air.ctrl_cols else None,
        "data": _rand_field(rng, (n, air.data_cols)),
        "accum": _rand_field(rng, (n, air.accum_cols)) if air.accum_cols else None,
    }
    globals_ = (_rand_field(rng, (air.globals_count, 4))
                if air.globals_count else jnp.zeros((0, 4), jnp.uint32))

    labels = []  # captured during tracing (jax always traces; only XLA
    # compilation is cached, so this fills on every call)

    @jax.jit
    def _coeffs(tr, globals_, pub):
        from ..prover.stark import _ColAccessor

        def lde(t):
            if t is None:
                return None
            return NTT.coset_evaluate(NTT.interpolate(t), expand=expand)

        evals = {k: lde(v) for k, v in tr.items()}
        # "next row" on the expanded grid: the trace step w_N equals
        # w_{E*N}^E, i.e. a roll by `expand` rows (stark.py rolls by
        # INV_RATE on the rate-1/4 grid for the same reason).
        now = Columns(**{k: _ColAccessor(v) for k, v in evals.items()})
        nxt = Columns(**{
            k: _ColAccessor(jnp.roll(v, -expand, axis=0) if v is not None
                            else None)
            for k, v in evals.items()})
        cons = air.constraints(BaseAlg(), now, nxt, globals_, pub)
        flat, labs = _flatten_constraints(cons)  # (E*N, K)
        labels.clear()
        labels.extend(labs)
        # C(g*y) on H_{E*N} -> coefficients of C(g*y); same degree as C.
        return NTT.intt(flat)

    coeffs = _coeffs(traces, globals_, pub)
    coeffs = np.asarray(coeffs)  # (E*N, K)
    out = []
    for k, (idx, lane, kind) in enumerate(labels):
        nz = np.nonzero(coeffs[:, k])[0]
        deg = int(nz[-1]) if nz.size else 0
        out.append(ConstraintDegree(index=idx, lane=lane, kind=kind,
                                    degree=deg))
    return out


def degree_budget(po2: int, check_split: int = 4) -> int:
    """Max deg C(x) the composition split can represent soundly.

    Q(x) = C(x) / (x^N - 1) is committed as CHECK_SPLIT polynomials of
    degree < N via Q(x) = sum_i x^i Q_i(x^4), so deg Q <= CHECK_SPLIT*N - 1
    and deg C <= (CHECK_SPLIT + 1)*N - 1.
    """
    n = 1 << po2
    return (check_split + 1) * n - 1


def assert_degrees(air: Air, pub, po2: int = 5, expand: int = 16,
                   seed: int = 0) -> list[ConstraintDegree]:
    """Audit + raise if any constraint exceeds the declared or hard budget.

    Hard failure: deg C > degree_budget (the split cannot represent Q —
    the proof system is unsound for this AIR).
    Also fails if any constraint exceeds air.max_degree * (N - 1): the
    declared degree is a lie even if the split still happens to fit.
    """
    degs = audit_degrees(air, pub, po2=po2, expand=expand, seed=seed)
    n = 1 << po2
    declared = air.max_degree * (n - 1)
    hard = degree_budget(po2)
    # Blinded AIRs (zk tail rows): point-class composition terms gain
    # deg Z from the P_Z factor (prover/stark._cons_plan), so their
    # measured deg C must satisfy deg C - N + Z <= hard - N, i.e. the
    # point-class budget is `hard - zk`. Class list aligns with the
    # audit's constraint indices (air._zclass from the audit's own
    # constraints() run).
    zk = air.zk_rows(po2) if hasattr(air, "zk_rows") else 0
    zclass = getattr(air, "_zclass", None) if zk else None
    def _hard(d):
        if zclass is not None and not zclass[d.index]:
            return hard - zk
        return hard
    bad = [d for d in degs if d.degree > declared or d.degree > _hard(d)]
    if bad:
        lines = [
            f"constraint[{d.index}] lane {d.lane} ({d.kind}): deg {d.degree}"
            f" = {d.degree / (n - 1):.2f}x(N-1)"
            f" > declared {declared} (max_degree={air.max_degree})"
            + (f", EXCEEDS split budget {hard}" if d.degree > hard else "")
            for d in bad
        ]
        raise AssertionError(
            f"{air.name}: {len(bad)} constraint(s) over degree budget"
            f" (N={n}):\n" + "\n".join(lines))
    return degs
