"""Debug utilities: check a witness satisfies an AIR on the trace domain.

Evaluating constraints directly on H_N (rows with cyclic next-row) is
orders of magnitude cheaper than a full prove — the e2e development loop
for new AIR features, and the first thing to run when a proof fails ALI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..prover.stark import ExtVal, VecVal
from . import dsl


_EVAL_CACHE: dict = {}


def check_constraints(air, ctrl, data, pub, globals_seed: int = 7):
    """Returns (ok, failures): failures = list of (constraint_index, count).

    ctrl/data: Montgomery (N, C) arrays. Globals are pseudorandomly drawn
    (any values must satisfy a correct witness identically).
    """
    rng = np.random.default_rng(globals_seed)
    globals_ = F.ext(rng.integers(1, F.P, size=(max(air.globals_count, 1), 4),
                                  dtype=np.int64))[: air.globals_count]

    key = (id(air), type(air).__name__)
    if key in _EVAL_CACHE:
        counts = [int(x) for x in _EVAL_CACHE[key](ctrl, data, globals_, pub)]
        failures = [(i, n) for i, n in enumerate(counts) if n]
        return (not failures), failures

    @jax.jit
    def _eval(ctrl, data, globals_, pub):
        accum = air.accum_trace(ctrl, data, globals_) \
            if air.accum_cols else jnp.zeros((data.shape[0], 0), jnp.uint32)

        from ..prover.stark import _ColAccessor as acc_of

        n = data.shape[0]
        po2 = int(n).bit_length() - 1
        zk = air.zk_rows(po2) if hasattr(air, "zk_rows") else 0
        now = dsl.Columns(acc_of(ctrl), acc_of(data), acc_of(accum))
        nxt = dsl.Columns(acc_of(jnp.roll(ctrl, -1, axis=0)),
                          acc_of(jnp.roll(data, -1, axis=0)),
                          acc_of(jnp.roll(accum, -1, axis=0)))
        cons = air.constraints(dsl.BaseAlg(), now, nxt, globals_, pub)
        zclass = getattr(air, "_zclass", None) if zk else None
        out = []
        for i, c in enumerate(cons):
            if isinstance(c, (ExtVal, VecVal)):
                c = c.v
            vals = F.from_mont(c)
            if zclass is not None and not zclass[i]:
                # point-class family: binds REAL rows only (the blinded
                # zk tail is free — prover/stark._cons_plan)
                vals = vals[: n - zk]
            out.append(jnp.count_nonzero(vals))
        return out

    _EVAL_CACHE[key] = _eval
    counts = [int(x) for x in _eval(ctrl, data, globals_, pub)]
    failures = [(i, n) for i, n in enumerate(counts) if n]
    return (not failures), failures
