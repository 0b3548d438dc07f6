"""Parity: pallas_eval.combined_eval (interpret mode) vs the XLA path.

The fused constraint kernel must produce bit-identical field values to
`stark.combine_constraints` over the same grid (docs/ROOFLINE.md; the
kernel is the BT_CONS_PALLAS=1 opt-in path in `stark.prove`). Interpret
mode runs the same traced kernel body on CPU, which also regression-tests
the Pallas constant discipline (no captured array constants — tables ride
the packed const operand)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boundless_tpu.core import field as F, ntt as NTT
from boundless_tpu.prover import stark
from boundless_tpu.air import pallas_eval
from boundless_tpu.air.dsl import BaseAlg, Columns
from boundless_tpu.zkvm import guests, witness, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = 6


@pytest.fixture(scope="module")
def grid():
    image = guests.loop_guest()
    ex = Executor(image, guests.words([3]), segment_po2=PO2)
    seg = ex.run().segments[0]
    w = witness.trace_segment(image, seg, PO2)
    variant = prove.air_variant_of(image)
    air = prove._AIRS[variant]
    data = F.fp(witness.data_for_variant(w.data, variant))
    ctrl, _ = prove._image_ctrl(image, PO2)
    pub = witness.to_public_values(w.pub)

    globals_ = jnp.stack([F.ext(np.arange(4) + 3), F.ext(np.arange(4) + 9)])
    alpha = F.ext(np.arange(4) + 7)
    interp = jax.jit(NTT.interpolate)
    cev = jax.jit(lambda c: NTT.coset_evaluate(c, expand=4))
    data_evals = cev(interp(data))
    ctrl_evals = cev(interp(ctrl))
    accum = air.accum_trace(ctrl, data, globals_)
    accum_evals = cev(interp(accum))
    return air, ctrl_evals, data_evals, accum_evals, globals_, pub, alpha


@pytest.mark.slow
def test_pallas_cons_parity(grid):
    air, ctrl_evals, data_evals, accum_evals, globals_, pub, alpha = grid

    @jax.jit
    def ref_path(ce, de, ae, g, p, a):
        now = Columns(ctrl=stark._ColAccessor(ce),
                      data=stark._ColAccessor(de),
                      accum=stark._ColAccessor(ae))
        roll = lambda x: jnp.roll(x, -4, axis=0)
        nxt = Columns(ctrl=stark._ColAccessor(roll(ce)),
                      data=stark._ColAccessor(roll(de)),
                      accum=stark._ColAccessor(roll(ae)))
        cons = air.constraints(BaseAlg(), now, nxt, g, p)
        return stark.combine_constraints(cons, a, at_deep=False)

    ref = np.asarray(ref_path(ctrl_evals, data_evals, accum_evals,
                              globals_, pub, alpha))
    got = np.asarray(pallas_eval.combined_eval(
        air, ctrl_evals, data_evals, accum_evals, globals_, pub, alpha,
        interpret=True))
    assert np.array_equal(ref, got)
