"""Constraint-degree auditor tests.

The degree-6 war story (docs/ROUND1.md): an over-degree constraint passes
every pointwise trace-domain check but aliases on the rate-1/4 LDE.  The
auditor must catch the formula degree regardless of witness validity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from boundless_tpu.air import degree as DA
from boundless_tpu.air.dsl import Air
from boundless_tpu.core import field as F


class _PowAir(Air):
    """One constraint: c0^k (+ a nxt-row term to exercise the shifted view)."""

    name = "pow"
    data_cols = 2
    max_degree = 5

    def __init__(self, k: int):
        self.k = k

    def constraints(self, alg, now, nxt, globals_, pub):
        x = now.data[0]
        acc = x
        for _ in range(self.k - 1):
            acc = alg.mul(acc, x)
        # degree-2 cross term with the next row: within any budget >= 2
        trans = alg.mul(now.data[1], nxt.data[1])
        return [acc, trans]


def test_exact_degree_measurement():
    po2 = 4
    n = 1 << po2
    degs = DA.audit_degrees(_PowAir(5), pub=(), po2=po2, expand=16)
    by_idx = {d.index: d.degree for d in degs}
    assert by_idx[0] == 5 * (n - 1)
    assert by_idx[1] == 2 * (n - 1)


def test_within_budget_passes():
    DA.assert_degrees(_PowAir(5), pub=(), po2=4)


def test_degree_overflow_flagged():
    # max_degree says 5 but the formula is degree 6 — the exact bug class
    # that pointwise witness checks cannot see.
    with pytest.raises(AssertionError, match="over degree budget"):
        DA.assert_degrees(_PowAir(6), pub=(), po2=4)


def test_split_budget_overflow_flagged():
    # Degree 9 also blows the hard (CHECK_SPLIT+1)*N - 1 split budget.
    air = _PowAir(9)
    air.max_degree = 9  # declared honestly -> only the hard budget trips
    with pytest.raises(AssertionError, match="EXCEEDS split budget"):
        DA.assert_degrees(air, pub=(), po2=4)


class _VecAir(Air):
    """VecVal + ExtVal lanes are audited per-lane."""

    name = "vec"
    data_cols = 8
    globals_count = 1
    max_degree = 3

    def constraints(self, alg, now, nxt, globals_, pub):
        g = now.data.block(slice(0, 8))  # (M, 8)
        cube = alg.gmul(alg.gmul(g, g), g)
        from boundless_tpu.prover.stark import ExtVal, VecVal

        e = F.ext_scale(jnp.broadcast_to(globals_[0],
                                         g.shape[:1] + (4,)), now.data[0])
        return [VecVal(cube), ExtVal(e)]


def test_vec_and_ext_lanes():
    po2 = 4
    n = 1 << po2
    degs = DA.audit_degrees(_VecAir(), pub=(), po2=po2)
    vec = [d for d in degs if d.kind == "vec"]
    ext = [d for d in degs if d.kind == "ext"]
    assert len(vec) == 8 and all(d.degree == 3 * (n - 1) for d in vec)
    assert len(ext) == 4 and all(d.degree == n - 1 for d in ext)
    DA.assert_degrees(_VecAir(), pub=(), po2=po2)


@pytest.mark.slow
def test_rv32im_within_budget():
    """The full rv32im AIR stays within its declared degree-5 budget.

    This is the automated version of the war-story audit: had it existed,
    the is_logic_col regression (degree 6 via selector-product regating)
    would have failed here instead of in a REMU prove/verify e2e.
    """
    from boundless_tpu.air import rv32im as R

    rng = np.random.default_rng(7)

    def rf(shape):
        return jnp.asarray(rng.integers(0, F.P, size=shape, dtype=np.uint32))

    pub = R.PublicValues(
        pre_pc=rf(()), post_pc=rf(()), pre_regs=rf((64,)),
        post_regs=rf((64,)), halted=rf(()), pre_seqs=rf((4,)),
        post_seqs=rf((4,)), io=rf((R.IO_MAX, 5)),
        cpio=rf((R.CP_IO, 4)), mem=rf((R.MEM_PAGES, R.MEM_PAGE_ELEMS)))
    degs = DA.assert_degrees(R.Rv32imAir(), pub, po2=5, expand=16)
    n = 1 << 5
    worst = max(d.degree for d in degs)
    # the AIR genuinely uses its budget: at least one degree-5 family
    assert worst == 5 * (n - 1)
