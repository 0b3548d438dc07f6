"""ZK blinding: blinded segment proofs are randomized and still verify.

docs/ZK_BLINDING_DESIGN.md "done" criterion: two provings of the same
witness (different blinding seeds) produce different DEEP taps and query
openings while both verify; the zk tail rows carry fresh entropy; real
rows are untouched. Reference: risc0's zk tail cycles behind
`ProverServer::prove_segment` (SURVEY.md §2.4)."""

import os

import jax
import numpy as np
import pytest

from boundless_tpu.core import field as F
from boundless_tpu.air import rv32im
from boundless_tpu.prover import stark
from boundless_tpu.zkvm import guests, prove, witness
from boundless_tpu.zkvm.executor import Executor

PO2 = 6
PS = stark.ProofSystem(queries=2, fri_min_degree=16)


@pytest.fixture(scope="module")
def seg():
    image = guests.echo()
    ex = Executor(image, guests.words([2, 7, 9]), segment_po2=PO2)
    res = ex.run()
    return image, res.segments[0]


def _witness(image, segment, seed):
    os.environ["BT_ZK_SEED"] = str(seed)
    try:
        return witness.trace_segment(image, segment, PO2)
    finally:
        del os.environ["BT_ZK_SEED"]


def test_zk_rows_randomized_real_rows_stable(seg):
    image, segment = seg
    w1 = _witness(image, segment, 1)
    w2 = _witness(image, segment, 2)
    zk = rv32im.zk_rows(PO2)
    assert zk > 0
    assert not np.array_equal(w1.data[-zk:], w2.data[-zk:])
    assert np.array_equal(w1.data[:-zk], w2.data[:-zk])


@pytest.mark.slow
def test_blinded_proofs_differ_and_verify(seg):
    image, segment = seg
    w1 = _witness(image, segment, 1)
    w2 = _witness(image, segment, 2)
    variant = prove.air_variant_of(image)
    air = prove._AIRS[variant]
    ctrl, image_id = prove._image_ctrl(image, PO2, PS)
    pub = witness.to_public_values(w1.pub)
    fn = jax.jit(lambda d, p, c: stark.prove(air, d, p, PO2, PS, c))
    p1 = fn(F.fp(witness.data_for_variant(w1.data, variant)), pub, ctrl)
    p2 = fn(F.fp(witness.data_for_variant(w2.data, variant)), pub, ctrl)
    croot = F.fp(np.asarray(image_id, dtype=np.int64))
    vfn = jax.jit(lambda pr, p, c: stark.verify(air, pr, p, PO2, c, PS))
    assert bool(vfn(p1, pub, croot))
    assert bool(vfn(p2, pub, croot))
    # randomization: same witness, different revealed data everywhere
    assert not np.array_equal(np.asarray(p1.taps_data),
                              np.asarray(p2.taps_data))
    assert not np.array_equal(np.asarray(p1.open_data.rows),
                              np.asarray(p2.open_data.rows))
    assert not np.array_equal(np.asarray(p1.open_accum.rows),
                              np.asarray(p2.open_accum.rows))
    assert not np.array_equal(np.asarray(p1.open_check.rows),
                              np.asarray(p2.open_check.rows))
    # distinct commitments, same public claim
    assert not np.array_equal(np.asarray(p1.data_root),
                              np.asarray(p2.data_root))
