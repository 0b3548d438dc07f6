"""Four-step Pallas NTT: exact parity with the Stockham path.

The dispatch (BT_NTT_PALLAS) may never change field values — both paths
compute the same exact Baby Bear DFT, so outputs must be bit-identical
(ntt_pallas.py module doc). Interpret mode on CPU."""

import numpy as np
import pytest

from boundless_tpu.core import field as F
from boundless_tpu.core import ntt as NTT
from boundless_tpu.core import ntt_pallas as NP

rng = np.random.default_rng(42)


def _rand(n, c=None):
    shape = (n,) if c is None else (n, c)
    return F.fp(rng.integers(0, F.P, size=shape, dtype=np.int64))


@pytest.mark.parametrize("n,c", [(1 << 12, 3), (1 << 13, 2)])
def test_four_step_matches_stockham(n, c):
    x = _rand(n, c)
    assert np.array_equal(np.asarray(NP.ntt_four_step(x, True)),
                          np.asarray(NTT.ntt(x, True)))
    assert np.array_equal(np.asarray(NP.ntt_four_step(x, False)),
                          np.asarray(NTT.ntt(x, False)))


def test_four_step_one_dim_and_roundtrip():
    x = _rand(1 << 12)
    y = NP.ntt_four_step(x, True)
    assert np.array_equal(np.asarray(y), np.asarray(NTT.ntt(x, True)))
    # inverse through intt's scaling path must round-trip
    n_inv = F.fp(pow(1 << 12, F.P - 2, F.P))
    back = F.mul(NP.ntt_four_step(y, False), n_inv)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_dispatch_threshold(monkeypatch):
    monkeypatch.setenv("BT_NTT_PALLAS", "1")
    x = _rand(1 << 12, 2)
    monkeypatch.setenv("BT_NTT_PALLAS", "0")
    ref = np.asarray(NTT.ntt(x))
    monkeypatch.setenv("BT_NTT_PALLAS", "1")
    assert np.array_equal(np.asarray(NTT.ntt(x)), ref)
