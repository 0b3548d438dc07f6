"""Parity: pure-numpy host Poseidon2 == jitted core.poseidon2."""

import numpy as np

from boundless_tpu.core import field as F
from boundless_tpu.core import poseidon2 as P2
from boundless_tpu.core import poseidon2_np as NP


def _canon(x):
    return np.asarray(F.from_mont(x), dtype=np.int64)


def test_permute_parity():
    rng = np.random.default_rng(0)
    states = rng.integers(0, F.P, size=(5, 24), dtype=np.int64)
    ours = NP.permute_np(states)
    ref = _canon(P2.permute(F.fp(states)))
    assert np.array_equal(ours, ref)


def test_hash_elems_parity_lengths():
    rng = np.random.default_rng(1)
    for length in (1, 4, 12, 16, 17, 41, 164):
        vals = rng.integers(0, F.P, size=length, dtype=np.int64)
        ours = NP.hash_elems_np(vals)
        ref = tuple(int(x) for x in _canon(P2.hash_elems(F.fp(vals))))
        assert ours == ref, length


def test_hash_pair_parity_and_batch():
    rng = np.random.default_rng(2)
    l = rng.integers(0, F.P, size=(7, 8), dtype=np.int64)
    r = rng.integers(0, F.P, size=(7, 8), dtype=np.int64)
    batch = NP.hash_pairs_np(l, r)
    for i in range(7):
        one = NP.hash_pair_np(l[i], r[i])
        ref = tuple(int(x) for x in _canon(P2.hash_pair(F.fp(l[i]),
                                                        F.fp(r[i]))))
        assert tuple(batch[i]) == one == ref


def test_hash_many_parity():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, F.P, size=(6, 128), dtype=np.int64)
    batch = NP.hash_many_np(rows)
    for i in range(6):
        assert tuple(batch[i]) == NP.hash_elems_np(rows[i])
