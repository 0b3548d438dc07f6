"""BN254 curve + MSM tests (host-exact layer under the TPU MSM)."""

import random

from boundless_tpu.groth16.bn254 import G1, P, R
from boundless_tpu.groth16 import msm

rng = random.Random(5)


def test_generator_on_curve_and_order():
    g = G1.generator()
    x, y = g.to_affine()
    assert (y * y - x * x * x - 3) % P == 0
    assert g.mul(R).is_infinity()
    assert not g.mul(R - 1).is_infinity()


def test_group_law():
    g = G1.generator()
    a = g.mul(123456789)
    b = g.mul(987654321)
    assert a.add(b).eq(g.mul(123456789 + 987654321))
    assert a.add(a).eq(a.double())
    assert a.add(a.neg()).is_infinity()
    assert a.add(G1.infinity()).eq(a)
    # commutativity / associativity spot checks
    c = g.mul(31337)
    assert a.add(b).add(c).eq(a.add(b.add(c)))
    assert a.add(b).eq(b.add(a))


def test_affine_roundtrip():
    g = G1.generator().mul(42)
    assert G1.from_affine(g.to_affine()).eq(g)


def test_msm_pippenger_matches_naive():
    g = G1.generator()
    points = [g.mul(rng.randrange(1, 10**9)) for _ in range(17)]
    scalars = [rng.randrange(0, R) for _ in range(17)]
    expect = msm.msm_naive(points, scalars)
    got = msm.msm_pippenger(points, scalars, window_bits=8)
    assert got.eq(expect)
    got4 = msm.msm_pippenger(points, scalars, window_bits=4)
    assert got4.eq(expect)


def test_msm_edge_cases():
    g = G1.generator()
    assert msm.msm_pippenger([], []).is_infinity()
    assert msm.msm_pippenger([g], [0]).is_infinity()
    assert msm.msm_pippenger([g, g], [1, R - 1]).is_infinity()
