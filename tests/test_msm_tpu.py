"""TPU MSM (limb Jacobian ops + scan-over-bits) vs host-exact Pippenger."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boundless_tpu.groth16 import limbs as LB
from boundless_tpu.groth16 import msm as host_msm
from boundless_tpu.groth16 import msm_tpu
from boundless_tpu.groth16.bn254 import G1, R

rng = random.Random(11)


def test_ec_ops_match_host():
    g = G1.generator()
    a = g.mul(123457)
    b = g.mul(998877)
    pa = msm_tpu.points_to_device([a, b, a, G1.infinity()])
    ec_double = jax.jit(msm_tpu.ec_double)
    ec_add = jax.jit(msm_tpu.ec_add)
    # double
    d = ec_double(pa)
    assert msm_tpu.point_from_device(d[0]).eq(a.double())
    assert msm_tpu.point_from_device(d[3]).is_infinity()
    # add distinct / equal / with infinity
    s = ec_add(pa, msm_tpu.points_to_device([b, a, a, a]))
    assert msm_tpu.point_from_device(s[0]).eq(a.add(b))
    assert msm_tpu.point_from_device(s[2]).eq(a.double())
    assert msm_tpu.point_from_device(s[3]).eq(a)
    # p + (-p) = inf
    neg = msm_tpu.points_to_device([a.neg()])
    z = ec_add(msm_tpu.points_to_device([a]), neg)
    assert msm_tpu.point_from_device(z[0]).is_infinity()


@pytest.mark.slow
def test_msm_tpu_matches_pippenger():
    g = G1.generator()
    n = 8
    points = [g.mul(rng.randrange(1, 10**9)) for _ in range(n)]
    scalars = [rng.randrange(0, R) for _ in range(n)]
    expect = host_msm.msm_pippenger(points, scalars)
    got = msm_tpu.msm(points, scalars)
    assert got.eq(expect)
    # edge: zeros and infinity points
    got2 = msm_tpu.msm([points[0], G1.infinity()], [0, 12345])
    assert got2.is_infinity()


@pytest.mark.slow
def test_device_pippenger_matches_host():
    """The bucketed device schedule (segmented-scan Pippenger) against
    the host-exact reference, incl. zero scalars, duplicate digits and
    infinity inputs."""
    g = G1.generator()
    n = 70
    points = [g.mul(rng.randrange(1, 10**6)) for _ in range(n)]
    scalars = [rng.randrange(0, R) for _ in range(n)]
    scalars[3] = 0
    scalars[11] = 1
    scalars[12] = scalars[13] = 5  # duplicate small digits
    points[20] = G1.infinity()
    expect = host_msm.msm_pippenger(points, scalars)
    got = msm_tpu.msm_pippenger(points, scalars)
    assert got.eq(expect)
