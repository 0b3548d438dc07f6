"""BN254 limb arithmetic (TPU MSM substrate) vs exact Python ints."""

import numpy as np
import jax.numpy as jnp

from boundless_tpu.groth16 import limbs as LB
from boundless_tpu.groth16.bn254 import P

rng = np.random.default_rng(9)


def rand_elems(n):
    return [int.from_bytes(rng.bytes(31), "little") % P for _ in range(n)]


def test_limb_roundtrip():
    for x in rand_elems(8) + [0, 1, P - 1]:
        assert LB.from_limbs(LB.to_limbs(x)) == x
        assert LB.from_mont(LB.to_mont(x)) == x


def test_mont_mul_batched():
    xs = rand_elems(16) + [0, 1, P - 1, P - 2]
    ys = rand_elems(16) + [P - 1, 0, P - 1, 2]
    a = jnp.asarray(np.stack([LB.to_mont(x) for x in xs]))
    b = jnp.asarray(np.stack([LB.to_mont(y) for y in ys]))
    out = LB.mont_mul(a, b)
    got = [LB.from_mont(np.asarray(out[i])) for i in range(len(xs))]
    expect = [x * y % P for x, y in zip(xs, ys)]
    assert got == expect


def test_add():
    xs = rand_elems(8) + [P - 1, P - 1]
    ys = rand_elems(8) + [1, P - 1]
    a = jnp.asarray(np.stack([LB.to_limbs(x) for x in xs]))
    b = jnp.asarray(np.stack([LB.to_limbs(y) for y in ys]))
    out = LB.add(a, b)
    got = [LB.from_limbs(np.asarray(out[i])) for i in range(len(xs))]
    assert got == [(x + y) % P for x, y in zip(xs, ys)]
