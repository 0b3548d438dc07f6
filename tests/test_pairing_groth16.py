"""BN254 pairing (Fp12 tower, reduced Tate) + full Groth16 prove/verify."""

import random

from boundless_tpu.groth16 import pairing as PR
from boundless_tpu.groth16 import protocol as GP
from boundless_tpu.groth16.bn254 import G1, R

rng = random.Random(11)


def test_tower_field_axioms():
    def rnd2():
        return (rng.randrange(PR.P), rng.randrange(PR.P))

    a, b, c = rnd2(), rnd2(), rnd2()
    assert PR.f2_mul(a, PR.f2_add(b, c)) == PR.f2_add(
        PR.f2_mul(a, b), PR.f2_mul(a, c))
    assert PR.f2_mul(a, PR.f2_inv(a)) == PR.F2_ONE

    a6 = (rnd2(), rnd2(), rnd2())
    assert PR.f6_mul(a6, PR.f6_inv(a6)) == PR.F6_ONE
    a12 = ((rnd2(), rnd2(), rnd2()), (rnd2(), rnd2(), rnd2()))
    assert PR.f12_mul(a12, PR.f12_inv(a12)) == PR.F12_ONE
    # associativity spot check at the top of the tower
    b12 = ((rnd2(), rnd2(), rnd2()), (rnd2(), rnd2(), rnd2()))
    c12 = ((rnd2(), rnd2(), rnd2()), (rnd2(), rnd2(), rnd2()))
    assert PR.f12_mul(PR.f12_mul(a12, b12), c12) == PR.f12_mul(
        a12, PR.f12_mul(b12, c12))


def test_g2_group_law():
    g2 = PR.g2_generator()
    assert PR.g2_is_on_curve(g2)
    a = PR.g2_mul(g2, 123456789)
    b = PR.g2_mul(g2, 987654321)
    assert PR.g2_add(a, b) == PR.g2_mul(g2, 123456789 + 987654321)
    assert PR.g2_add(a, PR.g2_neg(a)) is None
    assert PR.g2_mul(g2, R) is None  # order r on the twist subgroup


def test_pairing_bilinear_nondegenerate():
    g1 = G1.generator()
    g2 = PR.g2_generator()
    e = PR.pairing(g1, g2)
    assert e != PR.F12_ONE
    assert PR.f12_pow(e, R) == PR.F12_ONE
    a, b = 6, 7
    assert PR.pairing(g1.mul(a), PR.g2_mul(g2, b)) == PR.f12_pow(e, a * b)
    p1, p2 = g1.mul(11), g1.mul(23)
    assert PR.pairing(p1.add(p2), g2) == PR.f12_mul(
        PR.pairing(p1, g2), PR.pairing(p2, g2))
    assert PR.pairing(G1.infinity(), g2) == PR.F12_ONE


def test_groth16_end_to_end():
    r1cs = GP.mul_circuit()
    x, y = 1234567, 7654321
    z = x * y % R
    s = [1, z, x, y, x * y % R]
    assert r1cs.is_satisfied(s)
    pk, vk = GP.setup(r1cs)
    proof = GP.prove(r1cs, pk, s)
    assert GP.verify(vk, proof, [z])
    # wrong public input rejected
    assert not GP.verify(vk, proof, [(z + 1) % R])
    # tampered proof rejected
    assert not GP.verify(vk, GP.Proof(a=proof.a.mul(2), b=proof.b,
                                      c=proof.c), [z])
    assert not GP.verify(vk, GP.Proof(a=proof.a, b=proof.b,
                                      c=proof.c.add(G1.generator())), [z])
    # proofs are randomized (zero-knowledge blinding) yet both verify
    p2 = GP.prove(r1cs, pk, s)
    assert not (p2.a.eq(proof.a) and p2.c.eq(proof.c))
    assert GP.verify(vk, p2, [z])


def test_groth16_unsatisfied_witness_rejected():
    import pytest

    r1cs = GP.mul_circuit()
    bad = [1, 99, 2, 3, 7]  # 2*3 != 7
    assert not r1cs.is_satisfied(bad)
    pk, _ = GP.setup(r1cs)
    with pytest.raises(AssertionError, match="does not satisfy"):
        GP.prove(r1cs, pk, bad)
