"""The poseidon254 hash suite: host Poseidon-BN254 + suite-parameterized
STARK prove/verify (the substrate of the Groth16-facing identity_p254
final-shrink proof; reference `blake3_groth16/src/prove.rs:33-62`)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from boundless_tpu.core import field as F
from boundless_tpu.core import poseidon_bn254 as P254
from boundless_tpu.prover import stark

rng = np.random.default_rng(7)


def test_permutation_mds_invertible_and_deterministic():
    rcs, mds = P254.constants()
    # MDS invertible over Fr (det != 0 via Gaussian elimination)
    m = [[int(x) for x in row] for row in mds]
    det = 1
    R = P254.FR
    for c in range(3):
        piv = next(r for r in range(c, 3) if m[r][c] % R)
        if piv != c:
            m[c], m[piv] = m[piv], m[c]
            det = -det
        det = det * m[c][c] % R
        inv = pow(m[c][c], R - 2, R)
        for r in range(c + 1, 3):
            f = m[r][c] * inv % R
            for cc in range(3):
                m[r][cc] = (m[r][cc] - f * m[c][cc]) % R
    assert det % R != 0
    a = P254.permute([1, 2, 3])
    assert a == P254.permute([1, 2, 3])
    assert a != P254.permute([1, 2, 4])


def test_pack_and_digest_roundtrip():
    elems = [int(x) for x in rng.integers(0, F.P, size=19)]
    felts = P254.felts_of_bb(elems)
    assert len(felts) == 3
    # unpack check
    back = []
    for f in felts:
        for i in range(P254.PACK):
            back.append((f >> (31 * i)) & ((1 << 31) - 1))
    assert back[: len(elems)] == elems
    d = P254.hash_bb(elems)
    w = P254.digest_words(d)
    assert P254.felt_of_words(w) == d


def test_hash_rows_np_matches_scalar():
    m = rng.integers(0, F.P, size=(4, 5)).astype(np.uint32)
    out = P254.hash_rows_np(m)
    for i in range(4):
        assert tuple(out[i]) == P254.digest_words(
            P254.hash_bb([int(x) for x in m[i]]))


def _toy_air():
    from boundless_tpu.air import dsl

    class ProdAir(dsl.Air):
        """next = prev * prev with first row pinned to pub."""

        name = "prod254"
        ctrl_cols = 1  # is_first flag
        data_cols = 1
        accum_cols = 0
        globals_count = 0
        max_degree = 3

        def ctrl_trace(self, n):
            ct = np.zeros((n, 1), dtype=np.int64)
            ct[0, 0] = 1
            return F.fp(ct)

        def constraints(self, alg, now, nxt, globals_, pub):
            x = now.data[0]
            xn = nxt.data[0]
            is_first = now.ctrl[0]
            # transition everywhere except wrap-around: gate on the NEXT
            # row's is_first flag
            nf = nxt.ctrl[0]
            c = [alg.mul(alg.sub(alg.one(), nf),
                         alg.sub(xn, alg.mul(x, x)))]
            c.append(alg.mul(is_first, alg.sub(x, alg.pubval(pub[0]))))
            return c

    return ProdAir()


@pytest.fixture(scope="module")
def toy_proof():
    air = _toy_air()
    n = 32
    x0 = 3
    vals = [x0]
    for _ in range(n - 1):
        vals.append(vals[-1] * vals[-1] % F.P)
    data = F.fp(np.asarray(vals, dtype=np.int64)[:, None])
    pub = F.fp(np.asarray([x0], dtype=np.int64))
    ps = stark.ProofSystem(queries=4, fri_min_degree=8, commit_expand=2,
                           hash="poseidon254")
    proof = stark.prove(air, data, pub, 5, ps, None)
    return air, proof, pub, ps


def test_p254_suite_prove_verify_and_tamper(toy_proof):
    air, proof, pub, ps = toy_proof
    root = stark.control_root_of(air, 5, ps=ps)
    assert bool(stark.verify(air, proof, pub, 5, root, ps))
    # tampered public input rejected
    bad_pub = F.fp(np.asarray([4], dtype=np.int64))
    assert not bool(stark.verify(air, proof, bad_pub, 5, root, ps))
    # tampered tap rejected
    taps = np.asarray(proof.taps_data).copy()
    taps[0, 0, 0] ^= 1
    bad = dataclasses.replace(proof, taps_data=jnp.asarray(taps)) \
        if dataclasses.is_dataclass(proof) else proof._replace(
            taps_data=jnp.asarray(taps))
    assert not bool(stark.verify(air, bad, pub, 5, root, ps))
    # a poseidon2-suite verifier must NOT accept a p254 proof
    ps_bb = dataclasses.replace(ps, hash="poseidon2")
    root_bb = stark.control_root_of(air, 5, ps=ps_bb)
    assert not bool(stark.verify(air, proof, pub, 5, root_bb, ps_bb))
