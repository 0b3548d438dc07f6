"""Poseidon2 / Merkle / transcript tests."""

import numpy as np
import jax
import jax.numpy as jnp

from boundless_tpu.core import field as F
from boundless_tpu.core import poseidon2 as P2
from boundless_tpu.core import merkle, transcript

rng = np.random.default_rng(2)


def test_permute_is_permutation_and_deterministic():
    s = F.fp(rng.integers(0, F.P, size=(3, 24), dtype=np.int64))
    out1 = P2.permute(s)
    out2 = P2.permute(s)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # distinct inputs -> distinct outputs
    assert not np.array_equal(np.asarray(out1[0]), np.asarray(out1[1]))
    # not identity
    assert not np.array_equal(np.asarray(out1), np.asarray(s))


def test_permute_batch_consistency():
    s = F.fp(rng.integers(0, F.P, size=(5, 24), dtype=np.int64))
    batched = np.asarray(P2.permute(s))
    for i in range(5):
        single = np.asarray(P2.permute(s[i]))
        np.testing.assert_array_equal(batched[i], single)


def test_hash_elems_padding_distinct():
    a = F.fp(rng.integers(0, F.P, size=(7,), dtype=np.int64))
    d1 = np.asarray(P2.hash_elems(a))
    d2 = np.asarray(P2.hash_elems(jnp.concatenate([a, F.zeros((1,))])))
    assert d1.shape == (8,)
    # zero padding means these collide by construction for trailing zeros;
    # callers always hash fixed-length rows. Just check determinism + batch.
    m = F.fp(rng.integers(0, F.P, size=(4, 33), dtype=np.int64))
    dm = np.asarray(P2.hash_elems(m))
    assert dm.shape == (4, 8)
    for i in range(4):
        np.testing.assert_array_equal(dm[i], np.asarray(P2.hash_elems(m[i])))


def test_hash_multi_block():
    m = F.fp(rng.integers(0, F.P, size=(40,), dtype=np.int64))
    d = np.asarray(P2.hash_elems(m))
    assert d.shape == (8,)
    m2 = np.asarray(F.from_mont(m)).copy()
    m2[37] = (m2[37] + 1) % F.P
    d2 = np.asarray(P2.hash_elems(F.fp(m2)))
    assert not np.array_equal(d, d2)


def test_merkle_commit_and_verify():
    n, c = 32, 5
    mat = F.fp(rng.integers(0, F.P, size=(n, c), dtype=np.int64))
    tree = merkle.commit(mat)
    assert tree.root.shape == (8,)
    idx = jnp.asarray([0, 1, 17, 31], dtype=jnp.int32)
    rows, paths = merkle.open_rows(tree, idx)
    ok = merkle.verify_rows(tree.root, idx, rows, paths)
    assert bool(jnp.all(ok))
    # tamper a row -> fails
    bad = rows.at[2, 0].set(F.add(rows[2, 0], F.fp(1)))
    ok2 = merkle.verify_rows(tree.root, idx, bad, paths)
    assert not bool(ok2[2]) and bool(ok2[0])
    # wrong index -> fails
    ok3 = merkle.verify_rows(tree.root, idx.at[0].set(2), rows, paths)
    assert not bool(ok3[0])


def test_transcript_determinism_and_divergence():
    d = F.fp(rng.integers(0, F.P, size=(8,), dtype=np.int64))
    t1 = transcript.Transcript()
    t1.mix_digest(d)
    a = [int(np.asarray(t1.sample_u32())) for _ in range(3)]
    t2 = transcript.Transcript()
    t2.mix_digest(d)
    b = [int(np.asarray(t2.sample_u32())) for _ in range(3)]
    assert a == b
    t3 = transcript.Transcript()
    t3.mix_digest(F.add(d, F.fp(np.ones(8, np.int64))))
    c = [int(np.asarray(t3.sample_u32())) for _ in range(3)]
    assert a != c
    idx = np.asarray(t1.sample_indices(10, 5))
    assert idx.shape == (10,) and (idx >= 0).all() and (idx < 32).all()


def test_internal_matrix_no_invariant_subspace():
    """M_I = J + diag(mu) must have a full-degree minimal polynomial.

    The small-constant diagonal (P2.DIAG_SPEC) is only safe if the
    internal matrix has no invariant subspaces; full Krylov rank of
    [v, M v, ..., M^23 v] for a random v certifies minimal-polynomial
    degree 24 (Poseidon2 paper requirement).
    """
    from boundless_tpu.core import poseidon2 as P2

    mu = P2._diag_values()
    assert len(set(int(x) for x in mu)) == P2.WIDTH and 0 not in mu
    P = F.P
    M = np.ones((24, 24), dtype=np.int64)
    M[np.arange(24), np.arange(24)] = (M[np.arange(24), np.arange(24)] + mu) % P
    r = np.random.default_rng(7).integers(1, P, 24, dtype=np.int64)
    K = np.empty((24, 24), dtype=np.int64)
    v = r % P
    for i in range(24):
        K[i] = v
        v = (M @ v) % P
    # Gaussian elimination mod P to compute rank
    A = K.copy()
    rank = 0
    for col in range(24):
        piv = None
        for row in range(rank, 24):
            if A[row, col] % P:
                piv = row
                break
        if piv is None:
            continue
        A[[rank, piv]] = A[[piv, rank]]
        inv = pow(int(A[rank, col]), P - 2, P)
        A[rank] = A[rank] * inv % P
        for row in range(24):
            if row != rank and A[row, col] % P:
                A[row] = (A[row] - A[row, col] * A[rank]) % P
        rank += 1
    assert rank == 24


def test_pallas_diag_chain_parity():
    """The Pallas small-constant diagonal path == montmul by mu."""
    from boundless_tpu.core import poseidon2 as P2
    from boundless_tpu.core import poseidon2_pallas as P2K

    ext_rc, int_rc, mu = P2._constants()
    s = F.fp(rng.integers(0, F.P, size=(24, 8), dtype=np.int64))
    ref = F.mul(s, jnp.asarray(mu)[:, None])
    got = P2K._mul_diag_t(s)
    assert jnp.array_equal(ref, got)
