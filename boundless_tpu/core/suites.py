"""Hash-suite abstraction for the STARK prover/verifier.

Two suites (reference: risc0's hashfn parameter — "poseidon2" for the
main lattice, "poseidon_254"/BN254-native for the Groth16-facing
`identity_p254` proof, SURVEY.md §2.4 / §3.2):

  * **poseidon2** — Baby Bear Poseidon2, the default everywhere. Fully
    on-device (core/merkle.py, core/transcript.py); every receipt in the
    recursion lattice uses it. This module delegates so the wire format
    and transcripts stay BIT-IDENTICAL to the pre-suite code.
  * **poseidon254** — BN254-scalar-field Poseidon (core/poseidon_bn254),
    used ONLY by the final-shrink proof that the Groth16 wrap verifies:
    native-field hashing keeps the wrap circuit small. Hashing runs as
    `jax.pure_callback` host calls (one small proof per session; runs on
    the CPU backend — see recursion/identity.py).

A suite provides `commit`/`verify_rows` (Merkle) and `transcript()`
(Fiat-Shamir). Digests are always (…, 8) u32 arrays so tree and proof
shapes are suite-independent (p254 digests are a 254-bit felt as 8 LE
words).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import merkle as M
from . import poseidon_bn254 as P254
from .transcript import Transcript


class Poseidon2Suite:
    name = "poseidon2"

    def commit(self, matrix) -> M.MerkleTree:
        return M.commit(matrix)

    def verify_rows(self, root, indices, rows, paths):
        return M.verify_rows(root, indices, rows, paths)

    def transcript(self):
        return Transcript()


# ---------------------------------------------------------------------------
# poseidon254 (host hashing via pure_callback)
# ---------------------------------------------------------------------------


def _cb(fn, shape_dtype, *args):
    return jax.pure_callback(fn, shape_dtype, *args, vmap_method="sequential")


def _u32(shape):
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


def _hash_rows254(matrix_mont):
    """(N, C) Montgomery BB -> (N, 8) digest words (host)."""
    n = matrix_mont.shape[0]
    canon = F.from_mont(matrix_mont)
    return _cb(lambda m: P254.hash_rows_np(np.asarray(m)), _u32((n, 8)),
               canon)


def _hash_pairs254(left, right):
    return _cb(lambda l, r: P254.hash_pairs_np(np.asarray(l), np.asarray(r)),
               _u32(left.shape), left, right)


class Poseidon254Suite:
    name = "poseidon254"

    def commit(self, matrix) -> M.MerkleTree:
        n = matrix.shape[0]
        assert n & (n - 1) == 0
        leaves = _hash_rows254(matrix)
        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = _hash_pairs254(cur[0::2], cur[1::2])
            levels.append(cur)
        return M.MerkleTree(levels=tuple(levels), matrix=matrix)

    def verify_rows(self, root, indices, rows, paths):
        cur = _hash_rows254(rows)
        idx = indices
        for d in range(paths.shape[1]):
            sib = paths[:, d]
            is_right = (idx & 1).astype(bool)[:, None]
            left = jnp.where(is_right, sib, cur)
            right = jnp.where(is_right, cur, sib)
            cur = _hash_pairs254(left, right)
            idx = idx >> 1
        return jnp.all(cur == root[None, :], axis=-1)

    def transcript(self):
        return Transcript254()


class Transcript254:
    """Fiat-Shamir over the p254 sponge (host state via pure_callback).

    State: 3 felts as a (3, 8) u32 word array. Challenge squeezes yield
    Baby Bear elements via 62-bit chunks mod P (poseidon_bn254.squeeze);
    the wrap circuit re-derives the identical sequence natively.
    """

    def __init__(self):
        self.state = jnp.zeros((3, 8), dtype=jnp.uint32)
        self._queue = []  # squeezed BB elems (Montgomery) not yet consumed

    # -- host helpers ---------------------------------------------------
    @staticmethod
    def _absorb_np(state, words):
        s = [P254.felt_of_words(state[i]) for i in range(3)]
        f = P254.felt_of_words(words)
        s[0] = (s[0] + f) % P254.FR
        s = P254.permute(s)
        return np.asarray([P254.digest_words(x) for x in s], dtype=np.uint32)

    @staticmethod
    def _squeeze_np(state):
        s = [P254.felt_of_words(state[i]) for i in range(3)]
        out = np.asarray(P254.squeeze_bb(s[0]), dtype=np.uint32)
        s = P254.permute(s)
        ns = np.asarray([P254.digest_words(x) for x in s], dtype=np.uint32)
        return ns, out

    # -- interface ------------------------------------------------------
    def mix_digest(self, digest):
        """Absorb an 8-word digest (p254 digest words — raw u32)."""
        self.state = _cb(self._absorb_np, _u32((3, 8)), self.state,
                         digest.astype(jnp.uint32))
        self._queue = []

    def mix_elems(self, elems):
        """Absorb a flat vector of BB field elements (Montgomery)."""
        flat = F.from_mont(elems.reshape(-1))

        def _h(m):
            felt = P254.hash_bb([int(x) for x in np.asarray(m)])
            return np.asarray(P254.digest_words(felt), dtype=np.uint32)

        self.mix_digest(_cb(_h, _u32((8,)), flat))

    def mix_pub(self, pub):
        leaves = jax.tree_util.tree_leaves(pub)
        if not leaves:
            self.mix_digest(jnp.zeros((8,), jnp.uint32))
            return
        self.mix_elems(jnp.concatenate(
            [jnp.ravel(x).astype(jnp.uint32) for x in leaves]))

    def sample_elem(self):
        if not self._queue:
            st, out = _cb(self._squeeze_np, (_u32((3, 8)), _u32((4,))),
                          self.state)
            self.state = st
            self._queue = [F.to_mont(out[i]) for i in range(4)]
        return self._queue.pop(0)

    def sample_ext(self):
        return jnp.stack([self.sample_elem() for _ in range(4)])

    def sample_u32(self):
        a = F.from_mont(self.sample_elem())
        b = F.from_mont(self.sample_elem())
        return (a & jnp.uint32(0xFFFF)) | ((b & jnp.uint32(0xFFFF)) << 16)

    def sample_indices(self, count: int, bits: int):
        mask = jnp.uint32((1 << bits) - 1)
        return jnp.stack([self.sample_u32() & mask
                          for _ in range(count)]).astype(jnp.int32)


SUITES = {
    "poseidon2": Poseidon2Suite(),
    "poseidon254": Poseidon254Suite(),
}


def get(name: str):
    return SUITES[name]
