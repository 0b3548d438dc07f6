"""Fiat-Shamir transcript: a Poseidon2 duplex sponge (pure JAX).

Plays the role of risc0's `Poseidon2Rng` (the RNG behind `ProverServer`'s
non-interactive challenges). Kept purely functional over jnp arrays so the
entire prover and verifier — transcript included — trace into single XLA
programs, and so the recursion circuit can replay it in-circuit later.

Challenge extraction:
  * `sample_elem` squeezes one Baby Bear element from the rate cells,
    re-permuting when the pool is exhausted (pool bookkeeping is a Python
    int: the squeeze schedule is static per protocol, hence trace-safe).
  * `sample_u32` builds a uniform-ish 32-bit word from two squeezed
    elements ((a & 0xffff) | (b & 0xffff) << 16); the bias from canonical
    values living in [0, P) is < 2^-14 per 16-bit half, negligible for
    query sampling (risc0 uses the same construction family).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as F
from . import poseidon2 as P2


class Transcript:
    def __init__(self):
        self.state = jnp.zeros((P2.WIDTH,), dtype=jnp.uint32)
        self._pool = P2.RATE  # force permute before first squeeze

    def mix_digest(self, digest):
        """Absorb an 8-word digest (Montgomery uint32)."""
        self.state = self.state.at[: P2.DIGEST_WORDS].set(
            F.add(self.state[: P2.DIGEST_WORDS], digest)
        )
        self.state = P2.permute(self.state)
        self._pool = 0

    def mix_elems(self, elems):
        """Absorb a flat vector of field elements via its sponge hash."""
        self.mix_digest(P2.hash_elems(elems.reshape(-1)))

    def mix_pub(self, pub):
        """Absorb a public-values pytree (canonical binding digest;
        bit-identical to the pre-suite `mix_digest(pub_digest_of(pub))`
        transcript)."""
        import jax

        leaves = jax.tree_util.tree_leaves(pub)
        if not leaves:
            self.mix_digest(jnp.zeros((8,), dtype=jnp.uint32))
            return
        flat = jnp.concatenate([jnp.ravel(x).astype(jnp.uint32)
                                for x in leaves])
        self.mix_digest(P2.hash_elems(flat))

    def sample_elem(self):
        if self._pool >= P2.RATE:
            self.state = P2.permute(self.state)
            self._pool = 0
        out = self.state[self._pool]
        self._pool += 1
        return out

    def sample_ext(self):
        return jnp.stack([self.sample_elem() for _ in range(4)])

    def sample_u32(self):
        a = F.from_mont(self.sample_elem())
        b = F.from_mont(self.sample_elem())
        return (a & jnp.uint32(0xFFFF)) | ((b & jnp.uint32(0xFFFF)) << 16)

    def sample_indices(self, count: int, bits: int):
        """count indices in [0, 2^bits)."""
        mask = jnp.uint32((1 << bits) - 1)
        return jnp.stack([self.sample_u32() & mask for _ in range(count)]).astype(
            jnp.int32
        )
