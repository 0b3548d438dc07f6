"""Merkle commitments over Poseidon2 digests (TPU-batched).

Replaces the device Merkle-tree build inside the reference's CUDA prover
(`risc0-sys`, SURVEY.md §2.4). A commitment is over a matrix of evaluations
(rows = LDE domain points, cols = trace columns): leaf i = sponge hash of
row i, then a binary tree of 2-to-1 Poseidon2 compressions.

The whole tree build is jit-friendly (static shapes, log-depth loop of
batched hash_pair calls). Query opening/verification are also pure JAX so
they can run inside a jitted verifier (and, later, inside the recursion
circuit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import field as F
from . import poseidon2 as P2
from . import poseidon2_pallas as P2K


class MerkleTree(NamedTuple):
    """levels[0] = leaf digests (N, 8) ... levels[-1] = root (1, 8)."""

    levels: tuple
    matrix: jnp.ndarray  # committed rows (N, C), Montgomery uint32

    @property
    def root(self):
        return self.levels[-1][0]

    @property
    def num_leaves(self):
        return self.levels[0].shape[0]


# Leaf hashing below this row count keeps the O(1)-graph scanned sponge
# (tiny test traces / CPU); at or above it the unrolled cells-layout
# sponge wins (dense VPU lanes, state resident across rounds).
CELLS_MIN_ROWS = 4096


def commit(matrix) -> MerkleTree:
    """Commit to a (N, C) matrix, N a power of two."""
    n = matrix.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    # Leaf hashing is the prover's dominant cost: ride the cells-layout
    # pure-XLA sponge (poseidon2.hash_rows_cells, bit-identical). The
    # Pallas kernels (poseidon2_pallas.py) are an alternative measured in
    # docs/ROOFLINE.md — same throughput once warm, but their first
    # execution pays a ~10-min server-side Mosaic compile per process on
    # this TPU relay, so the XLA path is the default (BT_P2_PALLAS=1
    # re-enables them).
    if P2K.usable(n):
        leaves = P2K.hash_rows(matrix)
    elif n >= CELLS_MIN_ROWS:
        leaves = P2.hash_rows_cells(matrix)
    else:
        leaves = P2.hash_elems(matrix)  # (N, 8)
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        left, right = cur[0::2], cur[1::2]
        if P2K.usable(left.shape[0]):
            cur = P2K.hash_pairs(left, right)
        elif left.shape[0] >= CELLS_MIN_ROWS:
            cur = P2.hash_rows_cells(jnp.concatenate([left, right], axis=1))
        else:
            cur = P2.hash_pair(left, right)
        levels.append(cur)
    return MerkleTree(levels=tuple(levels), matrix=matrix)


def open_rows(tree: MerkleTree, indices):
    """Open query rows. indices: (Q,) int32 (traced ok).

    Returns (rows (Q, C), paths (Q, depth, 8)) where paths[q][d] is the
    sibling digest at depth d (leaf level first).
    """
    rows = tree.matrix[indices]
    sibs = []
    idx = indices
    for level in tree.levels[:-1]:
        sibs.append(level[idx ^ 1])
        idx = idx >> 1
    paths = jnp.stack(sibs, axis=1) if sibs else jnp.zeros((indices.shape[0], 0, 8), jnp.uint32)
    return rows, paths


def verify_rows(root, indices, rows, paths):
    """Recompute the root from opened rows; returns bool array (Q,).

    Pure JAX (vectorized over queries) so it can run jitted / in-circuit.
    """
    cur = P2.hash_elems(rows)  # (Q, 8)
    idx = indices
    depth = paths.shape[1]
    for d in range(depth):
        sib = paths[:, d]
        is_right = (idx & 1).astype(bool)[:, None]
        left = jnp.where(is_right, sib, cur)
        right = jnp.where(is_right, cur, sib)
        cur = P2.hash_pair(left, right)
        idx = idx >> 1
    return jnp.all(cur == root[None, :], axis=-1)
