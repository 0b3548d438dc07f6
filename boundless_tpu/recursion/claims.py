"""Span claims for succinct recursion: layout, io chaining, digests.

The recursion layer's claims mirror the reference's `ReceiptClaim`
(risc0-zkvm; joined at `prover/crates/workflow/src/tasks/join.rs:53`)
reshaped for this zkVM's public-value design: instead of a memory-image
SystemState, a claim pins the register file, pc, per-tag io sequence
counters, and a running **io chain digest** (journal/input/assumption
words are folded into a Poseidon2 hash chain so claims stay fixed-size
and joins stay O(1) — the reference reaches the same end with journal
digests in the claim).

Claim element vector (canonical Baby Bear scalars, order is normative —
the lift/join programs hash exactly this):

  wire  0- 1  image_id (8 words = rv32im control root)
  wire  2     [pre_pc, post_pc, halted, 0]
  wires 3-18  pre_regs (64 limbs)
  wires 19-34 post_regs (64 limbs)
  wire  35    [pre_seqs(3), 0]
  wire  36    [post_seqs(3), 0]
  wires 37-38 pre_io_chain (8)
  wires 39-40 post_io_chain (8)

(41 packed wires = 164 slots; 161 live elements; digest =
P2.hash_elems over the 164-slot padded vector == hash of the 161
elements, since hash_elems zero-pads to the same block boundary.)

io chain: h' = H(h(8) || tag, seq, lo, hi) per *masked* io row, in the
segment's public io order; pre-chain of a session is all-zeros.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from ..core import field as F
from ..core import poseidon2 as P2

CLAIM_WIRES = 41
CLAIM_ELEMS = 4 * CLAIM_WIRES  # padded slot count

ZERO_CHAIN = (0,) * 8


def _hash_elems_canonical(elems: Sequence[int]) -> Tuple[int, ...]:
    mont = F.fp(np.asarray(list(elems), dtype=np.int64))
    return tuple(int(x) for x in F.from_mont(P2.hash_elems(mont)))


def io_chain_step(h: Sequence[int], tag: int, seq: int, lo: int, hi: int
                  ) -> Tuple[int, ...]:
    """h' = H(h || tag, seq, lo, hi)  (12 elements)."""
    return _hash_elems_canonical(list(h) + [tag, seq, lo, hi])


def io_chain(pre: Sequence[int], io_rows) -> Tuple[int, ...]:
    """Fold masked io rows (tag, seq, lo, hi, mask) into the chain."""
    h = tuple(int(x) for x in pre)
    for row in io_rows:
        tag, seq, lo, hi, mask = (int(x) for x in row)
        if mask:
            h = io_chain_step(h, tag, seq, lo, hi)
    return h


@dataclasses.dataclass(frozen=True)
class Claim:
    """A span claim (contiguous rv32im execution, 1..k segments)."""

    image_id: tuple      # 8 words
    pre_pc: int
    post_pc: int
    halted: int
    pre_regs: tuple      # 64 limbs
    post_regs: tuple
    pre_seqs: tuple      # (commit, read, verify)
    post_seqs: tuple
    pre_io_chain: tuple  # 8
    post_io_chain: tuple

    def to_elems(self) -> List[int]:
        """The normative padded 164-slot vector (see module docstring)."""
        out = list(self.image_id)
        out += [self.pre_pc, self.post_pc, self.halted, 0]
        out += list(self.pre_regs)
        out += list(self.post_regs)
        out += list(self.pre_seqs) + [0]
        out += list(self.post_seqs) + [0]
        out += list(self.pre_io_chain)
        out += list(self.post_io_chain)
        assert len(out) == CLAIM_ELEMS
        return out

    def digest(self) -> Tuple[int, ...]:
        return _hash_elems_canonical(self.to_elems())

    @staticmethod
    def of_segment(image_id, pub, pre_io_chain=ZERO_CHAIN) -> "Claim":
        """Claim of one segment from its (canonical) public values.

        pub: dict-like with pre_pc/post_pc/halted/pre_regs/post_regs/
        pre_seqs/post_seqs/io (the SegmentReceipt.pub layout,
        boundless_tpu/zkvm/witness.py).
        """
        post = io_chain(pre_io_chain, pub["io"])
        return Claim(
            image_id=tuple(int(x) for x in image_id),
            pre_pc=int(pub["pre_pc"]), post_pc=int(pub["post_pc"]),
            halted=int(pub["halted"]),
            pre_regs=tuple(int(x) for x in pub["pre_regs"]),
            post_regs=tuple(int(x) for x in pub["post_regs"]),
            pre_seqs=tuple(int(x) for x in pub["pre_seqs"]),
            post_seqs=tuple(int(x) for x in pub["post_seqs"]),
            pre_io_chain=tuple(int(x) for x in pre_io_chain),
            post_io_chain=post)

    def join(self, right: "Claim") -> "Claim":
        """The joined claim (must satisfy the chaining equalities the
        join program enforces in-circuit)."""
        assert self.image_id == right.image_id
        assert not self.halted
        assert self.post_pc == right.pre_pc
        assert self.post_regs == right.pre_regs
        assert self.post_seqs == right.pre_seqs
        assert self.post_io_chain == right.pre_io_chain
        return Claim(
            image_id=self.image_id, pre_pc=self.pre_pc,
            post_pc=right.post_pc, halted=right.halted,
            pre_regs=self.pre_regs, post_regs=right.post_regs,
            pre_seqs=self.pre_seqs, post_seqs=right.post_seqs,
            pre_io_chain=self.pre_io_chain,
            post_io_chain=right.post_io_chain)


# ---------------------------------------------------------------------------
# Allowed-set (control-root lattice)
# ---------------------------------------------------------------------------


def allowed_set_root(ids: Sequence[Sequence[int]], depth: int = 2
                     ) -> Tuple[int, ...]:
    """Merkle root over program control IDs (8-word digests).

    The root is a *public input* of every recursion proof; programs check
    their children's control roots are members (risc0's control-root
    lattice, `risc0_zkvm` control ids). Slots pad with zero digests.
    """
    leaves = [tuple(int(x) for x in d) for d in ids]
    slots = 1 << depth
    assert len(leaves) <= slots
    leaves = leaves + [(0,) * 8] * (slots - len(leaves))
    level = leaves
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level), 2):
            mont_l = F.fp(np.asarray(level[i], dtype=np.int64))
            mont_r = F.fp(np.asarray(level[i + 1], dtype=np.int64))
            h = P2.hash_pair(mont_l, mont_r)
            nxt.append(tuple(int(x) for x in F.from_mont(h)))
        level = nxt
    return level[0]


def allowed_set_path(ids: Sequence[Sequence[int]], index: int,
                     depth: int = 2) -> List[Tuple[int, ...]]:
    """Sibling path for leaf `index` (leaf level first)."""
    leaves = [tuple(int(x) for x in d) for d in ids]
    slots = 1 << depth
    leaves = leaves + [(0,) * 8] * (slots - len(leaves))
    path = []
    level = leaves
    idx = index
    while len(level) > 1:
        path.append(level[idx ^ 1])
        nxt = []
        for i in range(0, len(level), 2):
            mont_l = F.fp(np.asarray(level[i], dtype=np.int64))
            mont_r = F.fp(np.asarray(level[i + 1], dtype=np.int64))
            h = P2.hash_pair(mont_l, mont_r)
            nxt.append(tuple(int(x) for x in F.from_mont(h)))
        level = nxt
        idx >>= 1
    return path
