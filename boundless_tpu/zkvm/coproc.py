"""Keccak coprocessor proving: batch receipts + union tree (host layer).

The compute side of the reference's coproc stream
(`prover/crates/workflow/src/tasks/keccak.rs:71-84` prove_keccak,
`tasks/union.rs:44-50` union): a batch of keccak-f[1600] permutations is
proven by one KeccakAir STARK (air/keccak.py); per-permutation claim
digests are derived from the proof's PUBLIC state table and must match
the executor's ecall digests (zkvm/executor.keccak_perm_digest). Union
receipts merge batches pairwise (aggregation semantics, like the v1
recursion layer: children carried, digests concatenated; the succinct
union recursion program is staged — the in-circuit keccak verifier's
tap cost is dominated by the 4048-column trace, see docs/PROTOCOL.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import numpy as np

from ..air import keccak as K
from ..core import field as F
from ..core import poseidon2_np as P2NP
from ..prover import stark

# CI-friendly default batch size: 2^8 rows = 10 permutations / segment.
DEFAULT_PO2 = 8


@dataclasses.dataclass
class KeccakReceipt:
    """One proven batch: proof + public state table + claim digests of
    the first `count` (real) permutations."""

    proof: Optional[stark.SegmentProof]  # None in dev mode
    states_pub: np.ndarray  # (KMAX, 1 + 200) canonical int64
    po2: int
    count: int

    def digests(self) -> List[bytes]:
        out = []
        for k in range(self.count):
            limbs = [int(x) for x in self.states_pub[k, 1:]]
            d = P2NP.hash_elems_np(limbs)
            out.append(b"".join(int(w).to_bytes(4, "little") for w in d))
        return out


@dataclasses.dataclass
class UnionReceipt:
    """Aggregation union of keccak batches (reference union.rs:44)."""

    children: list  # KeccakReceipt | UnionReceipt

    def digests(self) -> List[bytes]:
        out = []
        for ch in self.children:
            out.extend(ch.digests())
        return out


@functools.lru_cache(maxsize=None)
def _prover(po2: int, ps: stark.ProofSystem):
    return stark.make_prover(K.AIR, po2, ps)


@functools.lru_cache(maxsize=None)
def _verifier(po2: int, ps: stark.ProofSystem):
    return stark.make_verifier(K.AIR, po2, ps)


@functools.lru_cache(maxsize=None)
def circuit_id(po2: int, ps: stark.ProofSystem) -> tuple:
    """The keccak circuit's control root (static ctrl group)."""
    root = stark.control_root_of(K.AIR, po2, ps=ps)
    return tuple(int(x) for x in np.asarray(F.from_mont(root)))


def prove_keccak(states: List[list], po2: int = DEFAULT_PO2,
                 ps: stark.ProofSystem = None,
                 dev_mode: bool = False) -> KeccakReceipt:
    """Prove a batch of permutations (input lane lists)."""
    ps = ps or stark.ProofSystem()
    data, pub, _outs = K.witness(states, po2)
    if dev_mode:
        return KeccakReceipt(proof=None, states_pub=pub["states"],
                             po2=po2, count=len(states))
    proof = _prover(po2, ps)(F.fp(data),
                             K.PublicValues(states=F.fp(pub["states"])))
    return KeccakReceipt(proof=proof, states_pub=pub["states"], po2=po2,
                         count=len(states))


def verify_keccak(r: KeccakReceipt, ps: stark.ProofSystem = None) -> bool:
    """Verify a batch receipt: the STARK against the static circuit id,
    with the receipt's public state table."""
    if r.proof is None:
        return False  # dev receipts don't verify (fixture semantics)
    ps = ps or stark.ProofSystem()
    root = F.fp(np.asarray(circuit_id(r.po2, ps), dtype=np.int64))
    ok = _verifier(r.po2, ps)(
        r.proof, K.PublicValues(states=F.fp(r.states_pub)), root)
    return bool(ok)


def union(left, right) -> UnionReceipt:
    return UnionReceipt(children=[left, right])


def verify_union(r, ps: stark.ProofSystem = None,
                 dev_mode: bool = False) -> bool:
    """Recursively verify an aggregation union."""
    if isinstance(r, KeccakReceipt):
        return dev_mode if r.proof is None else verify_keccak(r, ps)
    return all(verify_union(ch, ps, dev_mode) for ch in r.children)
