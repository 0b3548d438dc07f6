"""Segment proving pipeline: executor segment -> SegmentReceipt.

The TPU-side of the reference's prove task (`prover/crates/workflow/src/
tasks/prove.rs:17-104`): fetch segment, prove, verify integrity, hand the
receipt to the recursion layer. Provers/verifiers are jitted once per
(po2, proof-system) and cached — the same compiled XLA program serves
every program/segment (the image table is an argument, not a constant).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import numpy as np

from ..air.rv32im import Rv32imAir, PublicValues
from ..core import field as F
from ..prover import stark
from . import witness
from .executor import Segment, MemoryImage

# Default proof system: 100 queries at commit rate 1/2 — same ~100-bit
# conjectured soundness as the reference's 50 queries at rate 1/4
# (risc0-zkp defaults), but half the Merkle hashing (the TPU prover's
# dominant cost; see stark.ProofSystem).
DEFAULT_PS = stark.ProofSystem(queries=100, fri_min_degree=256)
# Small system for CI (fast compile/runtime; NOT production soundness).
TEST_PS = stark.ProofSystem(queries=8, fri_min_degree=16)

_AIR = Rv32imAir()


@dataclasses.dataclass
class SegmentReceipt:
    """Proof + claim for one segment.

    claim fields are canonical numpy ints; image_id is the Merkle control
    root (the program's proof-level identity).
    """

    proof: stark.SegmentProof
    pub: dict  # canonical claim values (witness.SegmentWitness.pub)
    image_id: np.ndarray  # (8,) canonical u32 digest words
    po2: int


@functools.lru_cache(maxsize=None)
def _prover(po2: int, ps: stark.ProofSystem):
    return stark.make_prover(_AIR, po2, ps)


@functools.lru_cache(maxsize=None)
def _verifier(po2: int, ps: stark.ProofSystem):
    return stark.make_verifier(_AIR, po2, ps)


_IMAGE_CTRL_CACHE: dict = {}


def _image_ctrl(image: MemoryImage, po2: int,
                ps: stark.ProofSystem = DEFAULT_PS):
    key = (image.image_id(), po2, ps.commit_expand)
    if key not in _IMAGE_CTRL_CACHE:
        ctrl = F.fp(witness.build_ctrl_trace(image, po2))
        root = stark.control_root_of(_AIR, po2, ctrl, ps)
        _IMAGE_CTRL_CACHE[key] = (ctrl, np.asarray(F.from_mont(root)))
    return _IMAGE_CTRL_CACHE[key]


def image_id_of(image: MemoryImage, po2: int,
                ps: stark.ProofSystem = DEFAULT_PS) -> np.ndarray:
    """Proof-level image id: Merkle root of the image-table commitment."""
    return _image_ctrl(image, po2, ps)[1]


def _segment_image(image: MemoryImage, seg: Segment) -> MemoryImage:
    """The memory table a segment is proven against: its own pre-memory.

    Cross-segment RAM continuity (reference continuations: risc0 claims
    chain MemoryImage Merkle roots, consumed at `prover/crates/workflow/
    src/tasks/prove.rs:68-95`): segment k's image table IS the full word
    store at its entry, so heap written in earlier segments is readable
    (the AIR's first-access-must-match-image rule now refers to the
    segment's own table). The resulting per-segment control root becomes
    the claim's pre_mem_root; segment 0's table is the program image, so
    genesis ties the memory chain to the program identity.
    """
    if seg.index == 0 or seg.pre_mem == image.words:
        return image
    return MemoryImage(words=dict(seg.pre_mem), entry=image.entry)


def mem_root(image: MemoryImage, words: dict, po2: int,
             ps: stark.ProofSystem = DEFAULT_PS) -> np.ndarray:
    """Control root of an arbitrary memory table (pre/post mem roots)."""
    return image_id_of(MemoryImage(words=dict(words), entry=image.entry),
                       po2, ps)


def _gen_witness(image, seg):
    """Prefer the C++ witness generator; fall back to the Python replay
    only on toolchain/load problems (guest faults propagate)."""
    from .executor import GuestFault

    try:
        return witness.trace_segment_native(image, seg, seg.po2)
    except GuestFault:
        raise
    except Exception:  # noqa: BLE001 — g++/ctypes issues only
        return witness.trace_segment(image, seg, seg.po2)


def prove_segment(image: MemoryImage, seg: Segment,
                  ps: stark.ProofSystem = DEFAULT_PS) -> SegmentReceipt:
    """Generate the witness and prove one segment (jitted XLA program).

    The receipt's image_id is the control root of this segment's OWN
    memory table (see _segment_image) — for segment 0 that equals the
    program image id.
    """
    seg_image = _segment_image(image, seg)
    w = _gen_witness(seg_image, seg)
    data = F.fp(w.data)
    ctrl, image_id = _image_ctrl(seg_image, seg.po2, ps)
    pub = witness.to_public_values(w.pub)
    proof = _prover(seg.po2, ps)(data, pub, ctrl)
    return SegmentReceipt(proof=proof, pub=w.pub, image_id=image_id,
                          po2=seg.po2)


def dev_receipt(image: MemoryImage, seg: Segment,
                ps: stark.ProofSystem = DEFAULT_PS) -> SegmentReceipt:
    """Dev-mode fake receipt (reference `RISC0_DEV_MODE=true`,
    SURVEY.md §4): real witness/public values and image id, no proof.
    Instant, NOT sound — test/development fixture only."""
    seg_image = _segment_image(image, seg)
    w = _gen_witness(seg_image, seg)
    _, image_id = _image_ctrl(seg_image, seg.po2, ps)
    return SegmentReceipt(proof=None, pub=w.pub, image_id=image_id,
                          po2=seg.po2)


def verify_segment(receipt: SegmentReceipt,
                   ps: stark.ProofSystem = DEFAULT_PS) -> bool:
    """Verify a SegmentReceipt against its claimed image id."""
    pub = witness.to_public_values(receipt.pub)
    control_root = F.fp(np.asarray(receipt.image_id, dtype=np.int64))
    ok = _verifier(receipt.po2, ps)(receipt.proof, pub, control_root)
    return bool(ok)
