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

_AIR = Rv32imAir()          # full RV32IM constraint system (576 cols)
_AIR_I = Rv32imAir(False)   # RV32I variant (384 cols; no M machinery)
_AIRS = {'rv32im': _AIR, 'rv32i': _AIR_I}


def image_uses_m(image) -> bool:
    '''True iff any decoded instruction word of the image is an
    M-extension op (the AIR-variant choice is static per program;
    decode_row tail element is the mext flag).'''
    from .witness import decode_row

    return any(decode_row(a, w)[-1] for a, w in image.words.items())


def air_variant_of(image, seg: Optional[Segment] = None) -> str:
    '''AIR variant for a program (and, when given, a specific segment).

    The keccak-ecall burst machinery lives only in the rv32im variant
    (air/rv32im.py), so segments containing keccak permutations must be
    proven under it; keccak-free segments of the same session may use
    the thin rv32i variant (both lift programs share the allowed set).'''
    if seg is not None and getattr(seg, 'kec_perms', 0):
        return 'rv32im'
    return 'rv32im' if image_uses_m(image) else 'rv32i'


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
    # AIR the proof was generated under: "rv32im" full / "rv32i" (no M
    # machinery; 192 fewer committed columns). Both variants' lift
    # programs are in the recursion allowed set.
    variant: str = "rv32im"


@functools.lru_cache(maxsize=None)
def _prover(po2: int, ps: stark.ProofSystem, variant: str = "rv32im"):
    # prove_segment builds a fresh data trace per call, so the buffer is
    # donated: at po2 17 / rate 1/4 the ~200 MB trace is the margin that
    # kept the q50/e4 prover inside v5e HBM (round-5 pipeline runs OOMed
    # by 101 MB without it).
    return stark.make_prover(_AIRS[variant], po2, ps, donate=True)


@functools.lru_cache(maxsize=None)
def _verifier(po2: int, ps: stark.ProofSystem, variant: str = "rv32im"):
    return stark.make_verifier(_AIRS[variant], po2, ps)


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


def mem_root(words: dict) -> tuple:
    """Sparse page-tree root of a memory word store (byte-addr keyed).

    Cross-segment RAM continuity (reference continuations: risc0 claims
    chain MemoryImage Merkle roots, consumed at `prover/crates/workflow/
    src/tasks/prove.rs:68-95`): claims carry pre/post PageTree roots
    (zkvm/paging.py); the segment AIR binds touched-page pre/post words
    as publics through the init/final LogUp ports, and the lift program
    walks the tree in-circuit, so post_mem_root is DERIVED from the
    proof, not witnessed. Every segment is proven against the one static
    program image table (instruction fetch is Harvard: the decoded code
    table in the ctrl group, root == image_id).
    """
    from . import paging

    return paging.PageTree.from_words(
        {a >> 2: v for a, v in words.items()}).root()


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

    The receipt's image_id is the program's control root (the static
    image table; one table serves every segment — data-memory continuity
    rides the paging-port publics + PageTree roots, see mem_root).
    """
    variant = air_variant_of(image, seg)
    w = _gen_witness(image, seg)
    data = F.fp(witness.data_for_variant(w.data, variant))
    ctrl, image_id = _image_ctrl(image, seg.po2, ps)
    pub = witness.to_public_values(w.pub)
    proof = _prover(seg.po2, ps, variant)(data, pub, ctrl)
    return SegmentReceipt(proof=proof, pub=w.pub, image_id=image_id,
                          po2=seg.po2, variant=variant)


def dev_receipt(image: MemoryImage, seg: Segment,
                ps: stark.ProofSystem = DEFAULT_PS) -> SegmentReceipt:
    """Dev-mode fake receipt (reference `RISC0_DEV_MODE=true`,
    SURVEY.md §4): real witness/public values and image id, no proof.
    Instant, NOT sound — test/development fixture only."""
    w = _gen_witness(image, seg)
    _, image_id = _image_ctrl(image, seg.po2, ps)
    return SegmentReceipt(proof=None, pub=w.pub, image_id=image_id,
                          po2=seg.po2, variant=air_variant_of(image, seg))


def verify_segment(receipt: SegmentReceipt,
                   ps: stark.ProofSystem = DEFAULT_PS) -> bool:
    """Verify a SegmentReceipt against its claimed image id."""
    pub = witness.to_public_values(receipt.pub)
    control_root = F.fp(np.asarray(receipt.image_id, dtype=np.int64))
    variant = getattr(receipt, "variant", "rv32im") or "rv32im"
    ok = _verifier(receipt.po2, ps, variant)(receipt.proof, pub,
                                             control_root)
    return bool(ok)
