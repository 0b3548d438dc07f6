"""Succinct recursion programs: lift / join / resolve as in-circuit claims.

The TPU-native analogue of risc0's recursion programs (invoked via
`ProverServer::{lift, join, resolve}` at `prover/crates/workflow/src/
tasks/{prove,join,resolve}.rs`; SURVEY.md §2.4 `risc0-circuit-recursion-
sys`): each program is a recursion-VM `Prog` (one RecursionAir circuit)
that *verifies proofs in-circuit* and derives a claim v2 digest
(recursion/claims.py):

  * **lift** — verifies one rv32im segment STARK wire-for-wire
    (programs.StarkVerifier over the rv32im AIR), then derives the
    segment's span claim: image_id = the verified control root, pc /
    regs / seqs / halted read from the segment's public values, and the
    three per-tag io chains folded in-circuit from the public io table
    (with per-tag seq-contiguity enforcement, so chain order is bound).
    Pre-chains are free witness (claims are "IF pre THEN post", like pc).
  * **join** — verifies two child *recursion* proofs (RecursionAir at the
    uniform rec_po2), checks both children's control roots are members of
    the allowed-set Merkle root (own pub groups 2-3), checks the childrens'
    claims (witnessed, hash-checked against their pub digests) chain
    (post == pre for pc/regs/seqs/chains/mem), and emits the joined claim.
  * **resolve** — verifies a conditional child + an assumption child,
    checks the assumption's claim is itself fully resolved, pops the top
    assumption from the conditional's assumptions chain (re-deriving the
    8 digest-word folds from a witnessed 8-back chain value) and checks
    the popped digest equals the assumption child's claim digest.

Every recursion proof carries PUB_VALS = 24 public scalars:
groups 0-1 claim digest, 2-3 allowed-set root, 4-5 zero. All programs pad
to the same 2^rec_po2 rows so receipts nest uniformly (risc0 fixes its
recursion circuit size the same way). `SuccinctSystem` builds the program
set, derives control IDs + the allowed root, and exposes lift/join/
resolve/verify over `RecReceipt`s.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..air import rv32im
from ..core import field as F
from ..prover import stark
from . import air as rair
from . import claims, programs, vm

P = F.P

RV_AIR = rv32im.Rv32imAir()
IO = rv32im.IO_MAX
# Flat public-element count of an rv32im proof (jax.tree_util leaf order
# of rv32im.PublicValues: pre_pc, post_pc, pre_regs, post_regs, halted,
# pre_seqs, post_seqs, io).
RV_PUB_LEN = 2 + 64 + 64 + 1 + 3 + 3 + 5 * IO
_PRE_REGS0, _POST_REGS0 = 2, 66
_HALTED, _PRE_SEQS0, _POST_SEQS0, _IO0 = 130, 131, 134, 137

# claim wire indices (claims.py layout)
W_IMG = (0, 1)
W_PC = 2          # [pre_pc, post_pc, halted, 0]
W_PRE_REGS = slice(3, 19)
W_POST_REGS = slice(19, 35)
W_PRE_SEQS = 35
W_POST_SEQS = 36
W_CHAINS = {4: (37, 39), 5: (41, 43), 6: (45, 47)}  # tag -> (pre0, post0)
W_PRE_MEM, W_POST_MEM = (49, 50), (51, 52)


def rv_pub_flat(pub: dict) -> List[int]:
    """Canonical flat public elements of a segment (tree-leaf order)."""
    out = [int(pub["pre_pc"]), int(pub["post_pc"])]
    out += [int(x) for x in pub["pre_regs"]]
    out += [int(x) for x in pub["post_regs"]]
    out.append(int(pub["halted"]))
    out += [int(x) for x in pub["pre_seqs"]]
    out += [int(x) for x in pub["post_seqs"]]
    out += [int(x) for x in np.asarray(pub["io"], dtype=np.int64).reshape(-1)]
    assert len(out) == RV_PUB_LEN
    return out


# ---------------------------------------------------------------------------
# Wire helpers
# ---------------------------------------------------------------------------


def _pack4(p: vm.Prog, scalars: Sequence[int]) -> int:
    """Pack up to 4 scalar wires into one wire (components 0..3)."""
    assert 1 <= len(scalars) <= 4
    acc = scalars[0]
    for c in range(1, len(scalars)):
        acc = p.add(acc, p._mul_basis(scalars[c], c, 1))
    return acc


class _WireRv32Pub:
    """rv32im PublicValues over wires (what the AIR's constraints and the
    lift claim derivation read). Elements are lazily picked from the
    packed pub wires."""

    def __init__(self, p: vm.Prog, sp: programs.ScalarPub):
        self.sp = sp
        self.pre_pc = sp[0]
        self.post_pc = sp[1]
        self.pre_regs = [sp[_PRE_REGS0 + i] for i in range(64)]
        self.post_regs = [sp[_POST_REGS0 + i] for i in range(64)]
        self.halted = sp[_HALTED]
        self.pre_seqs = [sp[_PRE_SEQS0 + i] for i in range(3)]
        self.post_seqs = [sp[_POST_SEQS0 + i] for i in range(3)]
        self.io = [[sp[_IO0 + 5 * r + j] for j in range(5)]
                   for r in range(IO)]


class Rv32imVerifier(programs.StarkVerifier):
    """StarkVerifier over the rv32im AIR with structured public values."""

    def unpack_pub(self, pub_wires):
        self.wire_pub = _WireRv32Pub(self.p, programs.ScalarPub(
            self.p, pub_wires, self.pub_len))
        return self.wire_pub


def _fold_step(p: vm.Prog, chain2, lohi: int) -> Tuple[int, int]:
    """In-circuit claims.chain_step: H(chain(8) || lo, hi)."""
    return p.hash_packed([chain2[0], chain2[1], lohi], 10)


def _select2(p: vm.Prog, b: int, x2, y2):
    return (p.select(b, x2[0], y2[0]), p.select(b, x2[1], y2[1]))


# ---------------------------------------------------------------------------
# lift
# ---------------------------------------------------------------------------


def build_lift(seg_po2: int, seg_ps: stark.ProofSystem) -> vm.Prog:
    """The lift program: in-circuit rv32im verify + claim v2 derivation.

    Witness order (must mirror lift_witness): the serialized segment
    proof (programs.serialize_proof), then 6 pre-chain wires (tags
    4, 5, 6; 2 packed wires each), then the program image id (2 packed
    wires) and the post-memory root (2 packed wires).

    Public values: groups 0-1 = claim digest; 2-3 = allowed-set root
    (unread here — rides through for uniformity); 4-5 pinned zero.
    """
    p = vm.Prog(f"lift-p{seg_po2}q{seg_ps.queries}e{seg_ps.commit_expand}")
    v = Rv32imVerifier(RV_AIR, seg_po2, seg_ps, pub_len=RV_PUB_LEN,
                       prog=p, bind_pub_groups=False)
    res = v.build()
    pub = v.wire_pub
    zero = p.const(0)

    # --- per-tag chains: fold the public io table in-circuit ---
    pre_chain = {t: (p.input(), p.input()) for t in claims.CHAIN_TAGS}
    # RAM continuity (claim v2 mem slots): pre_mem_root is the VERIFIED
    # control root of this segment's own memory table (prove.py
    # _segment_image); the program image id and the post-memory root are
    # witness inputs. Soundness: join chains post==pre roots in-circuit,
    # and genesis (finalize) requires image_id == pre_mem_root, so a span
    # only finalizes if its first table IS the program image. The
    # remaining gap — in-circuit derivation of post_mem_root from the
    # segment's memory log (LogUp paging port, zkvm/paging.py) — is
    # tracked in docs/PROTOCOL.md.
    img_w = (p.input(), p.input())
    post_mem_w = (p.input(), p.input())
    chain = {t: pre_chain[t] for t in claims.CHAIN_TAGS}
    exp_seq = {t: pub.pre_seqs[i]
               for i, t in enumerate(claims.CHAIN_TAGS)}
    for r in range(IO):
        tag, seq, lo, hi, mask = pub.io[r]
        # mask is boolean
        p.assert_zero(p.mul(mask, p.addc(mask, (P - 1, 0, 0, 0))))
        # tag flags: b_t * (tag - t) == 0 and Σ b_t == mask forces the
        # correct one-hot on masked rows (masked tag must be in the set)
        dts, bts = {}, {}
        for t in claims.CHAIN_TAGS:
            dts[t] = p.addc(tag, (P - t, 0, 0, 0))
            bts[t] = p.flag_eqz(dts[t])
            p.assert_zero(p.mul(bts[t], dts[t]))
        prod = p.mul(p.mul(dts[4], dts[5]), dts[6])
        p.assert_zero(p.mul(mask, prod))
        bsum = p.add(p.add(bts[4], bts[5]), bts[6])
        p.assert_eq(bsum, mask)
        # per-tag seq contiguity (binds chain order to seq order)
        for t in claims.CHAIN_TAGS:
            p.assert_zero(p.mul(bts[t], p.sub(seq, exp_seq[t])))
            exp_seq[t] = p.add(exp_seq[t], bts[t])
        # one fold per row: select the active tag's chain, fold, write back
        sel0 = sel1 = zero
        for t in claims.CHAIN_TAGS:
            sel0 = p.add(sel0, p.mul(bts[t], chain[t][0]))
            sel1 = p.add(sel1, p.mul(bts[t], chain[t][1]))
        lohi = p.add(lo, p._mul_basis(hi, 1, 1))
        f = _fold_step(p, (sel0, sel1), lohi)
        for t in claims.CHAIN_TAGS:
            chain[t] = _select2(p, bts[t], f, chain[t])
    for i, t in enumerate(claims.CHAIN_TAGS):
        p.assert_eq(exp_seq[t], pub.post_seqs[i])

    # --- assemble the claim wire vector ---
    cw: List[int] = [img_w[0], img_w[1]]
    cw.append(_pack4(p, [pub.pre_pc, pub.post_pc, pub.halted]))
    for i in range(16):
        cw.append(_pack4(p, pub.pre_regs[4 * i : 4 * i + 4]))
    for i in range(16):
        cw.append(_pack4(p, pub.post_regs[4 * i : 4 * i + 4]))
    cw.append(_pack4(p, pub.pre_seqs))
    cw.append(_pack4(p, pub.post_seqs))
    for t in claims.CHAIN_TAGS:
        cw += [pre_chain[t][0], pre_chain[t][1], chain[t][0], chain[t][1]]
    # mem roots: pre = the verified per-segment control root; post = witness
    cw += [res.ctrl_root[0], res.ctrl_root[1], post_mem_w[0], post_mem_w[1]]
    assert len(cw) == claims.CLAIM_WIRES

    d0, d1 = p.hash_packed(cw, claims.CLAIM_ELEMS)
    p.assert_eq(d0, p.pub(0))
    p.assert_eq(d1, p.pub(1))
    p.assert_zero(p.pub(4))
    p.assert_zero(p.pub(5))
    return p


def lift_witness(seg_pub: dict, proof, seg_po2: int,
                 seg_ps: stark.ProofSystem,
                 pre_chains: Optional[dict] = None,
                 program_image_id=None, post_mem_root=None) -> List[tuple]:
    """Witness stream for the lift program."""
    if pre_chains is None:
        pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
    out = programs.serialize_proof(RV_AIR, proof, rv_pub_flat(seg_pub),
                                   seg_po2, seg_ps)
    for t in claims.CHAIN_TAGS:
        out += programs._pack4([int(x) for x in pre_chains[t]])
    out += programs._pack4([int(x) for x in program_image_id])
    out += programs._pack4([int(x) for x in post_mem_root])
    return out


# ---------------------------------------------------------------------------
# join / resolve (children are RecursionAir proofs at the uniform po2)
# ---------------------------------------------------------------------------


def _verify_child(p: vm.Prog, rec_po2: int, rec_ps: stark.ProofSystem):
    """In-circuit verification of one recursion proof; returns
    (pub_wires (6 packed), ctrl_root (2), claim wires (53))."""
    v = programs.StarkVerifier(rair.AIR, rec_po2, rec_ps,
                               pub_len=vm.PUB_VALS, prog=p,
                               bind_pub_groups=False)
    res = v.build()
    pub_w = res.pub_wires  # 6 packed wires == the 6 pub groups
    # the child's allowed-set root must equal ours; spare groups zero
    p.assert_eq(pub_w[2], p.pub(2))
    p.assert_eq(pub_w[3], p.pub(3))
    p.assert_zero(pub_w[4])
    p.assert_zero(pub_w[5])
    # control-root membership in the allowed set
    cur = res.ctrl_root
    for _ in range(claims.ALLOWED_DEPTH):
        sib = (p.input(), p.input())
        b = p.input_bit()
        left = _select2(p, b, sib, cur)
        right = _select2(p, b, cur, sib)
        cur = programs.hash_pair(p, left, right)
    p.assert_eq(cur[0], p.pub(2))
    p.assert_eq(cur[1], p.pub(3))
    # the child's claim, witnessed and bound to its digest
    cwires = [p.input() for _ in range(claims.CLAIM_WIRES)]
    d0, d1 = p.hash_packed(cwires, claims.CLAIM_ELEMS)
    p.assert_eq(d0, pub_w[0])
    p.assert_eq(d1, pub_w[1])
    return pub_w, res.ctrl_root, cwires


def _child_witness(child: "RecReceipt", leaf_index: int,
                   allowed_ids: List[tuple],
                   rec_ps: stark.ProofSystem) -> List[tuple]:
    """Witness stream for one _verify_child call."""
    out = programs.serialize_proof(rair.AIR, child.proof,
                                   list(child.pub_vals), child.po2, rec_ps)
    path = claims.allowed_set_path(allowed_ids, leaf_index)
    idx = leaf_index
    for lvl in range(claims.ALLOWED_DEPTH):
        out += programs._pack4([int(x) for x in path[lvl]])
        out.append(((idx >> lvl) & 1, 0, 0, 0))
    elems = child.claim.to_elems()
    out += programs._pack4(elems)
    return out


def _own_pub_pins(p: vm.Prog, claim_wires: List[int]):
    """Pin own pub groups 0-1 to the claim digest and 4-5 to zero."""
    d0, d1 = p.hash_packed(claim_wires, claims.CLAIM_ELEMS)
    p.assert_eq(d0, p.pub(0))
    p.assert_eq(d1, p.pub(1))
    p.assert_zero(p.pub(4))
    p.assert_zero(p.pub(5))


def build_join(rec_po2: int, rec_ps: stark.ProofSystem) -> vm.Prog:
    """The join program: two child recursion proofs + claim chaining.

    Witness order: child L (_child_witness), child R, nothing else.
    """
    p = vm.Prog(f"join-p{rec_po2}q{rec_ps.queries}e{rec_ps.commit_expand}")
    _, _, L = _verify_child(p, rec_po2, rec_ps)
    _, _, R = _verify_child(p, rec_po2, rec_ps)

    # continuity
    p.assert_eq(L[W_IMG[0]], R[W_IMG[0]])
    p.assert_eq(L[W_IMG[1]], R[W_IMG[1]])
    p.assert_zero(p.pick(L[W_PC], 2))  # left not halted
    p.assert_eq(p.pick(L[W_PC], 1), p.pick(R[W_PC], 0))  # post_pc == pre_pc
    for i in range(16):
        p.assert_eq(L[W_POST_REGS][i], R[W_PRE_REGS][i])
    p.assert_eq(L[W_POST_SEQS], R[W_PRE_SEQS])
    for t in claims.CHAIN_TAGS:
        pre0, post0 = W_CHAINS[t]
        p.assert_eq(L[post0], R[pre0])
        p.assert_eq(L[post0 + 1], R[pre0 + 1])
    p.assert_eq(L[W_POST_MEM[0]], R[W_PRE_MEM[0]])
    p.assert_eq(L[W_POST_MEM[1]], R[W_PRE_MEM[1]])

    # joined claim
    J = list(L)
    J[W_PC] = _pack4(p, [p.pick(L[W_PC], 0), p.pick(R[W_PC], 1),
                         p.pick(R[W_PC], 2)])
    J[W_POST_REGS] = R[W_POST_REGS]
    J[W_POST_SEQS] = R[W_POST_SEQS]
    for t in claims.CHAIN_TAGS:
        _, post0 = W_CHAINS[t]
        J[post0], J[post0 + 1] = R[post0], R[post0 + 1]
    J[W_POST_MEM[0]], J[W_POST_MEM[1]] = R[W_POST_MEM[0]], R[W_POST_MEM[1]]
    _own_pub_pins(p, J)
    return p


def build_resolve(rec_po2: int, rec_ps: stark.ProofSystem) -> vm.Prog:
    """The resolve program: pop one assumption from a conditional claim.

    Witness order: conditional child (_child_witness), assumption child,
    then 2 packed wires = the 8-back assumptions-chain value.
    """
    p = vm.Prog(f"resolve-p{rec_po2}q{rec_ps.queries}e{rec_ps.commit_expand}")
    _, _, C = _verify_child(p, rec_po2, rec_ps)
    apub, _, A = _verify_child(p, rec_po2, rec_ps)

    # the assumption receipt must itself be fully resolved
    pre0, post0 = W_CHAINS[6]
    p.assert_eq(A[post0], A[pre0])
    p.assert_eq(A[post0 + 1], A[pre0 + 1])

    # pop: re-derive the top 8 folds (the assumption's claim digest words)
    prev = (p.input(), p.input())
    # digest words = components of the assumption child's pub groups 0-1;
    # split each into 16-bit limbs (decompose gives canonical 31 bits)
    h = prev
    for w in range(8):
        src = apub[0] if w < 4 else apub[1]
        bits = p.decompose(src, w % 4, nbits=31)
        lo = None
        hi = None
        for i, b in enumerate(bits):
            t = p.gen(b, ca=pow(2, i if i < 16 else i - 16, P))
            if i < 16:
                lo = t if lo is None else p.add(lo, t)
            else:
                hi = t if hi is None else p.add(hi, t)
        lohi = p.add(lo, p._mul_basis(hi, 1, 1))
        h = _fold_step(p, h, lohi)
    cpre0, cpost0 = W_CHAINS[6]
    p.assert_eq(h[0], C[cpost0])
    p.assert_eq(h[1], C[cpost0 + 1])

    # resolved claim: conditional with the popped chain
    Rv = list(C)
    Rv[cpost0], Rv[cpost0 + 1] = prev[0], prev[1]
    _own_pub_pins(p, Rv)
    return p


# ---------------------------------------------------------------------------
# The system: programs, control IDs, receipts
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SuccinctParams:
    seg_po2: int
    seg_ps: stark.ProofSystem
    rec_po2: int  # uniform recursion proof size (must fit every program)
    rec_ps: stark.ProofSystem


@dataclasses.dataclass
class RecReceipt:
    """A constant-size recursion receipt: one RecursionAir STARK whose
    public values bind (claim digest, allowed root, 0)."""

    kind: str  # lift/join/resolve
    proof: stark.SegmentProof
    claim: claims.Claim
    pub_vals: tuple  # 24 canonical scalars
    po2: int

    def claim_digest(self) -> tuple:
        return self.claim.digest()


class SuccinctError(Exception):
    pass


PROGRAM_KINDS = ("lift", "join", "resolve")


class SuccinctSystem:
    """Builds and runs the recursion program set for one parameterization.

    Program construction and XLA compilation are cached per params (the
    same compiled RecursionAir prover serves lift/join/resolve — only the
    ROM differs, and it is a prover *argument*).
    """

    def __init__(self, params: SuccinctParams):
        self.params = params
        n = 1 << params.rec_po2
        self.progs: Dict[str, vm.Prog] = {
            "lift": build_lift(params.seg_po2, params.seg_ps),
            "join": build_join(params.rec_po2, params.rec_ps),
            "resolve": build_resolve(params.rec_po2, params.rec_ps),
        }
        for name, prog in self.progs.items():
            if len(prog.rows) >= n:
                raise SuccinctError(
                    f"{name} program has {len(prog.rows)} rows; "
                    f"rec_po2={params.rec_po2} too small")
            prog.finalize(n)
        self.roms = {k: rair.rom_trace(pr, n) for k, pr in self.progs.items()}
        self.control_ids = {
            k: tuple(int(x) for x in F.from_mont(stark.control_root_of(
                rair.AIR, params.rec_po2, self.roms[k], params.rec_ps)))
            for k in PROGRAM_KINDS}
        self.allowed_ids = [self.control_ids[k] for k in PROGRAM_KINDS]
        self.allowed_root = claims.allowed_set_root(self.allowed_ids)
        # one compiled RecursionAir prover/verifier serves all programs
        self._prover = stark.make_prover(rair.AIR, params.rec_po2,
                                         params.rec_ps)
        self._verifier = stark.make_verifier(rair.AIR, params.rec_po2,
                                             params.rec_ps)

    # -- proving ------------------------------------------------------------

    def _pub_vals(self, claim: claims.Claim) -> tuple:
        return tuple(list(claim.digest()) + list(self.allowed_root)
                     + [0] * 8)

    def _prove(self, kind: str, inputs, claim: claims.Claim) -> RecReceipt:
        pub_vals = self._pub_vals(claim)
        prog = self.progs[kind]
        data = rair.data_trace(prog, inputs, pub_vals)
        proof = self._prover(data, rair.pub_array(pub_vals),
                             self.roms[kind])
        return RecReceipt(kind=kind, proof=proof, claim=claim,
                          pub_vals=pub_vals, po2=self.params.rec_po2)

    def lift(self, seg_receipt, pre_chains: Optional[dict] = None,
             program_image_id=None, post_mem_root=None) -> RecReceipt:
        """Segment receipt -> recursion receipt (reference prove.rs:95).

        RAM continuity: `seg_receipt.image_id` is the control root of the
        segment's own memory table and becomes claim.pre_mem_root (bound
        in-circuit). `program_image_id` is the session's program identity
        (defaults to the segment's root — exact for segment 0 / single-
        table guests); `post_mem_root` is the post-memory table's root
        (defaults to the pre root — exact for write-free segments).
        """
        if pre_chains is None:
            pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
        if program_image_id is None:
            program_image_id = seg_receipt.image_id
        if post_mem_root is None:
            post_mem_root = seg_receipt.image_id
        claim = claims.Claim.of_segment(
            program_image_id, seg_receipt.pub, pre_chains,
            pre_mem_root=seg_receipt.image_id, post_mem_root=post_mem_root)
        wit = lift_witness(seg_receipt.pub, seg_receipt.proof,
                           self.params.seg_po2, self.params.seg_ps,
                           pre_chains, program_image_id, post_mem_root)
        return self._prove("lift", wit, claim)

    def _kind_index(self, kind: str) -> int:
        return PROGRAM_KINDS.index(kind)

    def join(self, left: RecReceipt, right: RecReceipt) -> RecReceipt:
        """Pairwise join (reference join.rs:53)."""
        claim = left.claim.join(right.claim)
        wit = (_child_witness(left, self._kind_index(left.kind),
                              self.allowed_ids, self.params.rec_ps)
               + _child_witness(right, self._kind_index(right.kind),
                                self.allowed_ids, self.params.rec_ps))
        return self._prove("join", wit, claim)

    def resolve(self, conditional: RecReceipt, assumption: RecReceipt,
                prev_chain: Sequence[int]) -> RecReceipt:
        """Pop the top assumption (reference resolve.rs:85). `prev_chain`
        is the conditional claim's assumptions chain *before* the
        discharged digest was folded (host-tracked; see
        claims.assumption_chain_prefixes)."""
        claim = conditional.claim.resolve(assumption.claim.digest(),
                                          prev_chain)
        wit = (_child_witness(conditional,
                              self._kind_index(conditional.kind),
                              self.allowed_ids, self.params.rec_ps)
               + _child_witness(assumption,
                                self._kind_index(assumption.kind),
                                self.allowed_ids, self.params.rec_ps))
        wit += programs._pack4([int(x) for x in prev_chain])
        return self._prove("resolve", wit, claim)

    # -- verification ---------------------------------------------------

    def verify(self, r: RecReceipt) -> bool:
        """Constant-work verification: one STARK + public-value binding."""
        if r.kind not in self.control_ids:
            return False
        expected = self._pub_vals(r.claim)
        if tuple(r.pub_vals) != expected:
            return False
        root = F.fp(np.asarray(self.control_ids[r.kind], dtype=np.int64))
        ok = self._verifier(r.proof, rair.pub_array(r.pub_vals), root)
        return bool(ok)


@functools.lru_cache(maxsize=4)
def get_system(params: SuccinctParams) -> SuccinctSystem:
    return SuccinctSystem(params)


class DevModeSystem:
    """Fake-receipt recursion system (reference `RISC0_DEV_MODE=true`,
    SURVEY.md §4): claims are derived and chained exactly as the real
    SuccinctSystem — same digests, same pop/fold semantics — but receipts
    carry no proof and `verify` checks only the claim/public binding.
    Instant and NOT sound; exists so the cluster pipeline, scheduler, and
    market layers can be exercised without proving (the reference runs
    its whole CI this way)."""

    DEV_ROOT = tuple(range(101, 109))  # sentinel allowed root

    def __init__(self):
        self.allowed_root = self.DEV_ROOT

    def _pub_vals(self, claim: claims.Claim) -> tuple:
        return tuple(list(claim.digest()) + list(self.allowed_root)
                     + [0] * 8)

    def _receipt(self, kind: str, claim: claims.Claim) -> RecReceipt:
        return RecReceipt(kind=kind, proof=None, claim=claim,
                          pub_vals=self._pub_vals(claim), po2=0)

    def lift(self, seg_receipt, pre_chains: Optional[dict] = None,
             program_image_id=None, post_mem_root=None) -> RecReceipt:
        if pre_chains is None:
            pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
        if program_image_id is None:
            program_image_id = seg_receipt.image_id
        if post_mem_root is None:
            post_mem_root = seg_receipt.image_id
        claim = claims.Claim.of_segment(
            program_image_id, seg_receipt.pub, pre_chains,
            pre_mem_root=seg_receipt.image_id, post_mem_root=post_mem_root)
        return self._receipt("lift", claim)

    def join(self, left: RecReceipt, right: RecReceipt) -> RecReceipt:
        return self._receipt("join", left.claim.join(right.claim))

    def resolve(self, conditional: RecReceipt, assumption: RecReceipt,
                prev_chain: Sequence[int]) -> RecReceipt:
        a = assumption.claim
        if a.post_assumptions != a.pre_assumptions:
            raise SuccinctError("assumption receipt itself unresolved")
        return self._receipt("resolve", conditional.claim.resolve(
            assumption.claim.digest(), prev_chain))

    def verify(self, r: RecReceipt) -> bool:
        return (r.proof is None
                and tuple(r.pub_vals) == self._pub_vals(r.claim))


# ---------------------------------------------------------------------------
# Session receipt (constant-size finalize; reference finalize.rs:56)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SuccinctSessionReceipt:
    """Constant-size session receipt: one recursion STARK + the journal.

    The journal bytes are bound to the root claim by refolding their
    words into the journal chain (claims.fold_words) and comparing with
    `claim.post_journal`; genesis/halt conditions pin the span to a full
    session. Mirrors the reference's `Receipt::new(InnerReceipt::
    Succinct(root), journal)` + `verify(image_id)` at
    `prover/crates/workflow/src/tasks/finalize.rs:56-69`.
    """

    root: RecReceipt
    journal: bytes
    image_id: tuple
    entry_pc: int

    def journal_words(self) -> List[int]:
        assert len(self.journal) % 4 == 0
        return [int.from_bytes(self.journal[i : i + 4], "little")
                for i in range(0, len(self.journal), 4)]


def finalize_session(root: RecReceipt, journal_words: Sequence[int],
                     entry_pc: int) -> SuccinctSessionReceipt:
    """Root recursion receipt -> session receipt.

    `journal_words`: the guest's committed 32-bit words (the executor's
    journal output); checked against the claim's journal chain here and
    again at verify time.
    """
    c = root.claim
    if not c.halted:
        raise SuccinctError("finalize: session did not halt")
    if not c.is_genesis(entry_pc):
        raise SuccinctError("finalize: span does not start at genesis")
    if c.post_assumptions != claims.ZERO_CHAIN:
        raise SuccinctError("finalize: unresolved assumptions")
    words = [int(w) for w in journal_words]
    if claims.fold_words(claims.ZERO_CHAIN, words) != c.post_journal:
        raise SuccinctError("finalize: journal does not match claim chain")
    journal = b"".join(w.to_bytes(4, "little") for w in words)
    return SuccinctSessionReceipt(root=root, journal=journal,
                                  image_id=c.image_id, entry_pc=entry_pc)


def verify_session(s: SuccinctSessionReceipt, system: SuccinctSystem,
                   expected_image_id=None) -> bool:
    """Constant-work session verification: one recursion STARK + claim
    genesis/halt/journal binding."""
    c = s.root.claim
    if expected_image_id is not None and tuple(
            int(x) for x in expected_image_id) != c.image_id:
        return False
    if c.image_id != tuple(int(x) for x in s.image_id):
        return False
    if not c.halted or not c.is_genesis(s.entry_pc):
        return False
    if c.post_assumptions != claims.ZERO_CHAIN:
        return False
    if len(s.journal) % 4:
        return False
    if claims.fold_words(claims.ZERO_CHAIN, s.journal_words()) \
            != c.post_journal:
        return False
    return system.verify(s.root)
