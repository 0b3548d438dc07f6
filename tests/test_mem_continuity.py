"""Cross-segment RAM continuity.

A guest that writes heap in segment k and reads it in segment k+1 must
prove: claims carry pre/post sparse PageTree roots (`zkvm/paging.py`),
every touched word's first/final value is PUBLIC (init/final LogUp
ports, `air/rv32im.py`), the lift program DERIVES post_mem_root
in-circuit from those publics, joins chain the roots, and genesis
anchors the chain to the program image's initial memory root (reference
continuations: lift claims consumed at
`prover/crates/workflow/src/tasks/prove.rs:68-95`).
"""

import dataclasses

import numpy as np
import pytest

from boundless_tpu.cluster.agent import ClusterContext, run_workers
from boundless_tpu.cluster.api import ClusterApi
from boundless_tpu.cluster.hotstore import HotStore
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.cluster.taskdb import MemoryBackend
from boundless_tpu.recursion import claims, succinct
from boundless_tpu.utils import serde
from boundless_tpu.zkvm import guests, paging, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = 8

# writes heap in segment 0, burns cycles across the po2-8 boundary,
# reads it back in a later segment, commits it
HEAP_SRC = """
start:
    li s0, 0x20000
    li s1, 12345
    sw s1, 0(s0)
    li s2, 300
burn:
    addi s2, s2, -1
    bne s2, x0, burn
    lw a0, 0(s0)
    li t0, 1
    ecall
    li t0, 0
    li a0, 0
    ecall
"""


def _run_heap_guest():
    img = guests.build(HEAP_SRC)
    ex = Executor(img, b"", segment_po2=PO2)
    res = ex.run()
    assert len(res.segments) >= 2, "guest must cross a segment boundary"
    return img, res


def test_heap_segment_publics_expose_touched_words():
    """Witness gen fills the paging-port publics: the heap word appears
    with its pre (0) and post (12345) values in segment 0, and with
    pre == 12345 in the segment that reads it back."""
    from boundless_tpu.zkvm import witness

    img, res = _run_heap_guest()
    heap_waddr = 0x20000 >> 2
    pg, off = divmod(heap_waddr, 64)

    def slot(seg):
        w = witness.trace_segment(img, seg, PO2)
        mem = np.asarray(w.pub["mem"], dtype=np.int64)
        for e in range(mem.shape[0]):
            if mem[e, 1] and mem[e, 0] == pg:
                base = 2 + 5 * off
                if mem[e, base]:
                    pre = int(mem[e, base + 1]) | (int(mem[e, base + 2]) << 16)
                    post = int(mem[e, base + 3]) | (int(mem[e, base + 4]) << 16)
                    return pre, post
        return None

    first = slot(res.segments[0])
    assert first == (0, 12345)
    last = slot(res.segments[-1])
    assert last == (12345, 12345)


def _dev_lift_all(img, res, sys_):
    """Dev-mode lift of every segment with paging-derived mem roots."""
    program_id = prove.image_id_of(img, PO2, prove.TEST_PS)
    receipts = []
    pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
    for seg in res.segments:
        sr = prove.dev_receipt(img, seg, ps=prove.TEST_PS)
        receipts.append(sys_.lift(sr, dict(pre_chains), seg_index=seg.index,
                                  pre_mem=seg.pre_mem))
        pre_chains = {4: receipts[-1].claim.post_journal,
                      5: receipts[-1].claim.post_input,
                      6: receipts[-1].claim.post_assumptions}
    return program_id, receipts


def test_claim_mem_roots_chain_and_join():
    img, res = _run_heap_guest()
    sys_ = succinct.DevModeSystem()
    program_id, receipts = _dev_lift_all(img, res, sys_)
    anchor = paging.image_root(img)

    # genesis pre root is the image's PageTree root; the heap write
    # changes the root; adjacent claims chain post == pre
    c0 = receipts[0].claim
    assert tuple(c0.pre_mem_root) == tuple(anchor)
    assert c0.post_mem_root != c0.pre_mem_root
    for left, right in zip(receipts, receipts[1:]):
        assert left.claim.post_mem_root == right.claim.pre_mem_root

    # join chains through; session finalizes and verifies
    cur = receipts[0]
    for r in receipts[1:]:
        cur = sys_.join(cur, r)
    session = succinct.finalize_session(
        cur, [int.from_bytes(res.journal[i : i + 4], "little")
              for i in range(0, len(res.journal), 4)], entry_pc=img.entry,
        image_mem_root=anchor)
    assert succinct.verify_session(session, sys_,
                                   expected_image_id=program_id,
                                   expected_mem_root=anchor)
    assert session.journal[:4] == (12345).to_bytes(4, "little")


def test_forged_post_mem_root_rejected_at_join():
    img, res = _run_heap_guest()
    sys_ = succinct.DevModeSystem()
    program_id, receipts = _dev_lift_all(img, res, sys_)
    forged = dataclasses.replace(
        receipts[0], claim=dataclasses.replace(
            receipts[0].claim,
            post_mem_root=tuple([7] * 8)))
    with pytest.raises(AssertionError):
        sys_.join(forged, receipts[1])


def test_non_genesis_root_cannot_finalize():
    """A span starting from a non-image memory root fails genesis."""
    img, res = _run_heap_guest()
    sys_ = succinct.DevModeSystem()
    program_id, receipts = _dev_lift_all(img, res, sys_)
    anchor = paging.image_root(img)
    bad = dataclasses.replace(
        receipts[0], claim=dataclasses.replace(
            receipts[0].claim, pre_mem_root=tuple([3] * 8)))
    assert not bad.claim.is_genesis(img.entry, anchor)
    with pytest.raises(succinct.SuccinctError):
        succinct.finalize_session(bad, [0], entry_pc=img.entry,
                                  image_mem_root=anchor)


def test_page_budget_splits_segments():
    """A guest touching more than MEM_PAGES pages must split segments,
    and every segment's publics stay within the page budget."""
    from boundless_tpu.air.rv32im import MEM_PAGES
    from boundless_tpu.zkvm import witness

    # touch MEM_PAGES + 2 distinct pages (stride 256 bytes = 1 page)
    n_pages = MEM_PAGES + 2
    src = f"""
start:
    li s0, 0x20000
    li s1, {n_pages}
loop:
    sw s1, 0(s0)
    addi s0, s0, 256
    addi s1, s1, -1
    bne s1, x0, loop
    li t0, 0
    li a0, 0
    ecall
"""
    img = guests.build(src)
    res = Executor(img, b"", segment_po2=PO2).run()
    assert len(res.segments) >= 2
    for seg in res.segments:
        w = witness.trace_segment(img, seg, PO2)
        mem = np.asarray(w.pub["mem"], dtype=np.int64)
        assert int(mem[:, 1].sum()) <= MEM_PAGES


def test_cluster_devmode_heap_session():
    """The full cluster pipeline proves the heap-crossing guest
    (dev-mode receipts; real-proof variant in the slow suite)."""
    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(),
                         store=SharedFs(), ps=prove.TEST_PS,
                         segment_po2=PO2,
                         succinct=succinct.DevModeSystem(), dev_mode=True)
    api = ClusterApi(ctx)
    img = guests.build(HEAP_SRC)
    api.upload_image("heap", serde.dump_image(img))
    api.upload_input("in0", b"")
    job = api.create_session(dict(img="heap", input="in0",
                                  segment_po2=PO2))["uuid"]
    threads, agents = run_workers(
        ctx, {"exec": 1, "prove": 2, "join": 1, "aux": 1})
    import time

    deadline = time.time() + 90
    try:
        while time.time() < deadline:
            st = api.session_status(job)
            if st["status"] in ("SUCCEEDED", "FAILED"):
                break
            time.sleep(0.05)
    finally:
        for a in agents:
            a.stop()
    assert st["status"] == "SUCCEEDED", st
    session = api.receipt_obj(job)
    assert session.journal[:4] == (12345).to_bytes(4, "little")


@pytest.mark.slow
def test_heap_session_real_proofs_e2e():
    """Real segment STARKs + real succinct recursion across the heap
    boundary — the flagship continuations story, proven end to end.
    post_mem_root is now DERIVED in-circuit by the lift page walk."""
    img, res = _run_heap_guest()
    params = succinct.SuccinctParams(
        seg_po2=PO2,
        seg_ps=prove.stark.ProofSystem(queries=2, fri_min_degree=16,
                                       commit_expand=2),
        rec_po2=17,
        rec_ps=prove.stark.ProofSystem(queries=2, fri_min_degree=16,
                                       commit_expand=2))
    sys_ = succinct.get_system(params)
    program_id = prove.image_id_of(img, PO2, params.seg_ps)
    anchor = paging.image_root(img)
    pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
    receipts = []
    for seg in res.segments:
        sr = prove.prove_segment(img, seg, ps=params.seg_ps)
        r = sys_.lift(sr, dict(pre_chains), pre_mem=seg.pre_mem,
                      seg_index=seg.index)
        assert sys_.verify(r)
        receipts.append(r)
        pre_chains = {4: r.claim.post_journal, 5: r.claim.post_input,
                      6: r.claim.post_assumptions}
    cur = receipts[0]
    for r in receipts[1:]:
        cur = sys_.join(cur, r)
        assert sys_.verify(cur)
    session = succinct.finalize_session(
        cur, [int.from_bytes(res.journal[i : i + 4], "little")
              for i in range(0, len(res.journal), 4)], entry_pc=img.entry,
        image_mem_root=anchor)
    assert succinct.verify_session(session, sys_,
                                   expected_image_id=program_id,
                                   expected_mem_root=anchor)


@pytest.mark.slow
def test_forged_post_mem_root_unsatisfiable_in_lift():
    """The round-3 soundness closure: a lift witness whose page paths
    imply a different post root cannot satisfy the lift program — the
    claim digest (with the true derived post root) is pinned to the
    public values, so forging post_mem_root changes the digest and the
    circuit rejects."""
    from boundless_tpu.recursion import vm

    img, res = _run_heap_guest()
    seg_ps = prove.stark.ProofSystem(queries=2, fri_min_degree=16,
                                     commit_expand=2)
    seg = res.segments[0]
    sr = prove.prove_segment(img, seg, ps=seg_ps)
    prog = succinct.build_lift(PO2, seg_ps, sr.variant)
    n = 1 << (len(prog.rows) + 1).bit_length()
    prog.finalize(n)
    pre_root, post_root, _ = succinct.paging_walk(sr.pub, seg.pre_mem)
    claim = claims.Claim.of_segment(sr.image_id, sr.pub,
                                    pre_mem_root=pre_root,
                                    post_mem_root=post_root)
    wit = succinct.lift_witness(sr.pub, sr.proof, PO2, seg_ps,
                                pre_mem=seg.pre_mem, variant=sr.variant)
    # honest witness + honest claim: satisfiable
    vm.evaluate_auto(prog, wit, list(claim.digest()) + [0] * 16)
    # forged post root: no witness can satisfy the program for this
    # claim digest (the walk derives the true root from the publics)
    forged = dataclasses.replace(claim, post_mem_root=tuple([9] * 8))
    with pytest.raises(vm.EvalError):
        vm.evaluate_auto(prog, wit, list(forged.digest()) + [0] * 16)
