"""Cross-segment RAM continuity (VERDICT #2).

A guest that writes heap in segment k and reads it in segment k+1 must
prove: each segment is proven against its OWN memory table
(`zkvm/prove.py _segment_image`), claims carry pre/post memory-table
control roots, joins chain them, and genesis anchors the chain to the
program image (reference continuations: lift claims consumed at
`prover/crates/workflow/src/tasks/prove.rs:68-95`).
"""

import dataclasses

import pytest

from boundless_tpu.cluster.agent import ClusterContext, run_workers
from boundless_tpu.cluster.api import ClusterApi
from boundless_tpu.cluster.hotstore import HotStore
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.cluster.taskdb import MemoryBackend
from boundless_tpu.recursion import claims, succinct
from boundless_tpu.utils import serde
from boundless_tpu.zkvm import guests, prove
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


def test_heap_segments_witness_against_own_tables():
    """Each segment's witness replays against its own pre-memory image."""
    from boundless_tpu.zkvm import witness
    from boundless_tpu.zkvm.prove import _segment_image

    img, res = _run_heap_guest()
    for seg in res.segments:
        witness.trace_segment(_segment_image(img, seg), seg, PO2)
    # the last segment is NOT provable against the program image
    # (its first heap access is a read of a word written in segment 0)
    from boundless_tpu.zkvm.executor import GuestFault

    with pytest.raises(GuestFault):
        witness.trace_segment(img, res.segments[-1], PO2)


def _dev_lift_all(img, res, sys_):
    """Dev-mode lift of every segment with the RAM-continuity slots."""
    program_id = prove.image_id_of(img, PO2, prove.TEST_PS)
    receipts = []
    pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
    for k, seg in enumerate(res.segments):
        sr = prove.dev_receipt(img, seg, ps=prove.TEST_PS)
        if seg.post_mem == seg.pre_mem:
            post_root = sr.image_id
        else:
            post_root = prove.mem_root(img, seg.post_mem, PO2,
                                       prove.TEST_PS)
        receipts.append(sys_.lift(sr, dict(pre_chains), program_id,
                                  post_root))
        pre_chains = {4: receipts[-1].claim.post_journal,
                      5: receipts[-1].claim.post_input,
                      6: receipts[-1].claim.post_assumptions}
    return program_id, receipts


def test_claim_mem_roots_chain_and_join():
    img, res = _run_heap_guest()
    sys_ = succinct.DevModeSystem()
    program_id, receipts = _dev_lift_all(img, res, sys_)

    # per-segment roots: genesis table IS the program image; later
    # segments' tables differ (heap word present)
    c0 = receipts[0].claim
    assert tuple(c0.pre_mem_root) == tuple(c0.image_id)
    assert c0.post_mem_root != c0.pre_mem_root  # heap write changed the table
    for left, right in zip(receipts, receipts[1:]):
        assert left.claim.post_mem_root == right.claim.pre_mem_root

    # join chains through; session finalizes and verifies
    cur = receipts[0]
    for r in receipts[1:]:
        cur = sys_.join(cur, r)
    session = succinct.finalize_session(
        cur, [int.from_bytes(res.journal[i : i + 4], "little")
              for i in range(0, len(res.journal), 4)], entry_pc=img.entry)
    assert succinct.verify_session(session, sys_,
                                   expected_image_id=program_id)
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


def test_non_genesis_table_cannot_finalize():
    """A span starting from a non-program memory table fails genesis."""
    img, res = _run_heap_guest()
    sys_ = succinct.DevModeSystem()
    program_id, receipts = _dev_lift_all(img, res, sys_)
    # forge the genesis claim's pre_mem_root away from the image id
    bad = dataclasses.replace(
        receipts[0], claim=dataclasses.replace(
            receipts[0].claim, pre_mem_root=tuple([3] * 8)))
    assert not bad.claim.is_genesis(img.entry)
    cur = bad
    with pytest.raises(succinct.SuccinctError):
        succinct.finalize_session(
            cur, [0], entry_pc=img.entry)


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
    boundary — the flagship continuations story, proven end to end."""
    img, res = _run_heap_guest()
    params = succinct.SuccinctParams(
        seg_po2=PO2,
        seg_ps=prove.stark.ProofSystem(queries=2, fri_min_degree=16,
                                       commit_expand=2),
        rec_po2=16,
        rec_ps=prove.stark.ProofSystem(queries=2, fri_min_degree=16,
                                       commit_expand=2))
    sys_ = succinct.get_system(params)
    program_id = prove.image_id_of(img, PO2, params.seg_ps)
    pre_chains = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
    receipts = []
    for seg in res.segments:
        sr = prove.prove_segment(img, seg, ps=params.seg_ps)
        if seg.post_mem == seg.pre_mem:
            post_root = sr.image_id
        else:
            post_root = prove.mem_root(img, seg.post_mem, PO2,
                                       params.seg_ps)
        r = sys_.lift(sr, dict(pre_chains), program_id, post_root)
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
              for i in range(0, len(res.journal), 4)], entry_pc=img.entry)
    assert succinct.verify_session(session, sys_,
                                   expected_image_id=program_id)
