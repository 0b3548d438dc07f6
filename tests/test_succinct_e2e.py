"""Real-proof succinct recursion e2e (slow): segments -> lift STARKs ->
join STARK -> constant-size session receipt, all verified through the
uniform RecursionAir verifier (no embedded segment proofs anywhere).

This is the TPU-native analogue of the reference's BASELINE config 2
(counter multi-segment lift/join; `prover/crates/workflow/src/tasks/
{prove,join,finalize}.rs`) at CI-scale parameters (seg_po2 8, 2-query
proof systems — NOT production soundness).
"""

import dataclasses

import pytest

from boundless_tpu.prover import stark
from boundless_tpu.recursion import claims, succinct
from boundless_tpu.zkvm import guests, prove
from boundless_tpu.zkvm.executor import Executor

SEG_PO2 = 8
SEG_PS = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)
REC_PO2 = 17  # lift grew past 2^16 with the claim-v3 cpio machinery
REC_PS = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)

PARAMS = succinct.SuccinctParams(seg_po2=SEG_PO2, seg_ps=SEG_PS,
                                 rec_po2=REC_PO2, rec_ps=REC_PS)


@pytest.mark.slow
def test_succinct_lift_join_session():
    system = succinct.get_system(PARAMS)

    # three-segment loop session (join-of-join coverage: the root join's
    # left child is itself a join receipt)
    image = guests.loop_guest()
    ex = Executor(image, guests.words([170]), segment_po2=SEG_PO2)
    res = ex.run()
    assert len(res.segments) == 3

    # per-segment pre-chains (prefix folds; here segment 0 is genesis and
    # the loop guest does all io in segment 1... or segment 0 — derive it)
    from boundless_tpu.cluster.agent import _segment_pre_chains

    meta = _segment_pre_chains(ex, res)

    receipts = []
    for seg in res.segments:
        sr = prove.prove_segment(image, seg, ps=SEG_PS)
        pre = {int(t): tuple(v) for t, v in meta[seg.index].items()}
        receipts.append(system.lift(sr, pre, pre_mem=seg.pre_mem,
                                    seg_index=seg.index))
        assert system.verify(receipts[-1])

    j01 = system.join(receipts[0], receipts[1])
    assert system.verify(j01)
    joined = system.join(j01, receipts[2])
    assert system.verify(joined)
    assert joined.claim.halted

    words = [int.from_bytes(res.journal[i : i + 4], "little")
             for i in range(0, len(res.journal), 4)]
    session = succinct.finalize_session(joined, words, entry_pc=image.entry)
    assert succinct.verify_session(session, system)
    assert session.journal == guests.words([170])

    # tampered proof rejected (bump one word of the first array leaf)
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(joined.proof)
    for i, lf in enumerate(leaves):
        if hasattr(lf, "at") and getattr(lf, "size", 0) > 0:
            leaves[i] = lf.at[(0,) * lf.ndim].add(1)
            break
    bad_proof = jax.tree_util.tree_unflatten(treedef, leaves)
    bad = dataclasses.replace(joined, proof=bad_proof)
    assert not system.verify(bad)

    # claim/pub mismatch rejected
    bad_claim = dataclasses.replace(
        joined, claim=dataclasses.replace(joined.claim, post_pc=1234))
    assert not system.verify(bad_claim)
