"""Recursion layer: lift/join/resolve/finalize over real segment proofs.

Covers BASELINE configs 2 (multi-segment lift/join) and 4 (composition
with resolve) at test parameters.
"""

import pytest

from boundless_tpu.prover import stark
from boundless_tpu.recursion import receipt as rec
from boundless_tpu.zkvm import guests, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = 8
PS = prove.TEST_PS


def run_session(image, input_bytes):
    ex = Executor(image, input_bytes, segment_po2=PO2)
    return ex.run()


@pytest.mark.slow
def test_multi_segment_lift_join_finalize():
    # loop sized to span multiple segments at po2 8 (config 2 shape)
    iters = 400
    res = run_session(guests.loop_guest(), guests.words([iters]))
    assert len(res.segments) >= 2
    lifted = [rec.lift(prove.prove_segment(guests.loop_guest(), s, ps=PS),
                       ps=PS, pre_mem=s.pre_mem) for s in res.segments]
    root = lifted[0]
    for r in lifted[1:]:
        root = rec.join(root, r)
    session = rec.SessionReceipt.finalize(root, guests.loop_guest().entry)
    assert session.journal == guests.words([iters])
    assert session.verify(ps=PS)
    # wrong image id rejected
    assert not session.verify(
        ps=PS, expected_image_id=[0] * 8)
    assert session.verify(ps=PS, expected_image_id=list(session.image_id))


@pytest.mark.slow
def test_join_rejects_discontinuity():
    res = run_session(guests.loop_guest(), guests.words([400]))
    assert len(res.segments) >= 2
    a = rec.lift(prove.prove_segment(guests.loop_guest(), res.segments[0],
                                     ps=PS), ps=PS,
                 pre_mem=res.segments[0].pre_mem)
    with pytest.raises(rec.RecursionError):
        rec.join(a, a)  # same span twice: state discontinuity


@pytest.mark.slow
def test_composition_resolve():
    """identity guest VERIFYs a claim digest proven by an echo session
    (config 4: proof composition with resolve)."""
    payload = [5]
    echo_res = run_session(guests.echo(), guests.words([1] + payload))
    echo_lift = rec.lift(prove.prove_segment(guests.echo(),
                                             echo_res.segments[0], ps=PS),
                         ps=PS, pre_mem=echo_res.segments[0].pre_mem)
    digest = echo_lift.claim_digest()
    dw = [int.from_bytes(digest[i:i+4], "little") for i in range(0, 32, 4)]
    id_res = run_session(guests.identity(), guests.words(dw))
    id_lift = rec.lift(prove.prove_segment(guests.identity(),
                                           id_res.segments[0], ps=PS), ps=PS,
                       pre_mem=id_res.segments[0].pre_mem)
    assert id_lift.claim.assumption_digests() == [digest]
    # unresolved conditional receipts do not verify
    assert not rec.verify_succinct(id_lift, PS)
    resolved = rec.resolve(id_lift, [echo_lift])
    assert rec.verify_succinct(resolved, PS)
    # resolving against the wrong receipt fails
    with pytest.raises(rec.RecursionError):
        rec.resolve(id_lift, [id_lift])
