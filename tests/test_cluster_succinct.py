"""Cluster e2e in succinct mode (claim v2 chains) with dev-mode fake
receipts (reference `RISC0_DEV_MODE=true`, SURVEY.md §4): exercises the
full exec -> prove(lift) -> join tree -> resolve -> finalize pipeline
with real claim derivation/chaining but no STARKs, so chain plumbing is
covered fast. The real-proof succinct e2e lives in the slow suite
(tests/test_succinct.py / test_succinct_e2e.py).
"""

import time

from boundless_tpu.cluster.agent import ClusterContext, run_workers
from boundless_tpu.cluster.api import ClusterApi
from boundless_tpu.cluster.hotstore import HotStore
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.cluster.taskdb import MemoryBackend
from boundless_tpu.recursion import claims, succinct
from boundless_tpu.zkvm import guests, prove

PO2 = 8


def make_ctx():
    return ClusterContext(db=MemoryBackend(), hot=HotStore(),
                          store=SharedFs(), ps=prove.TEST_PS,
                          segment_po2=PO2,
                          succinct=succinct.DevModeSystem(),
                          dev_mode=True)


def _run_job(ctx, api, img, input_bytes, timeout=60):
    input_id = f"in-{time.monotonic_ns()}"
    api.upload_input(input_id, input_bytes)
    job = api.create_session(dict(img=img, input=input_id,
                                  segment_po2=PO2))["uuid"]
    threads, agents = run_workers(
        ctx, {"exec": 1, "prove": 2, "join": 1, "aux": 1})
    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            st = api.session_status(job)
            if st["status"] in ("SUCCEEDED", "FAILED"):
                break
            time.sleep(0.05)
    finally:
        for a in agents:
            a.stop()
        for t in threads:
            t.join(timeout=5)
    return job, api.session_status(job)


def test_devmode_multisegment_session():
    """loop guest spanning several po2-8 segments: lift chains + join tree."""
    ctx = make_ctx()
    api = ClusterApi(ctx)
    from boundless_tpu.utils import serde

    api.upload_image("loop", serde.dump_image(guests.loop_guest()))
    job, st = _run_job(ctx, api, "loop", guests.words([900]))
    assert st["status"] == "SUCCEEDED", st
    assert st["stats"]["segments"] > 1
    session = ctx.store.get("receipts/stark", job)
    assert isinstance(session, succinct.SuccinctSessionReceipt)
    assert session.journal == guests.words([900])
    assert succinct.verify_session(session, ctx.succinct)
    c = session.root.claim
    assert c.halted and c.is_genesis(guests.loop_guest().entry)
    assert c.post_journal == claims.fold_words(claims.ZERO_CHAIN, [900])
    assert c.post_input == claims.fold_words(claims.ZERO_CHAIN, [900])


def test_devmode_composition_resolve():
    """identity guest VERIFYing an echo session's claim digest: the
    resolve task pops the assumption against the published receipt."""
    ctx = make_ctx()
    api = ClusterApi(ctx)
    from boundless_tpu.utils import serde

    api.upload_image("echo", serde.dump_image(guests.echo()))
    api.upload_image("identity", serde.dump_image(guests.identity()))
    job1, st1 = _run_job(ctx, api, "echo", guests.words([2, 7, 9]))
    assert st1["status"] == "SUCCEEDED", st1
    echo_session = ctx.store.get("receipts/stark", job1)
    dw = echo_session.root.claim.digest_words()

    job2, st2 = _run_job(ctx, api, "identity", guests.words(dw))
    assert st2["status"] == "SUCCEEDED", st2
    id_session = ctx.store.get("receipts/stark", job2)
    assert succinct.verify_session(id_session, ctx.succinct)
    c = id_session.root.claim
    # all assumptions discharged
    assert c.post_assumptions == claims.ZERO_CHAIN
    # journal = the digest words
    assert id_session.journal == guests.words(dw)


def test_devmode_composition_missing_assumption_fails():
    """resolve fails (job FAILED) when the assumption receipt is absent."""
    ctx = make_ctx()
    api = ClusterApi(ctx)
    from boundless_tpu.utils import serde

    api.upload_image("identity", serde.dump_image(guests.identity()))
    job, st = _run_job(ctx, api, "identity",
                       guests.words(list(range(8))), timeout=25)
    assert st["status"] == "FAILED", st
    assert "no receipt for assumption" in (st.get("error_msg") or "")


def test_devmode_snark_wrap():
    from boundless_tpu.groth16 import wrap as g16wrap
    from boundless_tpu.utils import serde

    ctx = make_ctx()
    api = ClusterApi(ctx)
    api.upload_image("echo", serde.dump_image(guests.echo()))
    job, st = _run_job(ctx, api, "echo", guests.words([1, 5]))
    assert st["status"] == "SUCCEEDED", st
    session = ctx.store.get("receipts/stark", job)
    wrapped = g16wrap.compress(session, system=ctx.succinct)
    assert g16wrap.verify(wrapped, system=ctx.succinct)
    assert wrapped.journal == guests.words([5])
