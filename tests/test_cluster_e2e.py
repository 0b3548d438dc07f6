"""Cluster end-to-end: REST API -> taskdb -> agents -> session receipt.

The TPU-native analogue of the reference's bento smoke test
(`prover/crates/bento-client` + sample-guest iteration loads, SURVEY §3.1).
"""

import pickle

from boundless_tpu.utils import serde
import time

import pytest

from boundless_tpu.cluster.agent import Agent, ClusterContext, run_workers
from boundless_tpu.cluster.api import BentoClient, ClusterApi, make_http_server
from boundless_tpu.cluster.hotstore import HotStore
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.cluster.taskdb import MemoryBackend
from boundless_tpu.zkvm import guests, prove

PO2 = 8


def make_ctx():
    return ClusterContext(db=MemoryBackend(), hot=HotStore(),
                          store=SharedFs(), ps=prove.TEST_PS,
                          segment_po2=PO2, succinct=None)


def test_execute_only_session():
    """Preflight-as-a-service path (reference executor crate role)."""
    ctx = make_ctx()
    api = ClusterApi(ctx)
    api.upload_image("echo", serde.dump_image(guests.echo()))
    api.upload_input("in0", guests.words([1, 42]))
    job = api.create_session(dict(img="echo", input="in0",
                                  execute_only=True))["uuid"]
    agent = Agent(ctx, "exec")
    agent.poll_work(idle_timeout=0.3)
    st = api.session_status(job)
    assert st["status"] == "SUCCEEDED", st
    assert st["stats"]["segments"] == 1
    assert st["stats"]["total_cycles"] > 0


@pytest.mark.slow
def test_full_proving_session_over_http():
    ctx = make_ctx()
    api = ClusterApi(ctx)
    server, thread = make_http_server(api)
    thread.start()
    port = server.server_address[1]
    client = BentoClient(f"http://127.0.0.1:{port}")
    threads, agents = run_workers(
        ctx, {"exec": 1, "prove": 2, "join": 1, "aux": 1})
    try:
        payload = [77, 88, 99]
        client.upload_image("echo", guests.echo())
        client.upload_input("in1", guests.words([len(payload)] + payload))
        job = client.create_session("echo", "in1", segment_po2=PO2)
        st = client.wait(job, timeout=400)
        assert st["status"] == "SUCCEEDED", st
        session = client.receipt(job)
        assert session.journal == guests.words(payload)
        assert session.verify(ps=prove.TEST_PS)
        assert client.journal(job) == guests.words(payload)
        metrics = client._req("GET", "/workers/metrics")
        assert b"exec" in metrics
    finally:
        for a in agents:
            a.stop()
        server.shutdown()


@pytest.mark.slow
def test_failed_guest_reports_failure():
    ctx = make_ctx()
    api = ClusterApi(ctx)
    api.upload_image("bad", serde.dump_image(guests.build(".word 0xffffffff")))
    api.upload_input("empty", b"")
    job = api.create_session(dict(img="bad", input="empty"))["uuid"]
    threads, agents = run_workers(ctx, {"exec": 1}, idle_timeout=0.3)
    deadline = time.time() + 20
    while time.time() < deadline:
        if api.session_status(job)["status"] == "FAILED":
            break
        time.sleep(0.1)
    for a in agents:
        a.stop()
    st = api.session_status(job)
    assert st["status"] == "FAILED"
    assert "GuestFault" in (st.get("error_msg") or "")
