"""Cross-process cluster: HTTP worker plane, multi-process e2e, kill -9.

Reference parity targets: worker claim/done/retry endpoints
(`prover/crates/api/src/lib.rs:922-1042`), asset/hot-store client
(`prover/crates/workflow/src/assets.rs:14-120`), and the lease-requeue
worker-death recovery (SURVEY §5.3: timeout-based, no heartbeats).
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request

import pytest

from boundless_tpu.cluster import remote
from boundless_tpu.cluster.agent import Agent, ClusterContext
from boundless_tpu.cluster.api import BentoClient, ClusterApi, make_http_server
from boundless_tpu.cluster.hotstore import HotStore
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.cluster.taskdb import MemoryBackend, TaskState
from boundless_tpu.recursion import succinct as S
from boundless_tpu.zkvm import guests, prove

PO2 = 8


def start_server(**ctx_kw):
    ctx_kw.setdefault("succinct", None)  # legacy v1 unless specified
    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(),
                         store=SharedFs(), ps=prove.TEST_PS,
                         segment_po2=PO2, **ctx_kw)
    api = ClusterApi(ctx)
    server, thread = make_http_server(api)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    return ctx, api, server, url


def test_remote_fabric_planes():
    """Hot-store / object-store / config over HTTP, zero shared memory."""
    ctx, api, server, url = start_server(succinct=S.DevModeSystem(),
                                         dev_mode=True)
    try:
        rctx = remote.connect(url)
        assert rctx.segment_po2 == PO2
        assert rctx.dev_mode is True
        assert hasattr(rctx.succinct, "DEV_ROOT")
        assert rctx.ps == prove.TEST_PS

        rctx.hot.set("job:x:segments:0", {"n": 3, "blob": b"\x01\x02"})
        assert rctx.hot.get("job:x:segments:0") == {"n": 3,
                                                    "blob": b"\x01\x02"}
        rctx.hot.delete("job:x:segments:0")
        assert rctx.hot.get("job:x:segments:0") is None

        rctx.store.put_bytes("inputs", "i", b"raw")
        assert rctx.store.get_bytes("inputs", "i") == b"raw"
        assert rctx.store.exists("inputs", "i")
        assert not rctx.store.exists("inputs", "nope")
        img = guests.echo()
        rctx.store.put("elfs", "echo", img)
        back = rctx.store.get("elfs", "echo")
        assert back.words == img.words and back.entry == img.entry
    finally:
        server.shutdown()


def test_remote_workers_complete_session():
    """Remote (HTTP-attached) agents complete a dev-mode proving session;
    the receipt crosses the wire in the versioned format."""
    ctx, api, server, url = start_server(succinct=S.DevModeSystem(),
                                         dev_mode=True)
    agents = []
    try:
        rctx = remote.connect(url)
        client = BentoClient(url)
        client.upload_image("echo", guests.echo())
        payload = [5, 6]
        client.upload_input("in0", guests.words([len(payload)] + payload))
        job = client.create_session("echo", "in0", segment_po2=PO2)
        for stream in ("exec", "prove", "join", "aux"):
            a = Agent(rctx, stream, f"r-{stream}")
            agents.append(a)
            threading.Thread(target=a.poll_work, args=(120.0,),
                             daemon=True).start()
        st = client.wait(job, timeout=120)
        assert st["status"] == "SUCCEEDED", st
        session = client.receipt(job)
        assert session.journal == guests.words(payload)
        assert type(session).__name__ == "SuccinctSessionReceipt"
    finally:
        for a in agents:
            a.stop()
        server.shutdown()


def _worker_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # keep worker subprocesses off the TPU relay (axon registers itself
    # from sitecustomize whenever this var is present)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.mark.slow
def test_multiprocess_proving_session():
    """Two worker OS processes (zero shared memory) complete a session.

    Mirrors the reference's API-mediated GPU workers: the only fabric is
    HTTP (`workflow/src/lib.rs:37-49`). Slow suite: each fresh worker
    process may pay a cold XLA compile (the persistent cache's AOT
    entries are machine-feature-keyed and not always reusable across
    processes on this host).
    """
    ctx, api, server, url = start_server(succinct=S.DevModeSystem(),
                                         dev_mode=True)
    procs = []
    try:
        client = BentoClient(url)
        client.upload_image("echo", guests.echo())
        payload = [9, 8, 7]
        client.upload_input("in0", guests.words([len(payload)] + payload))
        job = client.create_session("echo", "in0", segment_po2=PO2)
        for streams in ("exec,aux", "prove,join"):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "boundless_tpu.cluster.remote",
                 "--api-url", url, "--stream", streams,
                 "--idle-timeout", "400"],
                env=_worker_env(), stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE))
        st = client.wait(job, timeout=600)
        assert st["status"] == "SUCCEEDED", (
            st, [p.stderr.read()[-500:] if p.poll() is not None else b""
                 for p in procs])
        session = client.receipt(job)
        assert session.journal == guests.words(payload)
    finally:
        for p in procs:
            p.kill()
            p.wait()
        server.shutdown()


def test_kill9_worker_lease_requeue():
    """kill -9 a worker mid-task: the lease expires, the aux requeue cron
    re-readies the task, and a second worker completes it (reference
    requeue_tasks, `workflow/src/lib.rs:803-819`)."""
    ctx, api, server, url = start_server()
    try:
        # one job whose single task has a short lease
        job = ctx.db.create_job("prove", {"kind": "raw"}, timeout_secs=1.0)

        # victim: claims the task over plain HTTP, then hangs forever
        victim_src = (
            "import json,sys,time,urllib.request\n"
            f"req=urllib.request.Request('{url}/workers/tasks/claim/prove',"
            "data=json.dumps({'worker_id':'victim'}).encode(),"
            "method='POST')\n"
            "out=json.load(urllib.request.urlopen(req))\n"
            "assert out['task'] is not None, out\n"
            "print('claimed', flush=True)\n"
            "time.sleep(3600)\n")
        victim = subprocess.Popen([sys.executable, "-c", victim_src],
                                  stdout=subprocess.PIPE)
        assert victim.stdout.readline().strip() == b"claimed"
        task = ctx.db.tasks[(job, "init")]
        assert task.state == TaskState.RUNNING

        os.kill(victim.pid, signal.SIGKILL)
        victim.wait()

        # lease expiry + requeue
        time.sleep(1.1)
        out = api.worker_maintenance({"op": "requeue"})
        assert out["requeued"] == 1
        assert task.state == TaskState.READY

        # survivor claims and completes it over HTTP
        def post(path, obj):
            req = urllib.request.Request(url + path,
                                         data=json.dumps(obj).encode(),
                                         method="POST")
            return json.load(urllib.request.urlopen(req))

        claimed = post("/workers/tasks/claim/prove",
                       {"worker_id": "survivor"})
        assert claimed["task"]["task_id"] == "init"
        assert claimed["task"]["retries"] == 1  # the kill cost one retry
        post("/workers/tasks/done",
             dict(job_id=job, task_id="init", output={"ok": True}))
        assert ctx.db.job_state(job)["state"].value == "done"
    finally:
        server.shutdown()


@pytest.mark.slow
def test_multiprocess_real_proof_session():
    """Real segment STARKs + real succinct recursion across OS-process
    boundaries (round-2 verdict #9: no real-proof session had ever
    crossed a process boundary). Params match the heap slow test so the
    worker subprocesses hit the shared persistent compile cache."""
    from boundless_tpu.prover import stark as _stark
    from boundless_tpu.recursion.succinct import SuccinctParams, get_system

    ps = _stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)
    system = get_system(SuccinctParams(seg_po2=8, seg_ps=ps,
                                       rec_po2=17, rec_ps=ps))
    ctx, api, server, url = start_server(succinct=system)
    ctx.ps = ps
    ctx.segment_po2 = 8
    procs = []
    try:
        client = BentoClient(url)
        client.upload_image("echo", guests.echo())
        payload = [3, 1, 4]
        client.upload_input("in0", guests.words([len(payload)] + payload))
        job = client.create_session("echo", "in0", segment_po2=8)
        for streams in ("exec,aux", "prove,join"):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "boundless_tpu.cluster.remote",
                 "--api-url", url, "--stream", streams,
                 "--idle-timeout", "2400"],
                env=_worker_env(), stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE))
        st = client.wait(job, timeout=3000, poll=1.0)
        assert st["status"] == "SUCCEEDED", (
            st, [p.stderr.read()[-800:] if p.poll() is not None else b""
                 for p in procs])
        session = client.receipt(job)
        assert session.journal == guests.words(payload)
        # the receipt is a REAL succinct session receipt
        from boundless_tpu.recursion import succinct as S_

        assert isinstance(session, S_.SuccinctSessionReceipt)
        assert session.root.proof is not None
        assert S_.verify_session(session, system)
    finally:
        for p in procs:
            p.kill()
            p.wait()
        server.shutdown()


def test_api_keys_and_session_ownership():
    """Per-user API keys (reference prover/crates/api/src/helpers.rs:16-24):
    keyless requests are rejected; sessions are owned by the resolved
    user; another user's key cannot read status or receipts."""
    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(),
                         store=SharedFs(), ps=prove.TEST_PS,
                         segment_po2=PO2, succinct=None)
    api = ClusterApi(ctx, api_keys={"k-alice": "alice", "k-bob": "bob"})
    server, thread = make_http_server(api)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        alice = BentoClient(url, api_key="k-alice")
        bob = BentoClient(url, api_key="k-bob")
        nobody = BentoClient(url)

        image = guests.echo()
        img_id = alice.upload_image("echo", image)
        inp_id = alice.upload_input("i0", guests.words([2, 7, 9]))
        sid = alice.create_session(img_id, inp_id, execute_only=True)
        assert ctx.db.job_user(sid) == "alice"
        # owner can read status; other keys cannot
        assert alice.session_status(sid)["status"] in ("RUNNING", "SUCCEEDED")
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            bob.session_status(sid)
        assert ei.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            nobody.create_session(img_id, inp_id)
        assert ei.value.code == 401
    finally:
        server.shutdown()
