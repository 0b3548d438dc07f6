"""Multi-host data plane: server-backed taskdb/hot store across processes.

Reference semantics under test: Redis-style server-side atomic verbs
(`prover/crates/taskdb/src/redis_backend.rs`), blocking claims, lease
requeue after worker death, shared hot store, and TWO independent
frontend processes (the "two hosts") driving one job.
"""

import multiprocessing as mp
import os
import signal
import time

from boundless_tpu.cluster.agent import Agent, ClusterContext
from boundless_tpu.cluster.dataplane import (DataPlaneServer, RemoteBackend,
                                             RemoteHotStore, connect)
from boundless_tpu.cluster.storage import SharedFs
from boundless_tpu.utils import serde
from boundless_tpu.zkvm import guests, prove


def _server():
    srv = DataPlaneServer(port=0).start()
    return srv


def test_verbs_roundtrip_and_atomicity():
    srv = _server()
    try:
        db, hot = connect(srv.addr)
        job = db.create_job("exec", {"kind": "t"}, user="alice")
        # create_job seeds the 'init' task (reference create_job semantics)
        t = db.request_work("exec", timeout=1.0)
        assert t is not None and t.task_id == "init"
        # tasks are planned while the claiming task still runs (exec-task
        # incremental planner semantics), then init completes
        db.create_task(job, "t1", "exec", {"n": 1}, [])
        db.update_task_done(job, "init", {})
        t = db.request_work("exec", timeout=1.0)
        assert t is not None and t.task_id == "t1"
        # claims are exclusive: a second claim from another client sees none
        db2 = RemoteBackend(srv.addr)
        assert db2.request_work("exec", timeout=0.0) is None
        db.update_task_done(job, "t1", {"ok": 1})
        assert db2.job_state(job)["state"].value == "done"
        assert db2.task_output(job, "t1") == {"ok": 1}
        # hot store shared across clients
        hot.set("k", {"v": 7}, ttl=60)
        assert RemoteHotStore(srv.addr).get("k") == {"v": 7}
        hot.delete("k")
        assert RemoteHotStore(srv.addr).get("k") is None
    finally:
        srv.shutdown()


def test_dep_decrement_and_retry_over_wire():
    srv = _server()
    try:
        db = RemoteBackend(srv.addr)
        job = db.create_job("exec", {}, user="u")
        init = db.request_work("exec")
        db.create_task(job, "a", "exec", {}, [])
        db.create_task(job, "b", "exec", {}, ["a"], max_retries=1)
        db.update_task_done(job, init.task_id, {})
        assert db.request_work("exec").task_id == "a"
        assert db.request_work("exec") is None  # b still pending
        db.update_task_done(job, "a", {})
        t = db.request_work("exec")
        assert t.task_id == "b"
        assert db.update_task_retry(job, "b", "flake") is True
        t = db.request_work("exec")
        assert t.task_id == "b" and t.retries == 1
        assert db.update_task_retry(job, "b", "flake2") is False
        assert db.job_state(job)["state"].value == "failed"
    finally:
        srv.shutdown()


def _claim_and_die(addr, job):
    db = RemoteBackend(addr)
    t = db.request_work("exec", timeout=2.0)
    assert t is not None
    os.kill(os.getpid(), signal.SIGKILL)  # die holding the lease


def test_lease_requeue_after_remote_worker_death():
    """kill -9 a claiming PROCESS; the lease cron re-readies the task."""
    srv = _server()
    try:
        db = RemoteBackend(srv.addr)
        job = db.create_job("exec", {}, user="u")
        init = db.request_work("exec")
        db.create_task(job, "t", "exec", {}, [], timeout_secs=0.2)
        db.update_task_done(job, init.task_id, {})
        p = mp.get_context("spawn").Process(
            target=_claim_and_die, args=(srv.addr, job))
        p.start()
        p.join(15)
        assert p.exitcode == -signal.SIGKILL
        assert db.request_work("exec") is None  # still leased
        time.sleep(0.25)
        assert db.requeue_expired() == 1
        t = db.request_work("exec", timeout=1.0)
        assert t is not None and t.task_id == "t"
        db.update_task_done(job, "t", {})
        assert db.job_state(job)["state"].value == "done"
    finally:
        srv.shutdown()


def _frontend_host(addr, store_root, out_q):
    """One 'host': its own ClusterContext over the shared data plane,
    running an exec agent (dev-mode, no proving — scheduler semantics)."""
    db, hot = connect(addr)
    ctx = ClusterContext(db=db, hot=hot, store=SharedFs(store_root),
                         ps=prove.TEST_PS, segment_po2=8, succinct=None)
    agent = Agent(ctx, "exec")
    agent.poll_work(idle_timeout=1.5)
    out_q.put("done")


def test_two_host_shared_job():
    """Two separate processes (frontend hosts) share one data plane: host A
    submits the job, host B's agent (or A's) executes it, both observe the
    result — the reference's N-hosts-one-Redis topology."""
    srv = _server()
    store = SharedFs()  # shared artifact plane (SharedFs over NFS analogue)
    try:
        db, hot = connect(srv.addr)
        ctx = ClusterContext(db=db, hot=hot, store=store,
                             ps=prove.TEST_PS, segment_po2=8, succinct=None)
        from boundless_tpu.cluster.api import ClusterApi
        api = ClusterApi(ctx)
        api.upload_image("echo", serde.dump_image(guests.echo()))
        api.upload_input("in0", guests.words([1, 5]))
        job = api.create_session(dict(img="echo", input="in0",
                                      execute_only=True))["uuid"]
        mpc = mp.get_context("spawn")
        q = mpc.Queue()
        p = mpc.Process(target=_frontend_host,
                        args=(srv.addr, store.root, q))
        p.start()
        assert q.get(timeout=60) == "done"
        p.join(10)
        st = api.session_status(job)
        assert st["status"] == "SUCCEEDED", st
        assert st["stats"]["total_cycles"] > 0
    finally:
        srv.shutdown()


def test_sqlite_server_restart_durability(tmp_path):
    """The durability boundary: a sqlite-backed server restarted on the
    same path serves the same jobs/tasks (Postgres-gen analogue); the
    client's transparent reconnect resumes against the new server."""
    db_path = str(tmp_path / "taskdb.sqlite")
    srv = DataPlaneServer(port=0, sqlite_path=db_path).start()
    addr = srv.addr
    db = RemoteBackend(addr)
    job = db.create_job("exec", {"k": 1}, user="u")
    init = db.request_work("exec")
    db.create_task(job, "t", "exec", {}, [])
    db.update_task_done(job, init.task_id, {})
    srv.shutdown()
    # restart on the SAME port so the existing client can reconnect
    srv2 = DataPlaneServer(host=addr[0], port=addr[1],
                           sqlite_path=db_path).start()
    try:
        t = db.request_work("exec", timeout=2.0)  # same client object
        assert t is not None and t.task_id == "t"
        db.update_task_done(job, "t", {})
        assert db.job_state(job)["state"].value == "done"
    finally:
        srv2.shutdown()
