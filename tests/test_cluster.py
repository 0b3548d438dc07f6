"""Planner + taskdb scheduler semantics tests (mirrors reference taskdb e2e)."""

import threading
import time

import pytest

from boundless_tpu.cluster.planner import Planner, Kind
from boundless_tpu.cluster import taskdb
from boundless_tpu.cluster.taskdb import (MemoryBackend, SqliteBackend,
                                          TaskState, Priority)


def test_planner_power_of_two():
    p = Planner()
    for i in range(8):
        p.enqueue_segment(i)
    p.finish()
    cmds = p.drain()
    kinds = [c.kind for c in cmds]
    assert kinds.count(Kind.SEGMENT) == 8
    assert kinds.count(Kind.JOIN) == 7
    assert kinds.count(Kind.FINALIZE) == 1
    # deps valid: every join consumes previously-emitted ids
    seen = set()
    for c in cmds:
        for d in c.deps:
            assert d in seen
        seen.add(c.task_id)
    # final join is the root, finalize depends on it
    fin = cmds[-1]
    assert fin.kind == Kind.FINALIZE and fin.deps == (p.root,)


def test_planner_non_power_of_two_and_keccak():
    p = Planner()
    for i in range(5):
        p.enqueue_segment(i)
    for i in range(3):
        p.enqueue_keccak(i)
    p.finish()
    cmds = p.drain()
    kinds = [c.kind for c in cmds]
    assert kinds.count(Kind.SEGMENT) == 5
    assert kinds.count(Kind.JOIN) == 4  # 5 leaves -> 4 joins
    assert kinds.count(Kind.KECCAK) == 3
    assert kinds.count(Kind.UNION) == 2
    fin = cmds[-1]
    assert set(fin.deps) == {p.root, p.keccak_root}


def test_planner_single_segment():
    p = Planner()
    p.enqueue_segment(0)
    p.finish()
    cmds = p.drain()
    assert [c.kind for c in cmds] == [Kind.SEGMENT, Kind.FINALIZE]


@pytest.mark.parametrize("backend_cls", [MemoryBackend, SqliteBackend])
def test_taskdb_dag_flow(backend_cls):
    db = backend_cls()
    job = db.create_job("exec", {"kind": "exec"})
    t = db.request_work("exec")
    assert t.task_id == "init"
    db.create_task(job, "p0", "prove", {"i": 0}, [])
    db.create_task(job, "p1", "prove", {"i": 1}, [])
    db.create_task(job, "j0", "join", {}, ["p0", "p1"])
    db.update_task_done(job, "init", {"segments": 2})

    # join not ready until both proves done
    assert db.request_work("join", timeout=0.05) is None
    a = db.request_work("prove")
    b = db.request_work("prove")
    assert {a.task_id, b.task_id} == {"p0", "p1"}
    db.update_task_done(job, a.task_id, {})
    assert db.request_work("join", timeout=0.05) is None
    db.update_task_done(job, b.task_id, {})
    j = db.request_work("join")
    assert j.task_id == "j0"
    db.update_task_done(job, "j0", {"root": "r"})
    st = db.job_state(job)
    assert st["state"] == taskdb.JobState.DONE
    assert db.task_output(job, "j0") == {"root": "r"}


@pytest.mark.parametrize("backend_cls", [MemoryBackend, SqliteBackend])
def test_taskdb_retry_and_fail(backend_cls):
    db = backend_cls()
    job = db.create_job("prove", {"kind": "prove"}, max_retries=1)
    t = db.request_work("prove")
    assert db.update_task_retry(job, t.task_id, "boom") is True
    t = db.request_work("prove")
    assert t.retries == 1
    assert db.update_task_retry(job, t.task_id, "boom2") is False
    st = db.job_state(job)
    assert st["state"] == taskdb.JobState.FAILED
    assert "boom2" in st["error"]


@pytest.mark.parametrize("backend_cls", [MemoryBackend, SqliteBackend])
def test_taskdb_lease_requeue(backend_cls):
    db = backend_cls()
    job = db.create_job("prove", {}, timeout_secs=0.01)
    t = db.request_work("prove")
    time.sleep(0.05)
    assert db.requeue_expired() == 1
    t2 = db.request_work("prove")
    assert t2.task_id == t.task_id
    # stale first worker completing is ignored (memory backend semantics)
    db.update_task_done(job, t2.task_id, {"ok": 1})
    assert db.job_state(job)["state"] == taskdb.JobState.DONE


def test_taskdb_priorities():
    db = MemoryBackend()
    j1 = db.create_job("prove", {"n": "low"}, priority=Priority.LOW)
    j2 = db.create_job("prove", {"n": "high"}, priority=Priority.HIGH)
    t = db.request_work("prove")
    assert t.definition["n"] == "high"


def test_taskdb_blocking_claim():
    db = MemoryBackend()
    got = []

    def worker():
        got.append(db.request_work("prove", timeout=2.0))

    th = threading.Thread(target=worker)
    th.start()
    time.sleep(0.05)
    db.create_job("prove", {"x": 1})
    th.join(timeout=2)
    assert got and got[0] is not None


def test_stuck_pending_fixer():
    db = MemoryBackend()
    job = db.create_job("exec", {})
    db.create_task(job, "a", "prove", {}, [])
    # simulate inconsistency: mark dep done without decrementing dependents
    db.create_task(job, "b", "join", {}, ["a"])
    t = db.request_work("prove")
    with db._cond:
        db.tasks[(job, "a")].state = TaskState.DONE  # bypass bookkeeping
    assert db.find_stuck_pending() == [(job, "b")]
    assert db.fix_stuck_pending() == 1
    init = db.request_work("exec")
    got = db.request_work("join")
    assert got.task_id == "b"


def test_aux_agent_runs_maintenance_crons():
    """Aux workers requeue expired leases (reference requeue cron)."""
    import threading

    from boundless_tpu.cluster.agent import Agent, ClusterContext
    from boundless_tpu.cluster.hotstore import HotStore
    from boundless_tpu.cluster.storage import SharedFs

    db = MemoryBackend()
    ctx = ClusterContext(db=db, hot=HotStore(ttl=0.01), store=SharedFs(), succinct=None)
    job = db.create_job("prove", {"kind": "x"}, timeout_secs=0.01)
    t = db.request_work("prove")  # lease it, then "die"
    ctx.hot.set("ephemeral", 1)
    aux = Agent(ctx, "aux")
    th = threading.Thread(target=aux.poll_work, args=(2.5,), daemon=True)
    th.start()
    deadline = time.time() + 5
    got = None
    while time.time() < deadline:
        got = db.request_work("prove", timeout=0.1)
        if got is not None:
            break
    aux.stop()
    assert got is not None and got.task_id == t.task_id  # requeued
    assert ctx.hot.get("ephemeral") is None  # TTL purged


@pytest.mark.parametrize("backend_cls", [MemoryBackend, SqliteBackend])
def test_taskdb_fair_share(backend_cls):
    """Per-user reserved share + best-effort weights (reference
    `reserved`/`be_mult`, bento 1_taskdb.sql:24-48)."""
    db = backend_cls()
    db.set_user_quota("alice", reserved=2, be_mult=1.0)
    db.set_user_quota("bob", reserved=0, be_mult=3.0)
    jobs = {}
    for user in ("alice", "bob"):
        jobs[user] = db.create_job("prove", {"kind": "prove"}, user=user)
        for i in range(6):
            db.create_task(jobs[user], f"t{i}", "prove", {"i": i}, [])

    # alice's reserve wins the first two claims even though bob queued too
    first = [db.request_work("prove") for _ in range(2)]
    users = [ "alice" if t.job_id == jobs["alice"] else "bob" for t in first]
    assert users == ["alice", "alice"]
    # past the reserve, best-effort: bob (be_mult 3) gets ~3x alice's share
    rest = [db.request_work("prove") for _ in range(8)]
    bob_n = sum(1 for t in rest if t.job_id == jobs["bob"])
    assert bob_n >= 5  # 3:1 weighting over 8 claims (6 bob + 2 alice)


def test_taskdb_fair_share_single_user_fifo():
    """Quota machinery is inert for a single user: strict priority+FIFO."""
    db = MemoryBackend()
    job = db.create_job("prove", {"kind": "prove"})
    for i in range(3):
        db.create_task(job, f"t{i}", "prove", {"i": i}, [])
    db.request_work("prove")  # init
    order = [db.request_work("prove").task_id for _ in range(3)]
    assert order == ["t0", "t1", "t2"]
