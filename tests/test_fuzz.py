"""Model-based fuzz tests (reference broker db fuzzer role):
random taskdb op sequences checked against a reference model."""

import random

import pytest

from boundless_tpu.cluster.taskdb import (JobState, MemoryBackend,
                                          SqliteBackend, TaskState)


@pytest.mark.parametrize("backend_cls", [MemoryBackend, SqliteBackend])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_taskdb_random_dags(backend_cls, seed):
    """Random DAGs with random completion order: every job must converge
    to DONE and tasks must only run after their prereqs."""
    rng = random.Random(seed)
    db = backend_cls()
    job = db.create_job("exec", {"kind": "root"})
    root = db.request_work("exec")
    n = rng.randrange(4, 14)
    deps_of = {}
    for i in range(n):
        candidates = list(deps_of)
        deps = rng.sample(candidates, min(len(candidates),
                                          rng.randrange(0, 3)))
        deps_of[f"t{i}"] = deps
        db.create_task(job, f"t{i}", "prove", {"i": i}, deps)
    db.update_task_done(job, "init", {})

    done = set()
    for _ in range(10 * n):
        t = db.request_work("prove", timeout=0.02)
        if t is None:
            break
        # prereq ordering invariant
        assert all(d in done for d in t.prereqs), \
            f"{t.task_id} ran before {t.prereqs}"
        if rng.random() < 0.2 and t.retries == 0:
            db.update_task_retry(job, t.task_id, "injected")
            continue
        db.update_task_done(job, t.task_id, {})
        done.add(t.task_id)
    assert done == set(deps_of)
    assert db.job_state(job)["state"] == JobState.DONE
    assert db.find_stuck_pending() == []


def test_order_db_fuzz_roundtrip():
    """Random order states survive DB round-trips byte-identically."""
    from boundless_tpu.market.broker.db import OrderDb
    from boundless_tpu.market.broker.pipeline import Order, OrderStatus
    from boundless_tpu.market.types import (Offer, Predicate, ProofRequest,
                                            RequestId, Requirements)

    rng = random.Random(7)
    db = OrderDb()
    statuses = [OrderStatus.NEW, OrderStatus.PRICING, OrderStatus.COMMITTED,
                OrderStatus.LOCKED, OrderStatus.PROVING,
                OrderStatus.FULFILLED, OrderStatus.SKIPPED,
                OrderStatus.FAILED]
    expected = {}
    for i in range(40):
        req = ProofRequest(
            id=RequestId(f"c{rng.randrange(5)}", i),
            requirements=Requirements(
                image_id=f"{rng.randrange(1 << 32):08x}",
                predicate=Predicate.prefix_match(
                    bytes(rng.randrange(256) for _ in range(4)))),
            image_url=f"mock://e/{i}", input_data=bytes([i]),
            offer=Offer(rng.randrange(100), rng.randrange(100, 200),
                        rng.random() * 100, 1.0, 5.0, 10.0,
                        rng.randrange(50)))
        o = Order(request=req, status=rng.choice(statuses),
                  price=rng.randrange(1000),
                  error="e" if rng.random() < 0.5 else None)
        rid = req.id.encoded()
        db.upsert(rid, o)
        expected[rid] = o
    loaded = db.load_all()
    assert set(loaded) == set(expected)
    for rid, o in expected.items():
        lo = loaded[rid]
        assert (lo.status, lo.price, lo.error) == (o.status, o.price, o.error)
        assert lo.request == o.request
