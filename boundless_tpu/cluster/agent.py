"""Workflow agent: worker poll loop + task handlers.

Re-design of the reference agent (`prover/crates/workflow/src/lib.rs`:
`Agent` :186-206, `poll_work` :525-683, `process_work` :686-797): one
worker object whose mode is its task stream (exec / prove / join / coproc /
snark / aux), polling taskdb, dispatching TaskType, with retry bookkeeping
and hot-store cleanup-after-done semantics. Workers here are threads in
one process (the cluster fabric is in-process dict/sqlite); the REST API
layer (api.py) exposes the same surface across processes.

Task flow for a session (reference §3.1 call stack):
  exec: run the rv32im executor, stream segments into the hot store,
        drive the MMR planner to create prove/join/finalize tasks
  prove: witness + segment STARK (the TPU hot path) + lift
  join: pairwise claim join along the tree
  resolve: discharge assumptions from the receipts store
  finalize: SessionReceipt -> object store receipts/stark/<job>.
"""

from __future__ import annotations

import dataclasses
import pickle
import threading
import time
import traceback
from typing import Optional

import numpy as np

from . import hotstore as hs
from .planner import Planner, Kind
from .storage import SharedFs
from .taskdb import MemoryBackend, Priority
from ..prover import stark
from ..recursion import receipt as rec
from ..zkvm import prove as zprove
from ..zkvm.executor import Executor, MemoryImage

STREAMS = ("exec", "prove", "join", "coproc", "snark", "aux")


@dataclasses.dataclass
class ClusterContext:
    """Shared fabric handles (taskdb + hot store + object store)."""

    db: MemoryBackend
    hot: hs.HotStore
    store: SharedFs
    ps: stark.ProofSystem = zprove.DEFAULT_PS
    segment_po2: int = 14
    exec_cycle_limit: int = 100_000 * (1 << 20)  # reference default


class Agent:
    """One worker; `stream` selects its task type (reference Args)."""

    def __init__(self, ctx: ClusterContext, stream: str, worker_id: str = ""):
        assert stream in STREAMS
        self.ctx = ctx
        self.stream = stream
        self.worker_id = worker_id or f"{stream}-{id(self) & 0xFFFF:x}"
        self._stop = threading.Event()

    # ------------------------------------------------------------------
    def poll_work(self, idle_timeout: Optional[float] = None):
        """Poll until stopped (or idle for idle_timeout seconds).

        Aux workers additionally run the maintenance crons (reference
        lib.rs:531-605: requeue expired leases, fix stuck-pending tasks,
        purge expired hot-store keys).
        """
        idle_since = time.time()
        last_maint = 0.0
        while not self._stop.is_set():
            if self.stream == "aux" and time.time() - last_maint > 1.0:
                last_maint = time.time()
                from . import metrics as M

                n = self.ctx.db.requeue_expired()
                if n:
                    M.REGISTRY.counter("tasks_requeued_total").inc(n)
                stuck = self.ctx.db.fix_stuck_pending()
                if stuck:
                    M.REGISTRY.counter("tasks_stuck_fixed_total").inc(stuck)
                self.ctx.hot.purge_expired()
            task = self.ctx.db.request_work(self.stream, self.worker_id,
                                            timeout=0.2)
            if task is None:
                if idle_timeout and time.time() - idle_since > idle_timeout:
                    return
                continue
            idle_since = time.time()
            from . import metrics as M

            try:
                with M.REGISTRY.histogram(M.TASK_DURATION,
                                          stream=self.stream).time():
                    output, cleanup = self.process_work(task)
                self.ctx.db.update_task_done(task.job_id, task.task_id,
                                             output or {})
                self.ctx.hot.delete(*cleanup)
                M.REGISTRY.counter(M.TASKS_PROCESSED,
                                   stream=self.stream).inc()
            except Exception as e:  # noqa: BLE001 — retry semantics
                err = f"{type(e).__name__}: {e}\n{traceback.format_exc()}"
                M.REGISTRY.counter(M.TASKS_RETRIED, stream=self.stream).inc()
                self.ctx.db.update_task_retry(task.job_id, task.task_id, err)

    def stop(self):
        self._stop.set()

    # ------------------------------------------------------------------
    def process_work(self, task):
        kind = task.definition["kind"]
        handler = getattr(self, f"_task_{kind}")
        return handler(task)

    # --- exec ----------------------------------------------------------
    def _task_exec(self, task):
        d = task.definition
        image: MemoryImage = self.ctx.store.get("elfs", d["image_id"])
        if image is None:
            raise RuntimeError(f"unknown image {d['image_id']}")
        input_bytes = self.ctx.store.get_bytes("inputs", d["input_id"]) or b""
        po2 = d.get("segment_po2", self.ctx.segment_po2)
        execute_only = d.get("execute_only", False)
        ex = Executor(image, input_bytes, segment_po2=po2,
                      max_cycles=d.get("exec_cycle_limit",
                                       self.ctx.exec_cycle_limit))
        result = ex.run()
        job = task.job_id
        self.ctx.hot.set(hs.exec_stats_key(job), dict(
            total_cycles=result.total_cycles,
            segments=len(result.segments),
            exit_code=result.exit_code,
            journal=result.journal,
            image_id=result.image_id.hex()))
        self.ctx.store.put_bytes("exec_logs", job, result.log)
        self.ctx.store.put_bytes("preflight_journals", job, result.journal)
        if execute_only:
            return dict(total_cycles=result.total_cycles,
                        segments=len(result.segments)), []

        # Stream segments + drive the planner incrementally
        # (reference executor.rs:571-711).
        planner = Planner()
        tid_of = {}
        for seg in result.segments:
            self.ctx.hot.set(hs.segment_key(job, seg.index), seg)
            planner.enqueue_segment(seg.index)
            self._emit_ready(job, planner, tid_of, d)
        fin = planner.finish()
        self._emit_ready(job, planner, tid_of, d)
        return dict(total_cycles=result.total_cycles,
                    segments=len(result.segments),
                    root_task=f"t{planner.root}"), []

    def _emit_ready(self, job, planner: Planner, tid_of, d):
        while (cmd := planner.next_task()) is not None:
            name = f"t{cmd.task_id}"
            tid_of[cmd.task_id] = name
            deps = [tid_of[x] for x in cmd.deps]
            if cmd.kind == Kind.SEGMENT:
                self.ctx.db.create_task(job, name, "prove",
                                        dict(kind="prove",
                                             segment=cmd.payload,
                                             out=name, **_fwd(d)),
                                        deps)
            elif cmd.kind == Kind.JOIN:
                self.ctx.db.create_task(job, name, "join",
                                        dict(kind="join", deps=deps,
                                             out=name), deps)
            elif cmd.kind == Kind.KECCAK:
                self.ctx.db.create_task(job, name, "coproc",
                                        dict(kind="keccak",
                                             claim=cmd.payload, out=name),
                                        deps)
            elif cmd.kind == Kind.UNION:
                self.ctx.db.create_task(job, name, "join",
                                        dict(kind="union", deps=deps,
                                             out=name), deps)
            elif cmd.kind == Kind.FINALIZE:
                # resolve (if assumptions) then finalize, on join/aux
                self.ctx.db.create_task(job, "resolve", "join",
                                        dict(kind="resolve",
                                             root=tid_of[cmd.deps[0]],
                                             **_fwd(d)),
                                        deps)
                self.ctx.db.create_task(job, "finalize", "aux",
                                        dict(kind="finalize", **_fwd(d)),
                                        ["resolve"])

    # --- prove ---------------------------------------------------------
    def _task_prove(self, task):
        d = task.definition
        job = task.job_id
        seg = self.ctx.hot.get(hs.segment_key(job, d["segment"]))
        if seg is None:
            raise RuntimeError(f"segment {d['segment']} missing from hot store")
        image = self.ctx.store.get("elfs", d["image_id"])
        sr = zprove.prove_segment(image, seg, ps=self.ctx.ps)
        lifted = rec.lift(sr, ps=self.ctx.ps)
        self.ctx.hot.set(hs.recursion_receipt_key(job, d["out"]), lifted)
        return dict(claim=lifted.claim_digest().hex()), \
            [hs.segment_key(job, d["segment"])]

    # --- join / union / resolve ---------------------------------------
    def _task_join(self, task):
        d = task.definition
        job = task.job_id
        left = self.ctx.hot.get(hs.recursion_receipt_key(job, d["deps"][0]))
        right = self.ctx.hot.get(hs.recursion_receipt_key(job, d["deps"][1]))
        if left is None or right is None:
            raise RuntimeError("join inputs missing from hot store")
        joined = rec.join(left, right) if d["kind"] == "join" else \
            rec.union(left, right)
        self.ctx.hot.set(hs.recursion_receipt_key(job, d["out"]), joined)
        return dict(claim=joined.claim_digest().hex()), [
            hs.recursion_receipt_key(job, d["deps"][0]),
            hs.recursion_receipt_key(job, d["deps"][1])]

    def _task_keccak(self, task):
        raise RuntimeError("keccak coprocessor: staged for a later round")

    def _task_resolve(self, task):
        d = task.definition
        job = task.job_id
        root = self.ctx.hot.get(hs.recursion_receipt_key(job, d["root"]))
        if root is None:
            raise RuntimeError("resolve: root receipt missing")
        assumptions = []
        for digest in root.claim.assumption_digests():
            r = self.ctx.hot.get(hs.receipt_key(digest.hex()))
            if r is None:
                raise RuntimeError(
                    f"resolve: no receipt for assumption {digest.hex()[:16]}")
            assumptions.append(r)
        resolved = rec.resolve(root, assumptions) if assumptions else root
        self.ctx.hot.set(hs.recursion_receipt_key(job, "resolved"), resolved)
        return dict(claim=resolved.claim_digest().hex()), \
            [hs.recursion_receipt_key(job, d["root"])]

    # --- finalize ------------------------------------------------------
    def _task_finalize(self, task):
        d = task.definition
        job = task.job_id
        root = self.ctx.hot.get(hs.recursion_receipt_key(job, "resolved"))
        if root is None:
            raise RuntimeError("finalize: resolved receipt missing")
        image = self.ctx.store.get("elfs", d["image_id"])
        session = rec.SessionReceipt.finalize(root, entry_pc=image.entry)
        if not session.verify(ps=self.ctx.ps):
            raise RuntimeError("finalize: session receipt failed verification")
        self.ctx.store.put("receipts/stark", job, session)
        # publish by claim digest for composition consumers
        self.ctx.hot.set(hs.receipt_key(root.claim_digest().hex()), root)
        return dict(journal=session.journal.hex()), [
            hs.recursion_receipt_key(job, "resolved")]

    # --- snark (stark -> groth16 wrap) ---------------------------------
    def _task_snark(self, task):
        from ..groth16 import wrap as g16wrap

        d = task.definition
        session = self.ctx.store.get("receipts/stark", d["source_job"])
        if session is None:
            raise RuntimeError("snark: missing stark receipt")
        wrapped = g16wrap.compress(session, kind=d.get("compress", "groth16"))
        bucket = ("receipts/groth16" if d.get("compress") != "blake3_groth16"
                  else "receipts/blake3_groth16")
        self.ctx.store.put(bucket, task.job_id, wrapped)
        return dict(ok=True), []


def _fwd(d):
    """Definition fields forwarded from exec to downstream tasks."""
    return dict(image_id=d["image_id"])


def run_workers(ctx: ClusterContext, counts: dict, idle_timeout=None):
    """Spawn worker threads per stream; returns (threads, agents)."""
    agents, threads = [], []
    for stream, n in counts.items():
        for i in range(n):
            a = Agent(ctx, stream, f"{stream}-{i}")
            t = threading.Thread(target=a.poll_work, args=(idle_timeout,),
                                 daemon=True)
            t.start()
            agents.append(a)
            threads.append(t)
    return threads, agents
