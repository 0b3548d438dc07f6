"""Benchmark: proved mcycles/sec for rv32im segment STARKs on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric follows the reference's canonical effective-speed definition
(`crates/boundless-cli/src/commands/prover/benchmark.rs:212-214`):
effective = total_cycles / elapsed_secs. The reference publishes no
absolute numbers (BASELINE.md); vs_baseline is reported against the
reference's template capacity setting peak_prove_khz = 100
(broker-template.toml:62), i.e. vs_baseline = effective_khz / 100.

BENCH_MODE=pipeline measures the full proving pipeline instead of the
prove kernel alone: executor -> native witness gen -> segment STARKs ->
succinct lift -> join tree, with per-stage latencies and the
cluster-level effective kHz (elapsed = whole pipeline wall time, the
reference's taskdb MIN(started)..MAX(updated) analogue). The stage
breakdown is written to BENCH_PIPELINE.json; stdout stays one line.
Recursion params via BENCH_REC_PO2 / BENCH_REC_QUERIES (production
sizing is rec_po2=20 at 100 queries — docs/ROOFLINE.md; default here is
the CI-scale recursion system so the one-off relay compile stays
tractable).
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Steady-state throughput mode: the Pallas Poseidon2 kernels beat the
# XLA cells sponge by ~1.7x once warm (docs/ROOFLINE.md); their one-time
# per-process Mosaic compile is excluded from the measured reps anyway.
os.environ.setdefault("BT_P2_PALLAS", "1")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

from boundless_tpu.core import field as F  # noqa: E402
from boundless_tpu.prover import stark  # noqa: E402
from boundless_tpu.zkvm import guests, witness, prove  # noqa: E402
from boundless_tpu.zkvm.executor import Executor  # noqa: E402

PO2 = int(os.environ.get("BENCH_PO2", "17"))
PS = prove.DEFAULT_PS  # 100 queries @ commit rate 1/2 (~100-bit conj.)
REPS = int(os.environ.get("BENCH_REPS", "3"))
BATCH = int(os.environ.get("BENCH_BATCH", "1"))  # vmap'd segments per call


def pipeline_main():
    import jax.numpy as jnp  # noqa: F401

    from boundless_tpu.recursion import claims, succinct  # noqa: E402
    from boundless_tpu.zkvm import paging  # noqa: E402

    seg_po2 = PO2
    rec_po2 = int(os.environ.get("BENCH_REC_PO2", "17"))
    rec_q = int(os.environ.get("BENCH_REC_QUERIES", "2"))
    # Production sizing (docs/ROOFLINE.md): rec_po2 20, 50 queries at
    # commit rate 1/4 (the reference's rate; ~100-bit conjectured) —
    # BENCH_REC_PO2=20 BENCH_REC_QUERIES=50 BENCH_SEG_QUERIES=50
    # BENCH_SEG_EXPAND=4 BENCH_REC_EXPAND=4 BENCH_FRI_MIN=256.
    fri_min = int(os.environ.get("BENCH_FRI_MIN", "16"))
    seg_ps = stark.ProofSystem(queries=int(
        os.environ.get("BENCH_SEG_QUERIES", "2")), fri_min_degree=fri_min,
        commit_expand=int(os.environ.get("BENCH_SEG_EXPAND", "2")))
    rec_ps = stark.ProofSystem(queries=rec_q, fri_min_degree=fri_min,
                               commit_expand=int(
                                   os.environ.get("BENCH_REC_EXPAND", "2")))
    n_segs = int(os.environ.get("BENCH_SEGMENTS", "2"))
    image = guests.loop_guest()
    iters = (n_segs * (1 << seg_po2) - 60) // 2
    t0 = time.time()
    ex = Executor(image, guests.words([iters]), segment_po2=seg_po2)
    res = ex.run()
    t_exec = time.time() - t0
    system = prove_sys = None
    from boundless_tpu.recursion.succinct import SuccinctParams, get_system

    variants = tuple(os.environ.get("BENCH_VARIANTS",
                                    "rv32im,rv32i").split(","))
    system = get_system(SuccinctParams(seg_po2=seg_po2, seg_ps=seg_ps,
                                       rec_po2=rec_po2, rec_ps=rec_ps,
                                       variants=variants))
    from boundless_tpu.cluster.agent import _segment_pre_chains

    meta = _segment_pre_chains(ex, res)
    # warmup pass: one-time relay/XLA compiles stay out of the measured
    # pipeline (the cluster's long-lived workers are always warm)
    w0 = witness.trace_segment_native(image, res.segments[0], seg_po2)
    sr0 = prove.prove_segment(image, res.segments[0], ps=seg_ps)
    jax.block_until_ready(sr0.proof.data_root)
    pre0 = {int(t): tuple(v)
            for t, v in meta[res.segments[0].index].items()}
    r0 = system.lift(sr0, pre0, pre_mem=res.segments[0].pre_mem,
                     seg_index=res.segments[0].index)
    jax.block_until_ready(r0.proof.data_root)
    j0 = system.join(r0, system.lift(
        prove.prove_segment(image, res.segments[1], ps=seg_ps),
        {int(t): tuple(v) for t, v in meta[res.segments[1].index].items()},
        pre_mem=res.segments[1].pre_mem,
        seg_index=res.segments[1].index)) if len(res.segments) > 1 else None
    if j0 is not None:
        jax.block_until_ready(j0.proof.data_root)

    t_wit = t_prove = t_lift = 0.0
    receipts = []
    pipeline_t0 = time.time()
    for seg in res.segments:
        t1 = time.time()
        w = witness.trace_segment_native(image, seg, seg_po2)
        t_wit += time.time() - t1
        t1 = time.time()
        sr = prove.prove_segment(image, seg, ps=seg_ps)
        jax.block_until_ready(sr.proof.data_root)
        t_prove += time.time() - t1
        t1 = time.time()
        pre = {int(t): tuple(v) for t, v in meta[seg.index].items()}
        r = system.lift(sr, pre, pre_mem=seg.pre_mem,
                        seg_index=seg.index)
        jax.block_until_ready(r.proof.data_root)
        t_lift += time.time() - t1
        receipts.append(r)
    t1 = time.time()
    cur = receipts[0]
    for r in receipts[1:]:
        cur = system.join(cur, r)
        jax.block_until_ready(cur.proof.data_root)
    t_join = time.time() - t1
    elapsed = time.time() - pipeline_t0
    cycles = res.total_cycles
    eff_khz = cycles / (elapsed + t_exec) / 1000.0
    breakdown = dict(
        seg_po2=seg_po2, segments=len(res.segments), cycles=cycles,
        seg_queries=seg_ps.queries, rec_po2=rec_po2, rec_queries=rec_q,
        exec_s=round(t_exec, 3), witness_s=round(t_wit, 3),
        prove_s=round(t_prove, 3), lift_s=round(t_lift, 3),
        join_s=round(t_join, 3),
        lift_latency_per_receipt_s=round(t_lift / len(receipts), 3),
        join_latency_per_receipt_s=round(
            t_join / max(1, len(receipts) - 1), 3),
        effective_khz=round(eff_khz, 2))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_PIPELINE.json"), "w") as f:
        json.dump(breakdown, f, indent=1)
    print(json.dumps({
        "metric": "pipeline_effective_khz",
        "value": round(eff_khz, 2),
        "unit": "kHz",
        "vs_baseline": round(eff_khz / 100.0, 4)}))


def main():
    if os.environ.get("BENCH_MODE") == "pipeline":
        return pipeline_main()
    # Workload: loop guest filling one segment (reference config 2 shape).
    image = guests.loop_guest()
    iters = ((1 << PO2) - 40) // 2
    ex = Executor(image, guests.words([iters]), segment_po2=PO2)
    res = ex.run()
    seg = res.segments[0]

    variant = prove.air_variant_of(image)  # loop guest -> rv32i (384 cols)
    air = prove._AIRS[variant]
    w = witness.trace_segment(image, seg, PO2)
    data = F.fp(witness.data_for_variant(w.data, variant))
    ctrl, _ = prove._image_ctrl(image, PO2)
    pub = witness.to_public_values(w.pub)

    if BATCH > 1:
        # Aggregate throughput: vmap over independent segments (the
        # cluster's P1 axis on one chip).
        import jax.numpy as jnp

        data_b = jnp.broadcast_to(data[None], (BATCH,) + data.shape)
        pub_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (BATCH,) + x.shape), pub)
        prover = jax.jit(lambda d, p, c: jax.vmap(
            lambda dd, pp: stark.prove(air, dd, pp, PO2, PS, c)
        )(d, p))
        run = lambda: prover(data_b, pub_b, ctrl)
    else:
        prover = stark.make_prover(air, PO2, PS)
        run = lambda: prover(data, pub, ctrl)

    # compile + warmup. jax.block_until_ready does a BATCHED await (one
    # relay round-trip); blocking leaves one-by-one costs a relay RTT
    # per array and halved the measured number (round-5 finding). The
    # single explicit leaf block after it guards against the vmapped
    # BATCH mode's early return (285 "Mcycles/s" artifact).
    def _sync(out):
        out = jax.block_until_ready(out)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "block_until_ready")]
        if leaves:
            leaves[-1].block_until_ready()
        return out

    _sync(run())

    t0 = time.time()
    for _ in range(REPS):
        proof = run()
        _sync(proof)
    elapsed = (time.time() - t0) / REPS

    cycles = seg.cycles * BATCH
    effective_khz = cycles / elapsed / 1000.0
    mcycles_per_sec = cycles / elapsed / 1e6
    print(json.dumps({
        "metric": "proved_mcycles_per_sec",
        "value": round(mcycles_per_sec, 4),
        "unit": "mcycles/s",
        "vs_baseline": round(effective_khz / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
