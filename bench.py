"""Benchmark: proved mcycles/sec for rv32im segment STARKs on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric follows the reference's canonical effective-speed definition
(`crates/boundless-cli/src/commands/prover/benchmark.rs:212-214`):
effective = total_cycles / elapsed_secs. The reference publishes no
absolute numbers (BASELINE.md); vs_baseline is reported against the
reference's template capacity setting peak_prove_khz = 100
(broker-template.toml:62), i.e. vs_baseline = effective_khz / 100.
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


def main():
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

    # compile + warmup
    jax.block_until_ready(run())

    t0 = time.time()
    for _ in range(REPS):
        proof = run()
        jax.block_until_ready(proof)
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
