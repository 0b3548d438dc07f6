"""Whole-proof ablation: stub one subsystem at a time, time the full jit.

Isolated stage timings on this relay carry ~30ms RTT each; the only
trustworthy number is a single-dispatch whole-proof run. Deltas between
the full prover and a stubbed variant give in-context subsystem cost.
"""
import os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from boundless_tpu.core import field as F, merkle, ntt as NTT, fri
from boundless_tpu.core import poseidon2 as P2, poseidon2_pallas as P2K
from boundless_tpu.prover import stark
from boundless_tpu.zkvm import guests, witness, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = int(os.environ.get("PO2", "17"))
MODE = sys.argv[1] if len(sys.argv) > 1 else "full"
PS = prove.DEFAULT_PS

image = guests.loop_guest()
iters = ((1 << PO2) - 40) // 2
ex = Executor(image, guests.words([iters]), segment_po2=PO2)
seg = ex.run().segments[0]
w = witness.trace_segment_native(image, seg, PO2)
data = F.fp(w.data)
ctrl, _ = prove._image_ctrl(image, PO2)
pub = witness.to_public_values(w.pub)
air = prove._AIR

# --- stubs ---
if MODE == "nohash":
    def fake_commit(matrix):
        n = matrix.shape[0]
        # cheap digest: xor-fold 8 words per row (keeps shapes, kills hashing)
        c = matrix.shape[1]
        pad = (-c) % 8
        m = jnp.pad(matrix, ((0, 0), (0, pad)))
        leaves = m.reshape(n, -1, 8)[:, 0, :]
        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = jnp.bitwise_xor(cur[0::2], cur[1::2])
            levels.append(cur)
        return merkle.MerkleTree(levels=tuple(levels), matrix=matrix)
    merkle.commit = fake_commit
elif MODE == "nocons":
    _orig = air.constraints
    def fake_cons(alg, now, nxt, globals_, pub):
        return [now.data[0]]
    air.constraints = fake_cons
elif MODE == "nontt":
    NTT.interpolate = lambda x: x
    _orig_ce = NTT.coset_evaluate
    def fake_ce(c, expand=4):
        return jnp.tile(c, (expand,) + (1,) * (c.ndim - 1))
    NTT.coset_evaluate = fake_ce
    NTT.coset_interpolate = lambda e, expand=4: e[: e.shape[0] // max(expand, 1)] if expand > 1 else e
elif MODE == "nofri":
    _op = fri.prove
    def fake_fri(tr, combo, queries=50, min_degree=256, inv_rate=4):
        idx = jnp.arange(queries, dtype=jnp.int32)
        # produce a structurally-valid FriProof by proving a tiny poly
        return _op(tr, combo[:max(min_degree * inv_rate, 1024)], queries=queries,
                   min_degree=min_degree, inv_rate=inv_rate)[0], idx
    fri.prove = fake_fri
elif MODE == "nocombo":
    stark._deep_combo_evals = lambda te, tt, ce, tc, beta, z, zg, z4, n, cx: (
        F.ext_from_base(te[:, 0]))
elif MODE == "notaps":
    NTT.eval_poly_ext = lambda coeffs, z: jnp.zeros(
        (coeffs.shape[1], 4), jnp.uint32) + z[None, :]

prover = stark.make_prover(air, PO2, PS)
out = prover(data, pub, ctrl)
jax.block_until_ready(out)
t0 = time.time()
REPS = 3
for _ in range(REPS):
    out = prover(data, pub, ctrl)
    jax.block_until_ready(out)
dt = (time.time() - t0) / REPS
print(f"MODE={MODE} po2={PO2} {dt*1000:.1f} ms  ({seg.cycles/dt/1e6:.4f} Mcyc/s)")
