"""Stage-level timing of the segment prover on the real chip.

Times each pipeline stage in isolation (own jit) to attribute cost:
LDE+commit per group, constraint eval, check commit, DEEP taps,
DEEP combo, FRI. Stage sum != whole-proof time (fusion), but the
ranking identifies the hot spots.
"""
import os, time, json
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("BT_P2_PALLAS", "1")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from boundless_tpu.core import field as F, ntt as NTT, merkle, fri
from boundless_tpu.prover import stark
from boundless_tpu.zkvm import guests, witness, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = int(os.environ.get("PO2", "17"))
PS = prove.DEFAULT_PS

def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1000:10.1f} ms")
    return out, dt

def main():
    image = guests.loop_guest()
    iters = ((1 << PO2) - 40) // 2
    ex = Executor(image, guests.words([iters]), segment_po2=PO2)
    seg = ex.run().segments[0]
    t0 = time.time()
    w = witness.trace_segment_native(image, seg, PO2)
    print(f"{'witness_gen (native)':28s} {(time.time()-t0)*1000:10.1f} ms")
    variant = prove.air_variant_of(image)
    air = prove._AIRS[variant]
    data = F.fp(witness.data_for_variant(w.data, variant))
    ctrl, _ = prove._image_ctrl(image, PO2)
    pub = witness.to_public_values(w.pub)
    print("variant:", variant)
    n = 1 << PO2
    print(f"data cols={data.shape[1]} ctrl cols={ctrl.shape[1]} n={n} commit_expand={PS.commit_expand}")

    # stage: interpolate (NTT) of data
    interp = jax.jit(NTT.interpolate)
    coeffs, t_intt = timeit("intt(data)", interp, data)
    # stage: coset evaluate 4N
    cev = jax.jit(lambda c: NTT.coset_evaluate(c, expand=4))
    evals, t_lde = timeit("coset_eval 4N (data)", cev, coeffs)
    # stage: merkle commit of commit-domain rows (cN)
    step = 4 // PS.commit_expand
    rows = evals[::step]
    com = jax.jit(lambda r: merkle.commit(r).levels[-1])
    _, t_commit = timeit("merkle commit (data)", com, rows)
    # leaf hash only
    from boundless_tpu.core import poseidon2_pallas as P2K
    lh = jax.jit(P2K.hash_rows)
    _, t_leaf = timeit("  leaf hash_rows (data)", lh, rows)

    # constraint eval: build accessors on 4N grid
    globals_ = jnp.zeros((air.globals_count, 4), jnp.uint32) if air.globals_count else jnp.zeros((0,4), jnp.uint32)
    ctrl_coeffs = jax.jit(NTT.interpolate)(ctrl)
    ctrl_evals = cev(ctrl_coeffs)
    accum_trace = air.accum_trace(ctrl, data, globals_) if air.accum_cols else None
    accum_evals = cev(jax.jit(NTT.interpolate)(accum_trace)) if accum_trace is not None else None

    from boundless_tpu.air.dsl import BaseAlg, Columns
    def conseval(ce, de, ae, g):
        now = Columns(ctrl=stark._ColAccessor(ce), data=stark._ColAccessor(de), accum=stark._ColAccessor(ae))
        nxt = Columns(ctrl=stark._ColAccessor(jnp.roll(ce, -4, axis=0)),
                      data=stark._ColAccessor(jnp.roll(de, -4, axis=0)),
                      accum=stark._ColAccessor(jnp.roll(ae, -4, axis=0)))
        cons = air.constraints(BaseAlg(), now, nxt, g, pub)
        alpha = F.ext(np.arange(4) + 7)
        return stark.combine_constraints(cons, alpha, at_deep=False)
    ce = jax.jit(conseval)
    combined, t_cons = timeit("constraint eval+combine 4N", ce, ctrl_evals, evals, accum_evals, globals_)

    # check poly: intt 4N + split + coset eval + commit
    def check(comb):
        _, inv_z = stark._domain_tables(n)
        q = F.mul(comb, jnp.asarray(inv_z)[:, None])
        qc = NTT.coset_interpolate(q, expand=1)
        cc = jnp.concatenate([qc[i::4] for i in range(4)], axis=1)
        cev2 = NTT.coset_evaluate(cc, expand=PS.commit_expand)
        return merkle.commit(cev2).levels[-1]
    _, t_check = timeit("check-poly pipeline", jax.jit(check), combined)

    # DEEP taps: eval_poly_ext over all groups
    def taps(dc, cc2, ac):
        z = F.ext(np.arange(4) + 3)
        r = [NTT.eval_poly_ext(dc, z)]
        r.append(NTT.eval_poly_ext(cc2, z))
        r.append(NTT.eval_poly_ext(ac, z))
        return r
    accum_coeffs = jax.jit(NTT.interpolate)(accum_trace) if accum_trace is not None else None
    _, t_taps = timeit("DEEP taps (3 groups @ z)", jax.jit(taps), coeffs, ctrl_coeffs, accum_coeffs)

    # DEEP combo
    def combo(tev, cev_, aev):
        trace_cevals = jnp.concatenate([cev_[::step], tev[::step], aev[::step]], axis=1)
        ctn = trace_cevals.shape[1]
        tt = jnp.zeros((ctn, 2, 4), jnp.uint32)
        checkev = jnp.zeros((PS.commit_expand * n, 16), jnp.uint32)
        tch = jnp.zeros((16, 4), jnp.uint32)
        beta = F.ext(np.arange(4) + 11)
        z = F.ext(np.arange(4) + 3)
        return stark._deep_combo_evals(trace_cevals, tt, checkev, tch, beta, z, z, z, n, PS.commit_expand)
    cval, t_combo = timeit("DEEP combo (cN)", jax.jit(combo), evals, ctrl_evals, accum_evals)

    # FRI prove
    def frip(c):
        from boundless_tpu.core.transcript import Transcript
        tr = Transcript()
        return fri.prove(tr, c, queries=PS.queries, min_degree=PS.fri_min_degree, inv_rate=PS.commit_expand)[0]
    _, t_fri = timeit("FRI prove", jax.jit(frip), cval)

    # whole proof
    prover = stark.make_prover(air, PO2, PS)
    _, t_all = timeit("WHOLE PROOF", prover, data, pub, ctrl, reps=3)
    cyc = seg.cycles
    print(f"cycles={cyc} -> {cyc/t_all/1e6:.4f} Mcyc/s")

if __name__ == "__main__":
    main()
