"""Dev check: pallas_eval.combined_eval parity vs the XLA path (CPU)."""
import os
os.environ["BT_CONS_PALLAS"] = "0"  # manual invocation below
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
import jax.numpy as jnp
import numpy as np
from boundless_tpu.core import field as F, ntt as NTT
from boundless_tpu.prover import stark
from boundless_tpu.air import pallas_eval
from boundless_tpu.air.dsl import BaseAlg, Columns
from boundless_tpu.zkvm import guests, witness, prove
from boundless_tpu.zkvm.executor import Executor

PO2 = int(os.environ.get("PO2", "6"))

image = guests.loop_guest()
iters = 3
ex = Executor(image, guests.words([iters]), segment_po2=PO2)
seg = ex.run().segments[0]
w = witness.trace_segment_native(image, seg, PO2)
variant = prove.air_variant_of(image)
air = prove._AIRS[variant]
data = F.fp(witness.data_for_variant(w.data, variant))
ctrl, _ = prove._image_ctrl(image, PO2)
pub = witness.to_public_values(w.pub)
print("variant:", variant, "data", data.shape, "ctrl", ctrl.shape)

n = 1 << PO2
globals_ = jnp.stack([F.ext(np.arange(4) + 3), F.ext(np.arange(4) + 9)])
alpha = F.ext(np.arange(4) + 7)

interp = jax.jit(NTT.interpolate)
cev = jax.jit(lambda c: NTT.coset_evaluate(c, expand=4))
data_evals = cev(interp(data))
ctrl_evals = cev(interp(ctrl))
accum = air.accum_trace(ctrl, data, globals_)
accum_evals = cev(interp(accum))

# reference path
@jax.jit
def ref_path(ctrl_evals, data_evals, accum_evals, globals_, pub, alpha):
    now = Columns(ctrl=stark._ColAccessor(ctrl_evals),
                  data=stark._ColAccessor(data_evals),
                  accum=stark._ColAccessor(accum_evals))
    roll = lambda x: jnp.roll(x, -4, axis=0)
    nxt = Columns(ctrl=stark._ColAccessor(roll(ctrl_evals)),
                  data=stark._ColAccessor(roll(data_evals)),
                  accum=stark._ColAccessor(roll(accum_evals)))
    cons = air.constraints(BaseAlg(), now, nxt, globals_, pub)
    return stark.combine_constraints(cons, alpha, at_deep=False)

@jax.jit
def pallas_path(ctrl_evals, data_evals, accum_evals, globals_, pub, alpha):
    return pallas_eval.combined_eval(air, ctrl_evals, data_evals,
                                     accum_evals, globals_, pub, alpha)

print("compiling ref path...", flush=True)
ref = ref_path(ctrl_evals, data_evals, accum_evals, globals_, pub, alpha)
print("compiling pallas path...", flush=True)
got = pallas_path(ctrl_evals, data_evals, accum_evals, globals_, pub, alpha)
ref = np.asarray(ref); got = np.asarray(got)
bad = np.argwhere(ref != got)
print("mismatches:", bad.shape[0], "of", ref.size)
if bad.shape[0]:
    print(bad[:10]); print(ref[tuple(bad[0])], got[tuple(bad[0])])
assert bad.shape[0] == 0
print("PARITY OK")
