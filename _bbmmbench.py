import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from boundless_tpu.core import field as F, bbmm
from boundless_tpu.prover.stark import _weighted_col_sum

M, K = 524288, 904
rng = np.random.default_rng(0)
v = jnp.asarray(rng.integers(0, F.P, (M, K)), jnp.uint32)
w = jnp.asarray(rng.integers(0, F.P, (K, 4)), jnp.uint32)

def sync(fn, *a):
    out = fn(*a)
    return int(jnp.bitwise_xor.reduce(out.ravel()))

f_mxu = jax.jit(bbmm.bb_weighted_sum)
f_vpu = jax.jit(_weighted_col_sum)
for name, f in (("mxu bb_weighted_sum", f_mxu), ("vpu weighted_col_sum", f_vpu)):
    print(name, sync(f, v, w))
    t0 = time.time(); reps = 5
    for i in range(reps):
        s = sync(f, v + jnp.uint32(i), w)
    dt = (time.time()-t0)/reps
    print(f"{name:24s} {dt*1e3:9.2f} ms")
