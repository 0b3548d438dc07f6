import os, time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from boundless_tpu.core import field as F, poseidon2 as P2, poseidon2_pallas as P2K
print("reduce impl:", F._REDUCE_IMPL)
rng = np.random.default_rng(0)
ev = F.fp(rng.integers(0, F.P, size=(1<<18, 576)))
g = jax.jit(lambda m: jnp.bitwise_xor.reduce(jnp.ravel(P2K.hash_rows(m))))
ref = jax.jit(lambda m: jnp.bitwise_xor.reduce(jnp.ravel(P2.hash_elems(m))))
a = np.asarray(g(ev)); b = np.asarray(ref(ev))
print("checksum match:", a == b)
for name, f in (("pallas", g), ("jnp", ref)):
    t0=time.time()
    for _ in range(3): np.asarray(f(ev))
    print(f"hash {name}: {(time.time()-t0)/3*1e3:.0f} ms")
