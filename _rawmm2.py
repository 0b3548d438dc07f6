import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

def bench(name, M, K, N, dtype):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (M, K)), jnp.int8).astype(dtype)
    b = jnp.asarray(rng.integers(-100, 100, (K, N)), jnp.int8).astype(dtype)
    pref = jnp.int32 if dtype == jnp.int8 else jnp.float32
    f = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=pref))
    out = f(a, b); _ = float(out[0, 0].astype(jnp.float32))
    t0 = time.time(); reps = 5
    for i in range(reps):
        out = f(a, b)
        _ = float(out[i, i].astype(jnp.float32))
    dt = (time.time()-t0)/reps
    print(f"{name:34s} {dt*1e3:9.2f} ms -> {2*M*K*N/dt/1e12:7.1f} Top/s")

bench("bf16 4096^3", 4096, 4096, 4096, jnp.bfloat16)
bench("int8 4096^3", 4096, 4096, 4096, jnp.int8)
bench("bf16 8192x2048x8192", 8192, 2048, 8192, jnp.bfloat16)
bench("int8 524288x896x128 (tall)", 524288, 896, 128, jnp.int8)
bench("int8 4096x896x128", 4096, 896, 128, jnp.int8)
