import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

M, K, N = 524288, 896, 128
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
abf = a8.astype(jnp.bfloat16); bbf = b8.astype(jnp.bfloat16)
af = a8.astype(jnp.float32); bf = b8.astype(jnp.float32)

def bench(name, f, a, b, work):
    out = f(a, b); s = int(jnp.sum(out[::4096, ::32]).astype(jnp.float32) if out.dtype != jnp.int32 else jnp.bitwise_xor.reduce(out[::4096, ::32].ravel()))
    t0 = time.time(); reps = 5
    for i in range(reps):
        out = f(a, b)
        s = float(out[i, i])
    dt = (time.time()-t0)/reps
    print(f"{name:28s} {dt*1e3:9.2f} ms -> {work/dt/1e12:7.1f} Top/s")

dn = (((1,), (0,)), ((), ()))
f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.int32))
f_bf = jax.jit(lambda a, b: jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32))
f_f32 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32))
work = 2*M*K*N
bench("int8->int32", f_i8, a8, b8, work)
bench("bf16->f32", f_bf, abf, bbf, work)
bench("f32->f32", f_f32, af, bf, work)
