import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp, numpy as np
from boundless_tpu.core import field as F

N = 1 << 26
a = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, F.P, dtype=jnp.uint32)

def chain(x, k):
    for _ in range(k):
        x = F.mul(x, x)
    return x

mk = lambda k: jax.jit(lambda x, s: jnp.bitwise_xor.reduce(chain(x + s, k)))
f16, f64, f256 = mk(16), mk(64), mk(256)
g = jax.jit(lambda x, s: jnp.bitwise_xor.reduce(x + s))

for name, fn, work in (("xor-reduce only", g, N), ("mont^16", f16, 16*N),
                       ("mont^64", f64, 64*N), ("mont^256", f256, 256*N)):
    print(int(fn(a, jnp.uint32(0))))  # warm compile
    t0 = time.time(); reps = 5
    for i in range(reps):
        s = int(fn(a, jnp.uint32(i+1)))  # scalar fetch = sync
    dt = (time.time()-t0)/reps
    print(f"{name:16s} {dt*1e3:9.2f} ms -> {work/dt/1e9:8.1f} Gmont/s")
