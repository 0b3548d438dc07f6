"""Microbench: raw field-op throughput on the chip (roofline anchors)."""
import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp, numpy as np
from boundless_tpu.core import field as F

def t(name, fn, *a, reps=20, work=1):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/reps
    print(f"{name:44s} {dt*1e3:9.3f} ms  {work/dt/1e9:9.2f} Gop/s")
    return dt

N = 1 << 26  # 64M elements, 256MB per operand
key = jax.random.PRNGKey(0)
a = jax.random.randint(key, (N,), 0, F.P, dtype=jnp.uint32)
b = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, F.P, dtype=jnp.uint32)

t("mont mul (F.mul)", jax.jit(F.mul), a, b, work=N)
t("add (F.add)", jax.jit(F.add), a, b, work=N)
t("u32 raw multiply", jax.jit(lambda x, y: x * y), a, b, work=N)
t("u32 raw add", jax.jit(lambda x, y: x + y), a, b, work=N)
t("u32 shift", jax.jit(lambda x, y: (x >> 16) + y), a, b, work=N)
t("sbox x^7 (4 montmul)", jax.jit(lambda x: F.mul(F.mul(F.mul(x,x),x), F.mul(F.mul(x,x),F.mul(x,x)))), a, work=4*N)

# chained montmuls to hide HBM: y = x^(2^k) via k in-register squarings
def chain(x):
    for _ in range(16):
        x = F.mul(x, x)
    return x
t("16x chained montmul (compute-bound)", jax.jit(chain), a, work=16*N)

def chain_add(x):
    for _ in range(16):
        x = F.add(x, x)
    return x
t("16x chained add", jax.jit(chain_add), a, work=16*N)

# HBM bandwidth anchor
t("copy (x+0)", jax.jit(lambda x: x + jnp.uint32(1)), a, work=N)
