import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from boundless_tpu.core import field as F
U=jnp.uint32; P=np.uint32(F.P); NP=np.uint32(F.NP); M16=np.uint32(0xFFFF)

def mul_v1(a,b):  # current
    return F.mul(a,b)

def mul_v2(a,b):  # babybear-constant reduction for m*P
    hi,lo = F.mul32_wide(a,b)
    m = lo * NP
    A = (m >> 16) * np.uint32(15)
    B = (m & M16) * np.uint32(15)
    t_lo = (A << 16) + B
    t_hi = (A >> 16) + (t_lo < B).astype(U)
    u = (t_hi << 27) | (t_lo >> 5)
    vm = ((t_lo & np.uint32(31)) << 27) + m
    carry2 = (vm < m).astype(U)
    h2 = u + carry2
    carry = (lo != 0).astype(U)
    res = hi + h2 + carry
    return jnp.where(res >= P, res - P, res)

def sbox(mul, x):
    x2=mul(x,x); x3=mul(x2,x); x6=mul(x3,x3); return mul(x6,x)

rng=np.random.default_rng(0)
x = F.fp(rng.integers(0,F.P,size=(1<<23,)))
y = F.fp(rng.integers(0,F.P,size=(1<<23,)))
# correctness
a=np.asarray(mul_v1(x[:1000],y[:1000])); b=np.asarray(mul_v2(x[:1000],y[:1000]))
print("v2 parity:", (a==b).all())
def bench(name, f, reps=20):
    g = jax.jit(lambda x,y: jnp.bitwise_xor.reduce(f(x,y)))
    np.asarray(g(x,y)); t0=time.time()
    for _ in range(reps): np.asarray(g(x,y))
    dt=(time.time()-t0)/reps
    print(f"{name}: {dt*1e3:.2f} ms  ({(1<<23)/dt/1e9:.2f} G/s)")
bench("montmul v1", mul_v1)
bench("montmul v2", mul_v2)
bench("sbox v1", lambda a,b: sbox(mul_v1,a))
bench("sbox v2", lambda a,b: sbox(mul_v2,a))
