"""Microbench: int8 matmul on the MXU + exact Baby Bear matmul feasibility."""
import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax, jax.numpy as jnp, numpy as np

def t(name, fn, *a, reps=10):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/reps
    print(f"{name:40s} {dt*1000:8.2f} ms")
    return dt

M, K, N = 524288, 576, 8
key = jax.random.PRNGKey(0)
a8 = jax.random.randint(key, (M, K), -127, 127, dtype=jnp.int8)
b8 = jax.random.randint(key, (K, 128), -127, 127, dtype=jnp.int8)

f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
dt = t("int8 (524288x576)@(576x128) -> int32", f_i8, a8, b8)
print(f"  -> {2*M*K*128/dt/1e12:.1f} Tops int8")

abf = a8.astype(jnp.bfloat16); bbf = b8.astype(jnp.bfloat16)
f_bf = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
dt = t("bf16 same shape -> f32", f_bf, abf, bbf)
print(f"  -> {2*M*K*128/dt/1e12:.1f} Tflops bf16")

# u8 x u8 -> int32 (we use unsigned limbs)
au = jax.random.randint(key, (M, K), 0, 255, dtype=jnp.uint8)
bu = jax.random.randint(key, (K, 128), 0, 255, dtype=jnp.uint8)
f_u8 = jax.jit(lambda a, b: jax.lax.dot_general(a.astype(jnp.int8), b.astype(jnp.int8), (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
# exactness test on small case: uint8 reinterpreted as int8 loses range; use 7-bit limbs instead
a7 = jax.random.randint(key, (256, 512), 0, 127, dtype=jnp.int8)
b7 = jax.random.randint(key, (512, 128), 0, 127, dtype=jnp.int8)
ref = np.asarray(a7, np.int64) @ np.asarray(b7, np.int64)
got = np.asarray(f_i8(a7, b7))
print("7-bit limb int8 matmul exact:", np.array_equal(ref, got))

# NTT-shaped: batched (B, 128) @ (128, 128) int8
B = M*576//128
x = jax.random.randint(key, (B, 128), -127, 127, dtype=jnp.int8)
w = jax.random.randint(key, (128, 128), -127, 127, dtype=jnp.int8)
dt = t(f"int8 ({B}x128)@(128x128)", f_i8, x, w, reps=5)
print(f"  -> {2*B*128*128/dt/1e12:.1f} Tops int8")

# VPU uint32 multiply baseline
u = jax.random.randint(key, (M, K), 0, 2**31, dtype=jnp.uint32)
f_mul = jax.jit(lambda a: a * a + a)
dt = t("uint32 elementwise mul+add (same size)", f_mul, u, reps=10)
print(f"  -> {2*M*K/dt/1e9:.1f} Gops u32")
