import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
from boundless_tpu.core import field as F, bbmm

rng = np.random.default_rng(0)
for (M, K, W) in ((64, 7, 4), (128, 900, 4), (32, 16385, 4), (8, 1, 1)):
    v = jnp.asarray(rng.integers(0, F.P, (M, K)), jnp.uint32)
    w = jnp.asarray(rng.integers(0, F.P, (K, W)), jnp.uint32)
    ref = F.sum_mod(F.mul(v[:, :, None], w[None, :, :]), axis=1)
    got = bbmm.bb_weighted_sum(v, w)
    ok = bool(jnp.array_equal(ref, got))
    print(M, K, W, "OK" if ok else "MISMATCH")
    assert ok
print("all exact")
