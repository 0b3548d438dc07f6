import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from boundless_tpu.zkvm import guests, prove
from boundless_tpu.zkvm.executor import Executor

payload = [11, 22, 33]
ex = Executor(guests.echo(), guests.words([len(payload)] + payload), segment_po2=8)
res = ex.run()
r = prove.prove_segment(guests.echo(), res.segments[0], ps=prove.TEST_PS)
assert prove.verify_segment(r, ps=prove.TEST_PS), "verify failed"
print("e2e prove+verify OK")
bad = r._replace(image_id=jnp.bitwise_xor(r.image_id, jnp.uint32(1)))
assert not prove.verify_segment(bad, ps=prove.TEST_PS), "tampered image_id accepted!"
print("tampered image_id rejected OK")
