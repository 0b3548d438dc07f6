"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (the driver separately
dry-runs `__graft_entry__.dryrun_multichip`); benches run on the real TPU.

Note: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (remote TPU relay), so plain os.environ overrides
come too late — we must use jax.config.update before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence AOT-cache spew

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# uint64 Montgomery products on CPU: bit-identical field math, ~2.6x
# smaller traced graphs, >8x faster XLA CPU compiles (core/field.py).
# BT_FIELD_U64=0 opts out (to exercise the exact TPU 16x16-partial path).
if os.environ.get("BT_FIELD_U64", "1") != "0":
    from boundless_tpu.core import field as _field  # noqa: E402

    _field.enable_u64()
