"""Mesh + sharding helpers for multi-chip proving.

The scaling design (SURVEY.md §2.5, §5.7):

  dp — segments (P1): the throughput axis; independent proofs batch via
       vmap and shard one-per-group. Cross-host, this axis is the
       cluster's task plane (taskdb + hot store over DCN), so dp inside a
       host composes with worker fan-out across hosts.
  tp — trace columns inside one proof (P5): the LDE/NTT/Merkle work for
       different columns is embarrassingly parallel until the DEEP
       combination; XLA GSPMD inserts the (cheap, per-point ext-value)
       reductions. The NTT's row dimension stays local per chip —
       column sharding deliberately avoids inter-chip butterfly
       exchanges at current trace widths (369 cols ≫ chips).

Use `shard_batched_prover` to build a pjit'd multi-segment prover.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, dp=None):
    """Create a (dp, tp) mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        dp = 1
        for cand in (8, 4, 2):
            if n % cand == 0 and cand <= n:
                dp = cand
                break
    tp = n // dp
    return Mesh(np.array(devices[:n]).reshape(dp, tp), ("dp", "tp"))


def shard_batched_prover(air, po2, ps, mesh):
    """Returns (fn, shard_fn): fn proves a batch of segments under the
    mesh; shard_fn places (data_batch, pub_batch, ctrl) with dp/tp
    shardings."""
    from ..prover import stark

    def step(data_b, pub_b, ctrl):
        return jax.vmap(
            lambda d, p: stark.prove(air, d, p, po2, ps, ctrl)
        )(data_b, pub_b)

    fn = jax.jit(step)

    def shard_fn(data_b, pub_b, ctrl):
        data_sh = NamedSharding(mesh, P("dp", None, "tp"))
        ctrl_sh = NamedSharding(mesh, P(None, "tp"))
        rep = NamedSharding(mesh, P())
        data_b = jax.device_put(data_b, data_sh)
        pub_b = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), pub_b)
        ctrl = jax.device_put(ctrl, ctrl_sh)
        return data_b, pub_b, ctrl

    return fn, shard_fn
