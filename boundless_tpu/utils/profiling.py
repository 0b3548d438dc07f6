"""Per-kernel timing + roofline accounting.

SURVEY.md §5.1 north-star: per-kernel roofline accounting with metrics
feeding the same Prometheus names as the reference. `profile_fn` times a
jitted function; `roofline` reports achieved fraction of peak for a
declared FLOP/byte budget (v5e defaults).
"""

from __future__ import annotations

import dataclasses
import time

import jax

# TPU v5e per-chip peaks (public figures).
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_INT8_TOPS = 394.0
V5E_HBM_GBPS = 819.0


@dataclasses.dataclass
class KernelProfile:
    name: str
    seconds: float
    flops: float = 0.0
    bytes_accessed: float = 0.0

    @property
    def achieved_tflops(self):
        return self.flops / self.seconds / 1e12 if self.seconds else 0.0

    @property
    def achieved_gbps(self):
        return self.bytes_accessed / self.seconds / 1e9 if self.seconds else 0.0

    def roofline(self, peak_tflops=V5E_PEAK_BF16_TFLOPS,
                 hbm_gbps=V5E_HBM_GBPS) -> dict:
        return dict(
            name=self.name,
            seconds=self.seconds,
            achieved_tflops=self.achieved_tflops,
            compute_fraction=self.achieved_tflops / peak_tflops,
            achieved_gbps=self.achieved_gbps,
            bandwidth_fraction=self.achieved_gbps / hbm_gbps,
            bound=("bandwidth" if self.achieved_gbps / hbm_gbps
                   > self.achieved_tflops / peak_tflops else "compute"),
        )


def profile_fn(name, fn, *args, reps=5, flops=0.0, bytes_accessed=0.0,
               **kwargs) -> KernelProfile:
    """Time a (jitted) function: one warmup, then `reps` timed runs."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return KernelProfile(name=name, seconds=(time.time() - t0) / reps,
                         flops=flops, bytes_accessed=bytes_accessed)
