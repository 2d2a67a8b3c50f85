"""Profiling + roofline reporting (SURVEY.md §5: the reference has only
wall-clock prints; BASELINE targets like ">=80% of int4 roofline" need
first-class measurement).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace.
- :func:`roofline` — given measured seconds and a workload's flops/bytes,
  report utilization against a chip's peaks and say which ceiling binds.
- :data:`CHIPS` — peak numbers for common TPU generations (public specs).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Dict, Iterator, Optional

import jax

__all__ = ["ChipSpec", "CHIPS", "current_chip", "roofline", "trace"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_tflops: float
    int8_tops: float
    hbm_gbps: float
    vmem_mb: float = 16.0

    @property
    def int4_tops(self) -> float:
        # int4 matmul runs on the int8 MXU path (no separate int4 unit on
        # v5e); its advantage is bandwidth, not flops
        return self.int8_tops


CHIPS: Dict[str, ChipSpec] = {
    "v4": ChipSpec("v4", bf16_tflops=275, int8_tops=275, hbm_gbps=1228),
    "v5e": ChipSpec("v5e", bf16_tflops=197, int8_tops=394, hbm_gbps=819),
    "v5p": ChipSpec("v5p", bf16_tflops=459, int8_tops=918, hbm_gbps=2765),
    "v6e": ChipSpec("v6e", bf16_tflops=918, int8_tops=1836, hbm_gbps=1640),
}


def current_chip(default: str = "v5e") -> ChipSpec:
    """Best-effort detection from the device kind string."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return CHIPS[default]
    for key in ("v6e", "v5p", "v5e", "v5 lite", "v4"):
        if key.replace(" ", "") in kind.replace(" ", ""):
            return CHIPS["v5e" if "lite" in key else key]
    return CHIPS[default]


def roofline(
    seconds: float,
    *,
    flops: float = 0.0,
    bytes_accessed: float = 0.0,
    dtype: str = "bf16",
    chip: Optional[ChipSpec] = None,
) -> Dict[str, float]:
    """Utilization report for one kernel/step execution.

    Returns compute/bandwidth utilization fractions, the achievable-time
    bound, and ``fraction_of_roofline`` = bound / measured (1.0 = at the
    roofline; the BASELINE int4 target is >= 0.8).
    """
    chip = chip or current_chip()
    peak_flops = {
        "bf16": chip.bf16_tflops * 1e12,
        "f32": chip.bf16_tflops / 8 * 1e12,  # fp32 runs far below bf16 peak
        "int8": chip.int8_tops * 1e12,
        "int4": chip.int4_tops * 1e12,
    }[dtype]
    t_compute = flops / peak_flops if flops else 0.0
    t_memory = bytes_accessed / (chip.hbm_gbps * 1e9) if bytes_accessed else 0.0
    bound = max(t_compute, t_memory)
    return {
        "seconds": seconds,
        "compute_util": t_compute / seconds if seconds else 0.0,
        "bandwidth_util": t_memory / seconds if seconds else 0.0,
        "bound_seconds": bound,
        "fraction_of_roofline": (bound / seconds) if seconds else 0.0,
        "binding": float(t_compute >= t_memory),  # 1.0 compute-bound
    }


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """``with trace("/tmp/trace"):`` — view with TensorBoard's profiler."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
