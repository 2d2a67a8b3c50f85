"""Utilities: honest device timing, profiling, roofline reporting."""

from .profiling import CHIPS, ChipSpec, current_chip, roofline, trace
from .timing import per_step_seconds, throughput

__all__ = [
    "per_step_seconds",
    "throughput",
    "roofline",
    "trace",
    "current_chip",
    "CHIPS",
    "ChipSpec",
]
