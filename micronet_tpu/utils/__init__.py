"""Utilities: honest device timing, profiling, logging."""

from .timing import per_step_seconds, throughput

__all__ = ["per_step_seconds", "throughput"]
