"""Continuous-batched serving (net-new vs the reference; the TensorRT
deploy leg's runtime role, SURVEY.md §2.8, extended to LLM decode)."""

from .scheduler import Request, ServeLoop

__all__ = ["Request", "ServeLoop"]
