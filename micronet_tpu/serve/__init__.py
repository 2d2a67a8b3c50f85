"""Continuous-batched serving (net-new vs the reference; the TensorRT
deploy leg's runtime role, SURVEY.md §2.8, extended to LLM decode)."""

from .sampling import generate_sampled, position_key, sample_token, sample_token_batch
from .scheduler import Request, ServeLoop

__all__ = [
    "Request",
    "ServeLoop",
    "sample_token",
    "sample_token_batch",
    "position_key",
    "generate_sampled",
]
