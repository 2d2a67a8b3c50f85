"""Mesh parallelism: data-parallel QAT with auto-reduced observers/BN
stats, channel tensor parallelism, GPipe-style pipeline parallelism
(SURVEY.md §2.9 TPU-native column)."""

from .distributed import dp_shard_map_step, initialize
from .pipeline import pipeline_apply, stack_stage_params
from .sharding import (
    channel_sharding_for,
    make_mesh,
    shard_batch,
    shard_model_and_optimizer,
    shard_state,
)

__all__ = [
    "pipeline_apply",
    "stack_stage_params",
    "initialize",
    "dp_shard_map_step",
    "make_mesh",
    "channel_sharding_for",
    "shard_state",
    "shard_model_and_optimizer",
    "shard_batch",
]
