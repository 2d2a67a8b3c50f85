"""Mesh parallelism: data-parallel QAT with auto-reduced observers/BN
stats, channel tensor parallelism, GPipe-style pipeline parallelism,
expert-parallel MoE, and ring-attention sequence parallelism
(SURVEY.md §2.9 TPU-native column)."""

from .distributed import dp_shard_map_step, initialize
from .moe import (
    MoEParams,
    init_moe,
    load_balance_loss,
    moe_apply,
    moe_apply_ep,
    moe_apply_ep_a2a,
    quantize_moe,
)
from .pipeline import pipeline_apply, pipeline_apply_stateful, stack_stage_params
from .sequence import attention_reference, ring_attention
from .sharding import (
    channel_sharding_for,
    make_mesh,
    shard_batch,
    shard_model_and_optimizer,
    shard_state,
)

__all__ = [
    "MoEParams",
    "init_moe",
    "quantize_moe",
    "moe_apply",
    "moe_apply_ep",
    "moe_apply_ep_a2a",
    "load_balance_loss",
    "pipeline_apply",
    "pipeline_apply_stateful",
    "stack_stage_params",
    "ring_attention",
    "attention_reference",
    "initialize",
    "dp_shard_map_step",
    "make_mesh",
    "channel_sharding_for",
    "shard_state",
    "shard_model_and_optimizer",
    "shard_batch",
]
