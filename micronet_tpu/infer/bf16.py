"""bf16 inference mode — the TensorRT fp16-engine flag, TPU-native.

The reference's deploy leg exposes fp16 engines via a builder flag
(``deploy/tensorrt/util_trt.py:56-70``). On TPU the half-precision
operand type is bfloat16 (the MXU's native input format): casting params
and inputs to bf16 halves HBM traffic while every contraction still
accumulates in f32 (``nn/functional.py`` passes
``preferred_element_type=f32`` and casts results back to the operand
dtype, so the whole network stays bf16 end to end).

Measured on v5e (BENCHMARKS.md): bf16 eval 71,182 img/s vs 70,731 fp32
at NIN-GC batch 1024 — compute-bound there; memory-bound models gain
proportionally more.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["to_bf16", "bf16_runner"]


def to_bf16(model: nnx.Module) -> nnx.Module:
    """Cast every float leaf of the model's state to bfloat16, in place.

    Intended for eval-mode models (fused exports, engines, float models);
    training state (Adam moments, BN stat accumulation) wants f32 —
    convert after export, like TRT builds the fp16 engine from the f32
    network.
    """

    def cast(leaf):
        if isinstance(leaf, jax.Array) and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            return leaf.astype(jnp.bfloat16)
        return leaf

    nnx.update(model, jax.tree.map(cast, nnx.state(model)))
    return model


def bf16_runner(model: nnx.Module):
    """A callable that feeds the bf16 model bf16 inputs and returns f32
    outputs — the drop-in serving entry point."""

    def run(x: jax.Array) -> jax.Array:
        return model(x.astype(jnp.bfloat16)).astype(jnp.float32)

    return run
