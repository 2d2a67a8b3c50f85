"""Inference/export subsystem: BN fusion (both schemes), weight
pre-quantization, paired equivalence eval — the reference's post-training
tools (SURVEY.md §2.7) re-designed as pure tree transforms; the int-sim
integer engine replaces its TensorRT deploy leg."""

from .bf16 import bf16_runner, to_bf16
from .bn_fuse import fuse_bn_iao, fuse_bn_wbwtab, pre_quantize_weights
from .deploy import (
    CompiledEngine,
    build_engine,
    deserialize_engine,
    serialize_engine,
)
from .engine import (
    IntAdd,
    IntConcat,
    IntConv2d,
    IntConvTranspose2d,
    IntLinear,
    TernaryConv2d,
    freeze_int,
    freeze_wbwtab,
)
from .evaluate import evaluate_model, paired_equivalence_eval

__all__ = [
    "fuse_bn_iao",
    "fuse_bn_wbwtab",
    "pre_quantize_weights",
    "freeze_int",
    "freeze_wbwtab",
    "TernaryConv2d",
    "IntConv2d",
    "IntConvTranspose2d",
    "IntLinear",
    "IntAdd",
    "IntConcat",
    "evaluate_model",
    "paired_equivalence_eval",
    "CompiledEngine",
    "build_engine",
    "serialize_engine",
    "deserialize_engine",
    "to_bf16",
    "bf16_runner",
]
