"""Pallas TPU kernels for the quantized hot paths (SURVEY.md §7.6):
int8 matmul with fused activation-quant + dequant epilogue, binary-
activation ternary/binary matmul. XLA reference implementations double as
CPU fallback and numerics oracle.

Design note: QAT fake-quant chains are deliberately NOT standalone Pallas
kernels — they are elementwise, and XLA fuses them into the adjacent
conv/matmul already; a separate kernel would materialize an extra HBM
round-trip. Pallas is spent where fusion does not happen automatically:
the integer matmul with in-kernel activation quantization."""

from .int_matmul import (
    binary_act_matmul,
    int8_linear,
    int8_matmul_dequant,
    int8_matmul_dequant_xla,
    quantize_int8,
)

__all__ = [
    "binary_act_matmul",
    "int8_linear",
    "int8_matmul_dequant",
    "int8_matmul_dequant_xla",
    "quantize_int8",
]
