"""DoReFa-Net QAT layers (reference dorefa/quantize.py:76-199).

Stateless: the closed-form quantizers in :mod:`micronet_tpu.quant.dorefa`
carry no observer/scale state, so these layers are just conv/linear with a
fused fake-quant prologue — XLA folds the whole chain into the conv.
"""

from __future__ import annotations

import jax
from flax import nnx

from ..quant import dorefa
from ..quant.config import QuantConfig
from . import functional as F
from .modules import Conv2d, ConvTranspose2d, Linear

__all__ = ["QuantConv2d", "QuantConvTranspose2d", "QuantLinear"]


class QuantConv2d(Conv2d):
    """Conv2d with DoReFa fake-quant on input + weight
    (dorefa/quantize.py:76-118)."""

    def __init__(self, *args, cfg: QuantConfig, rngs: nnx.Rngs, **kwargs):
        super().__init__(*args, rngs=rngs, **kwargs)
        self.a_bits = cfg.a_bits
        self.w_bits = cfg.w_bits
        self.quant_inference = cfg.quant_inference

    def __call__(self, x: jax.Array) -> jax.Array:
        qx = dorefa.quantize_activation(x, self.a_bits)
        w = self.weight.value
        if not self.quant_inference:
            w = dorefa.quantize_weight(w, self.w_bits)
        return F.conv2d(
            qx,
            w,
            None if self.bias is None else self.bias.value,
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
        )


class QuantConvTranspose2d(ConvTranspose2d):
    """ConvTranspose2d with DoReFa fake-quant (dorefa/quantize.py:121-166)."""

    def __init__(self, *args, cfg: QuantConfig, rngs: nnx.Rngs, **kwargs):
        super().__init__(*args, rngs=rngs, **kwargs)
        self.a_bits = cfg.a_bits
        self.w_bits = cfg.w_bits
        self.quant_inference = cfg.quant_inference

    def __call__(self, x: jax.Array) -> jax.Array:
        qx = dorefa.quantize_activation(x, self.a_bits)
        w = self.weight.value
        if not self.quant_inference:
            w = dorefa.quantize_weight(w, self.w_bits)
        return F.conv_transpose2d(
            qx,
            w,
            None if self.bias is None else self.bias.value,
            self.stride,
            self.padding,
            self.output_padding,
            self.dilation,
            self.groups,
        )


class QuantLinear(Linear):
    """Linear with DoReFa fake-quant (dorefa/quantize.py:169-199)."""

    def __init__(self, *args, cfg: QuantConfig, rngs: nnx.Rngs, **kwargs):
        super().__init__(*args, rngs=rngs, **kwargs)
        self.a_bits = cfg.a_bits
        self.w_bits = cfg.w_bits
        self.quant_inference = cfg.quant_inference

    def __call__(self, x: jax.Array) -> jax.Array:
        qx = dorefa.quantize_activation(x, self.a_bits)
        w = self.weight.value
        if not self.quant_inference:
            w = dorefa.quantize_weight(w, self.w_bits)
        return F.linear(qx, w, None if self.bias is None else self.bias.value)
