"""DoReFa-Net QAT layers (reference dorefa/quantize.py:76-199).

Stateless: the closed-form quantizers in :mod:`micronet_tpu.quant.dorefa`
carry no observer/scale state, so these layers are just conv/linear with a
fused fake-quant prologue — XLA folds the whole chain into the conv.

Code-storage lowering (``QuantConfig.act_codes``, BENCHMARKS.md): the
DoReFa activation grid is ``k / (2^a - 1)`` — integer codes, exact in
bfloat16 for a <= 8 — so on accelerators the contraction consumes bf16
codes and the fixed scale folds into the epilogue, halving the conv's
operand HBM traffic like the IAO path (qat_iao._codes_apply). The fixed
scale and zero zero-point make DoReFa the simplest case: ``conv(qx, w) =
conv(c, w) * s`` with no correction term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..quant import dorefa
from ..quant.config import QuantConfig
from . import functional as F
from .modules import Conv2d, ConvTranspose2d, Linear
from .qat_iao import _act_codes_enabled, _codes_dtype

__all__ = ["QuantConv2d", "QuantConvTranspose2d", "QuantLinear"]


def _codes_out(c, s, w, bias, dtype, contract):
    """contract(codes, w) * s (+ bias) — the epilogue-folded dequant."""
    out = contract(c.astype(dtype), w.astype(dtype))
    out = out.astype(jnp.float32) * s
    return out if bias is None else out + bias


class QuantConv2d(Conv2d):
    """Conv2d with DoReFa fake-quant on input + weight
    (dorefa/quantize.py:76-118)."""

    def __init__(self, *args, cfg: QuantConfig, rngs: nnx.Rngs, **kwargs):
        super().__init__(*args, rngs=rngs, **kwargs)
        self.a_bits = cfg.a_bits
        self.w_bits = cfg.w_bits
        self.quant_inference = cfg.quant_inference
        self.act_codes = _act_codes_enabled(cfg)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = dorefa.quantize_weight(w, self.w_bits)
        bias = None if self.bias is None else self.bias[...]
        if self.act_codes:
            c, s = dorefa.activation_codes(x, self.a_bits)
            return _codes_out(
                c, s, w, bias, _codes_dtype(),
                lambda a, k: F.conv2d(
                    a, k, None, self.stride, self.padding, self.dilation,
                    self.groups, preferred_element_type=None,
                ),
            )
        qx = dorefa.quantize_activation(x, self.a_bits)
        return F.conv2d(
            qx,
            w,
            bias,
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
        self.act_codes = _act_codes_enabled(cfg)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = dorefa.quantize_weight(w, self.w_bits)
        bias = None if self.bias is None else self.bias[...]
        if self.act_codes:
            c, s = dorefa.activation_codes(x, self.a_bits)
            return _codes_out(
                c, s, w, bias, _codes_dtype(),
                lambda a, k: F.conv_transpose2d(
                    a, k, None, self.stride, self.padding,
                    self.output_padding, self.dilation, self.groups,
                    preferred_element_type=None,
                ),
            )
        qx = dorefa.quantize_activation(x, self.a_bits)
        return F.conv_transpose2d(
            qx,
            w,
            bias,
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
        self.act_codes = _act_codes_enabled(cfg)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = dorefa.quantize_weight(w, self.w_bits)
        bias = None if self.bias is None else self.bias[...]
        if self.act_codes:
            c, s = dorefa.activation_codes(x, self.a_bits)
            return _codes_out(
                c, s, w, bias, _codes_dtype(), lambda a, k: jnp.dot(a, k)
            )
        qx = dorefa.quantize_activation(x, self.a_bits)
        return F.linear(qx, w, bias)
