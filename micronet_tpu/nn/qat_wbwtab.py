"""wbwtab QAT layers: ternary/binary weights + binary activations
(reference wbwtab/quantize.py:152-347).

Weight quantization happens inside the conv; activations are binarized by a
separate :class:`ActivationQuantizer` standing where ``ReLU`` was (the
transform swaps it in, wbwtab/quantize.py:319-322).

Projection semantics: the reference's W==2 path mutates the master weight
in place (meancenter+clamp on ``w.data`` before binarization,
wbwtab/quantize.py:98-102). Functionally we use an STE projection —
``w_used = w + stop_grad(center_clamp(w) - w)`` — so the forward sees the
centered weight and the gradient reaches the raw master, which is the same
projected-update dynamics without mutation. :func:`project_params` applies
the write-back explicitly (call it between steps for bit-exact parity with
torch's in-place update).
"""

from __future__ import annotations

import jax
from flax import nnx

from ..quant import wbwtab
from ..quant.config import QuantConfig
from . import functional as F
from .modules import Conv2d, ConvTranspose2d, OrderedModule

__all__ = [
    "ActivationQuantizer",
    "QuantConv2d",
    "QuantConvTranspose2d",
    "project_params",
]


class ActivationQuantizer(OrderedModule):
    """Binary activation (A==2) or plain ReLU (wbwtab/quantize.py:79-94)."""

    def __init__(self, A: int = 2):
        self.A = A

    def __call__(self, x: jax.Array) -> jax.Array:
        return wbwtab.quantize_activation(x, self.A)


def _quant_weight_ste(w: jax.Array, W: int) -> jax.Array:
    """Weight fake-quant. ``quantize_weight`` applies the W==2
    mean-center+clamp internally (differentiably — the clamp masks the
    gradient outside [-1, 1], which plays the role of torch's in-place
    projection); do NOT pre-center here or the centering runs twice."""
    q, _ = wbwtab.quantize_weight(w, W)
    return q


class QuantConv2d(Conv2d):
    """Weight-only quantized conv (wbwtab/quantize.py:152-199).

    ``quant_inference=True`` assumes weights were pre-quantized by the
    export pass (bn_fused_model_test.py:192-194) and skips the quantizer.
    """

    def __init__(self, *args, cfg: QuantConfig, rngs: nnx.Rngs, **kwargs):
        super().__init__(*args, rngs=rngs, **kwargs)
        self.W = cfg.W
        self.quant_inference = cfg.quant_inference

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = _quant_weight_ste(w, self.W)
        return F.conv2d(
            x,
            w,
            None if self.bias is None else self.bias[...],
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
        )


class QuantConvTranspose2d(ConvTranspose2d):
    """Weight-only quantized transposed conv (wbwtab/quantize.py:202-244)."""

    def __init__(self, *args, cfg: QuantConfig, rngs: nnx.Rngs, **kwargs):
        super().__init__(*args, rngs=rngs, **kwargs)
        self.W = cfg.W
        self.quant_inference = cfg.quant_inference

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = _quant_weight_ste(w, self.W)
        return F.conv_transpose2d(
            x,
            w,
            None if self.bias is None else self.bias[...],
            self.stride,
            self.padding,
            self.output_padding,
            self.dilation,
            self.groups,
        )


def project_params(model: nnx.Module) -> None:
    """Write the mean-center+clamp projection back into binary-conv masters,
    matching the reference's in-place ``w.data`` update
    (wbwtab/quantize.py:98-102). Optional: call between optimizer steps."""
    for _, m in model.iter_modules():
        if isinstance(m, (QuantConv2d, QuantConvTranspose2d)) and m.W == 2:
            m.weight[...] = wbwtab.mean_center_clamp(m.weight[...])
