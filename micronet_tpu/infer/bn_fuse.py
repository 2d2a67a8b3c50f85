"""Post-training BN fusion — both reference schemes (SURVEY.md §2.7).

1. IAO scheme (iao/bn_fuse/bn_fuse.py:20-80): each trained
   ``QuantBNFuseConv2d`` becomes a ``QuantConv2d(quant_inference=True)``
   with weights/bias fused from *running* stats and the quantizer
   scale/zero_point state carried over — the saved quant params reduce to
   scale and zero_point only (reference changelog README.md:135).

2. wbwtab binary-activation scheme (wbwtab/bn_fuse/bn_fuse.py:20-87):
   layers whose output feeds a ``sign`` can fold BN into *bias only*,
   because the positive per-channel scale ``std/gamma`` is
   order-preserving under sign:

   - gamma > 0: ``w' = w``,  ``b' = b - mu + beta * std/gamma``
   - gamma < 0: ``w' = -w``, ``b' = mu - b - beta * std/gamma``
   - gamma == 0: left untouched (both reference masks miss it)

   The binary range is layers 1..N where N = #ActivationQuantizer modules;
   fused layers 2..N become ``QuantConv2d(quant_inference=True)``, layer 1
   and layers past N become plain convs with standard fusion
   ``w * gamma/std``, ``beta + (b - mu) * gamma/std``.

Both walk Conv/BN sibling pairs exactly like the quant transform. Fused
models satisfy the reference's equivalence oracle: eval accuracy of the
train model == accuracy of the fused model (test_infer.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..nn import modules as M
from ..nn import qat_dorefa, qat_iao, qat_wbwtab
from ..nn.transform import _children, _conv_args, _copy_model
from ..quant.config import QuantConfig

__all__ = ["fuse_bn_iao", "fuse_bn_wbwtab", "pre_quantize_weights"]


def _copy_quantizer_state(dst: qat_iao.FakeQuantizer, src: qat_iao.FakeQuantizer):
    """Carry scale/zero_point (+ observer range) into the inference model
    (iao/bn_fuse/bn_fuse.py:57-64)."""
    dst.scale[...] = src.scale[...]
    dst.zero_point[...] = src.zero_point[...]
    dst.min_val[...] = src.min_val[...]
    dst.max_val[...] = src.max_val[...]
    dst.initialized[...] = src.initialized[...]


def _fuse_iao_conv(
    bn_conv: qat_iao.QuantBNFuseConv2d, cfg: QuantConfig, rngs: nnx.Rngs
) -> qat_iao.QuantConv2d:
    mean = bn_conv.running_mean[...]
    std = jnp.sqrt(bn_conv.running_var[...] + bn_conv.eps)
    gamma = bn_conv.gamma[...]
    beta = bn_conv.beta[...]
    w = bn_conv.weight[...]  # HWIO: out-channel broadcast on last axis
    b = bn_conv.bias[...] if bn_conv.bias is not None else jnp.zeros_like(mean)
    w_fused = w * (gamma / std)
    b_fused = beta + (b - mean) * (gamma / std)

    # inherit THIS layer's trained bit widths, not the global config's:
    # under first/last-layer exceptions (QuantConfig) the trained
    # quantizer may be 8-bit while the body is 4 — rebuilding it at the
    # body width reinterprets an 8-bit-range scale as a 4-bit one and
    # crushes the layer's activations 16x (found round 4: the fl8 fused
    # model and engine both collapsed to chance accuracy)
    import dataclasses

    layer_cfg = dataclasses.replace(
        cfg,
        a_bits=bn_conv.activation_quantizer.bits,
        w_bits=bn_conv.weight_quantizer.bits,
    )
    q = qat_iao.QuantConv2d(
        cfg=layer_cfg,
        rngs=rngs,
        **{**_conv_args(bn_conv), "bias": True},
    )
    q.weight[...] = w_fused
    q.bias[...] = b_fused
    _copy_quantizer_state(q.activation_quantizer, bn_conv.activation_quantizer)
    _copy_quantizer_state(q.weight_quantizer, bn_conv.weight_quantizer)
    return q


def fuse_bn_iao(
    model: nnx.Module,
    cfg: QuantConfig,
    *,
    inplace: bool = False,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Module:
    """IAO export: QuantBNFuseConv2d -> QuantConv2d(quant_inference=True)
    (iao/bn_fuse/bn_fuse.py:20-80). ``cfg`` must match training (bits,
    q_type, q_level); ``quant_inference``/``qaft`` are forced so the fused
    model runs frozen."""
    import dataclasses

    cfg = dataclasses.replace(cfg, quant_inference=True, qaft=True, bn_fuse=False)
    if not inplace:
        model = _copy_model(model)
    rngs = rngs or nnx.Rngs(0)

    def rec(module: nnx.Module) -> None:
        for _, child, set_child in _children(module):
            if isinstance(child, qat_iao.QuantBNFuseConv2d):
                set_child(_fuse_iao_conv(child, cfg, rngs))
            else:
                rec(child)

    rec(model)
    pre_quantize_weights(model)
    return model


def pre_quantize_weights(model: nnx.Module) -> nnx.Module:
    """Apply each layer's weight quantizer ONCE, storing the fake-quantized
    weights; with ``quant_inference=True`` only activation fake-quant
    remains at runtime (bn_fused_model_test.py:189-201)."""
    for _, m in nnx.iter_modules(model):
        if isinstance(
            m, (qat_iao.QuantConv2d, qat_iao.QuantConvTranspose2d, qat_iao.QuantLinear)
        ):
            wq = m.weight_quantizer
            if wq.bits in (1, 32):
                continue
            from ..quant.quantizers import fake_quant

            m.weight[...] = fake_quant(
                m.weight[...],
                wq.scale[...],
                wq.zero_point[...],
                wq.qmin,
                wq.qmax,
                wq.min_val[...],
                wq.max_val[...],
                wq.symmetric,
            )
        elif isinstance(
            m, (qat_wbwtab.QuantConv2d, qat_wbwtab.QuantConvTranspose2d)
        ):
            from ..quant import wbwtab as wbq

            q, _ = wbq.quantize_weight(m.weight[...], m.W)
            m.weight[...] = q
        elif isinstance(
            m,
            (
                qat_dorefa.QuantConv2d,
                qat_dorefa.QuantConvTranspose2d,
                qat_dorefa.QuantLinear,
            ),
        ):
            from ..quant import dorefa as dfq

            m.weight[...] = dfq.quantize_weight(m.weight[...], m.w_bits)
    return model


def fuse_bn_wbwtab(
    model: nnx.Module,
    cfg: QuantConfig,
    *,
    inplace: bool = False,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Module:
    """wbwtab export: BN -> bias fusion for the binary-activation range
    (wbwtab/bn_fuse/bn_fuse.py:20-107).

    ``model`` is the float-architecture model with trained wbwtab weights
    (conv/bn pairs intact, ReLU slots quantized or not — only conv/bn/
    ActivationQuantizer placement matters). Returns the inference model:
    binary-range convs 2..N as wbwtab QuantConv2d(quant_inference=True),
    layer 1 and post-range convs as plain Conv2d, all BNs -> Identity.
    """
    import dataclasses

    cfg = dataclasses.replace(cfg, quant_inference=True)
    if not inplace:
        model = _copy_model(model)
    rngs = rngs or nnx.Rngs(0)
    bin_num = sum(
        1
        for _, m in nnx.iter_modules(model)
        if isinstance(m, qat_wbwtab.ActivationQuantizer)
    )
    counter = [0]

    def fuse_pair(conv, bn):
        counter[0] += 1
        k = counter[0]
        mean = np.asarray(bn.running_mean[...])
        std = np.sqrt(np.asarray(bn.running_var[...]) + bn.eps)
        gamma = np.asarray(bn.weight[...])
        beta = np.asarray(bn.bias[...])
        w = np.asarray(conv.weight[...])  # HWIO
        b = (
            np.asarray(conv.bias[...])
            if conv.bias is not None
            else np.zeros_like(mean)
        )
        w_fused = w.copy()
        b_fused = b.copy()
        if 1 <= k <= bin_num:
            pos = gamma > 0
            neg = gamma < 0
            b_fused[pos] = b[pos] - mean[pos] + beta[pos] * (std[pos] / gamma[pos])
            w_fused[..., neg] = -w[..., neg]
            b_fused[neg] = mean[neg] - b[neg] - beta[neg] * (std[neg] / gamma[neg])
        else:
            w_fused = w * (gamma / std)
            b_fused = beta + (b - mean) * (gamma / std)
        args = {**_conv_args(conv), "bias": True}
        if 2 <= k <= bin_num:
            out = qat_wbwtab.QuantConv2d(cfg=cfg, rngs=rngs, **args)
        else:
            out = M.Conv2d(rngs=rngs, **args)
        out.weight[...] = jnp.asarray(w_fused)
        out.bias[...] = jnp.asarray(b_fused)
        return out

    def rec(module: nnx.Module) -> None:
        pending = None
        for _, child, set_child in _children(module):
            if type(child) in (M.Conv2d, qat_wbwtab.QuantConv2d):
                pending = (child, set_child)
            elif type(child) is M.BatchNorm2d and pending is not None:
                conv, set_conv = pending
                pending = None
                set_conv(fuse_pair(conv, child))
                set_child(M.Identity())
            else:
                rec(child)

    rec(model)
    pre_quantize_weights(model)
    return model
