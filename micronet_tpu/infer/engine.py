"""Integer-simulation inference engine — the TPU-native replacement for the
reference's TensorRT deploy leg (deploy/tensorrt/, SURVEY.md §2.8).

``freeze_int`` consumes a BN-fused inference model (from
:func:`..infer.fuse_bn_iao`) and replaces every
``QuantConv2d(quant_inference=True)`` / ``QuantLinear`` with an integer
layer holding:

- ``w_q``: int8 weights ``round(w / s_w)`` (per-channel or per-layer),
- ``w_scale`` (+ activation ``scale`` / ``zero_point``) — the
  scale+zero_point-only artifact the reference reduces its saved quant
  params to (README.md:135), standing in for a serialized TRT engine.

Execution: activations quantize to int8 on the fly, conv/matmul runs in
int8 with int32 accumulation (MXU int path; the 1x1-conv/linear cases go
through the Pallas ``int8_matmul_dequant`` kernel on TPU), and the
epilogue dequantizes + adds bias. Numerics: identical to the fake-quant
model up to f32 accumulation order (the int32 accumulation is exact,
unlike the float conv over dequantized values).

Math note (symmetric activations, zp=0): ``fq(x) = s_x q_x``,
``w_pre = s_w q_w`` => ``conv(fq(x), w_pre) = s_x s_w conv_int(q_x, q_w)``
exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn import modules as M
from ..nn.modules import OrderedModule
from ..nn import qat_iao
from ..nn.transform import _children
from ..ops.int_matmul import int8_linear
from ..quant.rounding import round_half_away

__all__ = [
    "IntConv2d",
    "IntConvTranspose2d",
    "IntLinear",
    "IntMaxPool2d",
    "IntAvgPool2d",
    "IntAdd",
    "IntConcat",
    "TernaryConv2d",
    "freeze_int",
    "freeze_wbwtab",
]


class IntStat(nnx.Variable):
    """Frozen integer-engine state (int8 weights, scales, zero points)."""


def _quantize_weight_int8(w, scale, qmin=-127.0, qmax=127.0):
    q = round_half_away(w / scale)
    return jnp.clip(q, qmin, qmax).astype(jnp.int8)


def _maybe_pack_w4(mod, w_q_2d) -> None:
    """Store symmetric W<=4 codes nibble-packed (2/byte) when the flat
    contraction dim is even; unpacked lazily by ``mod._weights()``."""
    from ..ops.int4_matmul import pack_int4

    if w_q_2d.shape[0] % 2 == 0:
        # full replacement (shape changes K -> ceil(K/2)): indexed [...]
        # assignment is a scatter and requires matching shapes
        mod.w_q.set_value(pack_int4(w_q_2d))
        mod.w_packed = True


class IntConv2d(OrderedModule):
    """Integer conv: int8 in, int8 weights, int32 accumulate, f32 epilogue.

    1x1 stride-1 convs lower to the Pallas int8 matmul on TPU; general
    convs use XLA's int conv (conv_general_dilated with int32 accumulation).
    """

    def __init__(
        self,
        w_q: jax.Array,  # HWIO int8
        w_scale: jax.Array,  # (O,) f32
        act_scale: jax.Array,  # scalar
        act_zero_point: jax.Array,  # scalar
        bias: Optional[jax.Array],
        stride: Tuple[int, int],
        padding: Tuple[int, int],
        dilation: Tuple[int, int],
        groups: int,
        a_qmin: float,
        a_qmax: float,
    ):
        self.w_q = IntStat(w_q)
        self.w_scale = IntStat(w_scale)
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.act_zero_point = IntStat(
            jnp.asarray(act_zero_point, jnp.float32).reshape(())
        )
        # asymmetric weights: per-out-channel zero point of the stored
        # (q_w - 128) int8 pattern; zeros (and w_symmetric) for symmetric
        self.w_symmetric = True
        self.w_zp = IntStat(jnp.zeros((w_q.shape[3],), jnp.float32))
        self.bias = IntStat(bias) if bias is not None else None
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.a_qmin = a_qmin
        self.a_qmax = a_qmax
        # static: symmetric activations have zero_point identically 0, so
        # the position-dependent correction conv can be skipped entirely
        self.symmetric = a_qmin < 0
        # int8 dataflow: when the engine planner chains this layer to the
        # next quantized layer, ``chained=True`` and ``out_scale`` holds the
        # next layer's activation scale; the epilogue then requantizes
        # straight to int8 — activations stay 1 byte end to end (the
        # TensorRT-style int path)
        self.chained = False
        self.out_scale = IntStat(jnp.ones((), jnp.float32))
        self.out_qmin, self.out_qmax = -128.0, 127.0
        # opt-in: the fused Pallas grouped-pointwise kernel beats the XLA
        # conv stand-alone (3.3 vs 4.0 ms at the NIN-GC shapes) but loses
        # badly when embedded in the full engine program in this
        # environment (per-pallas_call overhead); default to XLA
        self.pallas_pointwise = False
        # opt-in: lower 1x1 stride-1 convs to a (batched, for groups) int8
        # dot_general instead of conv_general_dilated. Measured slower than
        # the int8 conv for grouped shapes (benchmarks/engine_layer_profile:
        # L1 3.95 vs 2.91 ms — the group transpose relayout dominates), so
        # off by default; available for ungrouped large-channel cases
        self.pointwise_dot = False
        # default lowering: run the conv on the int8 CODES cast to bf16
        # with f32 accumulation. Bit-exact whenever every dot product fits
        # f32's 24-bit integer window: |codes| <= 128 on both sides means
        # products <= 2^14, so k*k*(Cin/g) <= 1024 elements keep partial
        # sums < 2^24. The MXU's native input type is bf16 — measured
        # faster-or-equal than the int8 conv at every NIN-GC shape
        # (engine_layer_profile: L6 0.113 vs 0.824 ms, L4 1.93 vs 2.22)
        kh, kw, cg, _ = w_q.shape
        self.bf16_codes = kh * kw * cg <= 1024
        # tiny-Cin ungrouped convs (the image-input first layer, Cin=3)
        # waste the MXU's channel lanes on codes; conv over the DEQUANTIZED
        # codes in f32 — exactly the computation the fake-quant model runs,
        # so equivalence is preserved — measures 0.72 vs 1.26 ms at the NIN
        # first-layer shape (engine_layer_profile L0)
        self.f32_dequant = groups == 1 and cg < 8
        # W<=4 weights can be stored nibble-packed (2 codes/byte,
        # ops/int4_matmul.pack_int4): halves checkpoint + HBM weight
        # traffic; codes unpack on the fly (weights are small vs acts)
        self.w_packed = False
        self.w_shape = tuple(w_q.shape)

    def _weights(self) -> jax.Array:
        if not self.w_packed:
            return self.w_q[...]
        from ..ops.int4_matmul import unpack_int4

        kh, kw, cg, co = self.w_shape
        return unpack_int4(self.w_q[...]).reshape(kh, kw, cg, co)

    def _epilogue(self, acc: jax.Array, s_x) -> jax.Array:
        """acc (int32 or f32) -> f32 output or requantized int8 output."""
        out = acc.astype(jnp.float32) * (s_x * self.w_scale[...])
        if self.bias is not None:
            out = out + self.bias[...]
        if not self.chained:
            return out
        q = round_half_away(out / self.out_scale[...])
        return jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)

    def _pointwise_fast_path_ok(self, x: jax.Array) -> bool:
        kh, kw, cg, co = self.w_shape
        return (
            self.pallas_pointwise
            and x.dtype == jnp.int8
            and self.chained
            and self.symmetric
            and self.out_qmin == -128.0
            and (kh, kw) == (1, 1)
            and self.stride == (1, 1)
            and self.padding == (0, 0)
            and self.dilation == (1, 1)
            and cg % 128 == 0
            and (co // self.groups) % 128 == 0
        )

    def _pointwise_dot(self, x_q: jax.Array, s_x) -> jax.Array:
        """1x1 conv as an int8 matmul: (M, C) x (C/g, O) per group with
        int32 accumulation — XLA's int8 dot_general hits the MXU int path
        directly, where its int8 convolution does not at these shapes."""
        n, h, w_, c = x_q.shape
        g = self.groups
        kg, co = self.w_shape[2], self.w_shape[3]
        og = co // g
        w2 = self._weights()[0, 0]  # (kg, co), out channels group-major
        m = n * h * w_
        if g == 1:
            acc = jax.lax.dot_general(
                x_q.reshape(m, c),
                w2,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = acc.astype(jnp.float32) * (s_x * self.w_scale[...])
            if self.bias is not None:
                out = out + self.bias[...]
            if self.chained:
                q = round_half_away(out / self.out_scale[...])
                out = jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)
            return out.reshape(n, h, w_, co)
        # grouped: batched dot over the group axis; outputs (g, M, og)
        xg = x_q.reshape(m, g, kg).transpose(1, 0, 2)
        # out channels are group-major in co: wg[i] = w2[:, i*og:(i+1)*og]
        wg = w2.reshape(kg, g, og).transpose(1, 0, 2)
        acc = jax.lax.dot_general(
            xg,
            wg,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        ws = self.w_scale[...].reshape(g, 1, og)
        out = acc.astype(jnp.float32) * (s_x * ws)
        if self.bias is not None:
            out = out + self.bias[...].reshape(g, 1, og)
        if self.chained:
            q = round_half_away(out / self.out_scale[...])
            out = jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)
        return out.transpose(1, 0, 2).reshape(n, h, w_, co)

    def __call__(self, x: jax.Array) -> jax.Array:
        s_x = self.act_scale[...]
        zp = self.act_zero_point[...]
        if self._pointwise_fast_path_ok(x):
            # fused Pallas path: grouped 1x1 matmul + dequant + bias +
            # requant in one kernel; int32/f32 intermediates stay in VMEM
            from ..ops.int_matmul import int8_grouped_pointwise

            n, h, w_, c = x.shape
            co = self.w_shape[3]
            bias = (
                self.bias[...]
                if self.bias is not None
                else jnp.zeros((co,), jnp.float32)
            )
            out = int8_grouped_pointwise(
                x.reshape(n * h * w_, c),
                self._weights()[0, 0],
                self.w_scale[...],
                bias,
                s_x,
                self.out_scale[...],
                groups=self.groups,
                bm=8192,
            )
            return out.reshape(n, h, w_, co)
        if x.dtype == jnp.int8:
            # chained int8 input: already quantized with OUR act scale by
            # the previous layer's requant epilogue
            x_q = x
        elif self.symmetric:
            q = round_half_away(x.astype(jnp.float32) / s_x) + zp
            x_q = jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)
        if (
            self.pointwise_dot
            and self.symmetric
            and self.w_symmetric
            and self.w_shape[:2] == (1, 1)
            and self.stride == (1, 1)
            and self.padding == (0, 0)
            and self.dilation == (1, 1)
        ):
            return self._pointwise_dot(x_q, s_x)
        if x.dtype != jnp.int8 and not self.symmetric:
            # asymmetric (unsigned) activations. The fake-quant integer
            # value is x_int = clamp(round(x/s) - zp, 0, 255) + zp
            # (iao/quantize.py:227-239, integer zp); store q0 - 128 as
            # int8 and fold the (128 + zp) shift into the correction:
            # conv(x_int, .) = conv(q0 - 128, .) + (128 + zp) * conv(1, .)
            q0 = round_half_away(x.astype(jnp.float32) / s_x) - zp
            q0 = jnp.clip(q0, self.a_qmin, self.a_qmax)
            x_q = (q0 - 128.0).astype(jnp.int8)
        w_int8 = self._weights()
        if self.f32_dequant and self.symmetric and self.w_symmetric:
            x_dq = x_q.astype(jnp.float32) * s_x
            w_dq = w_int8.astype(jnp.float32) * self.w_scale[...]
            out = jax.lax.conv_general_dilated(
                x_dq,
                w_dq,
                window_strides=self.stride,
                padding=tuple((p, p) for p in self.padding),
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
            if self.bias is not None:
                out = out + self.bias[...]
            if not self.chained:
                return out
            q = round_half_away(out / self.out_scale[...])
            return jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)
        if self.bf16_codes and self.symmetric and self.w_symmetric:
            # codes-as-bf16 conv: exact (see __init__) and rides the MXU's
            # native bf16 path; accumulator is already f32
            acc = jax.lax.conv_general_dilated(
                x_q.astype(jnp.bfloat16),
                w_int8.astype(jnp.bfloat16),
                window_strides=self.stride,
                padding=tuple((p, p) for p in self.padding),
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.float32,
            )
        else:
            acc = jax.lax.conv_general_dilated(
                x_q,
                w_int8,
                window_strides=self.stride,
                padding=tuple((p, p) for p in self.padding),
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        kh, kw, cg, co = self.w_shape
        g = self.groups

        def conv_like(inp, ker, pref):
            return jax.lax.conv_general_dilated(
                inp,
                ker,
                window_strides=self.stride,
                padding=tuple((p, p) for p in self.padding),
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
                preferred_element_type=pref,
            )

        ones_in = jnp.ones(x.shape[:3] + (x.shape[3],), jnp.int8)
        if not self.symmetric:
            # activation zero point (+ the -128 storage shift):
            # conv(x_int, .) = conv(x_q0, .) + (128 - zp_x) * conv(1, .)
            corr_w = conv_like(ones_in, w_int8, jnp.int32)
            acc = acc + (128.0 + zp) * corr_w.astype(jnp.float32)
        if not self.w_symmetric:
            # weight zero point: w_int = w_q0 + (128 - zp_w); the cross
            # terms need the per-position input-window sum (one conv with a
            # ones kernel, one output per group) and the window count
            wz = 128.0 + self.w_zp[...]  # (O,): w_int = (q0_w - 128) + 128 + zp_w
            ones_ker = jnp.ones((kh, kw, cg, g), jnp.int8)
            sum_x = conv_like(x_q, ones_ker, jnp.int32).astype(jnp.float32)
            sum_x = jnp.repeat(sum_x, co // g, axis=-1)
            acc = acc + wz * sum_x
            if not self.symmetric:
                count = conv_like(ones_in, ones_ker, jnp.int32).astype(jnp.float32)
                count = jnp.repeat(count, co // g, axis=-1)
                acc = acc + (128.0 + zp) * wz * count
        return self._epilogue(acc, s_x)


class IntConvTranspose2d(OrderedModule):
    """Integer transposed conv (QuantConvTranspose2d frozen,
    iao/quantize.py:510-636): int8 in, int8 weights (LAYER-level scale —
    the reference's transpose conv has no per-channel branch), int32
    accumulate, f32 epilogue. Zero points fold into rank-1 corrections
    exactly as in IntConv2d (a transpose conv is linear too)."""

    def __init__(
        self,
        w_q: jax.Array,  # HWIO int8: (kh, kw, Cin, Cout//groups)
        w_scale: jax.Array,  # scalar
        act_scale: jax.Array,
        act_zero_point: jax.Array,
        bias: Optional[jax.Array],
        stride,
        padding,
        output_padding,
        dilation,
        groups: int,
        a_qmin: float,
        a_qmax: float,
    ):
        self.w_q = IntStat(w_q)
        self.w_scale = IntStat(jnp.asarray(w_scale, jnp.float32).reshape(()))
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.act_zero_point = IntStat(
            jnp.asarray(act_zero_point, jnp.float32).reshape(())
        )
        self.bias = IntStat(bias) if bias is not None else None
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.dilation = dilation
        self.groups = groups
        self.a_qmin, self.a_qmax = a_qmin, a_qmax
        self.symmetric = a_qmin < 0
        self.w_symmetric = True
        self.w_zp = IntStat(jnp.zeros((), jnp.float32))

    def _convt(self, inp, ker):
        from ..nn import functional as F

        return F.conv_transpose2d(
            inp,
            ker,
            None,
            self.stride,
            self.padding,
            self.output_padding,
            self.dilation,
            self.groups,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        s_x = self.act_scale[...]
        zp = self.act_zero_point[...]
        if x.dtype == jnp.int8:
            x_q = x
        elif self.symmetric:
            q = round_half_away(x.astype(jnp.float32) / s_x)
            x_q = jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)
        else:
            q0 = round_half_away(x.astype(jnp.float32) / s_x) - zp
            q0 = jnp.clip(q0, self.a_qmin, self.a_qmax)
            x_q = (q0 - 128.0).astype(jnp.int8)
        acc = self._convt(x_q, self.w_q[...])
        ones_in = jnp.ones(x.shape[:3] + (x.shape[3],), jnp.int8)
        if not self.symmetric:
            acc = acc + (128.0 + zp) * self._convt(ones_in, self.w_q[...])
        if not self.w_symmetric:
            sh_w = 128.0 + self.w_zp[...]  # scalar (layer-level)
            ones_ker = jnp.ones_like(self.w_q[...])
            acc = acc + sh_w * self._convt(x_q, ones_ker)
            if not self.symmetric:
                acc = acc + (128.0 + zp) * sh_w * self._convt(ones_in, ones_ker)
        out = acc * (s_x * self.w_scale[...])
        if self.bias is not None:
            out = out + self.bias[...]
        return out


class IntMaxPool2d(OrderedModule):
    """Frozen QuantMaxPool2d: quantize (or accept chained int8), max-pool in
    int8 (order-preserving under the positive symmetric scale), then either
    requantize to the next layer's scale or dequantize to f32."""

    def __init__(self, kernel_size, stride, padding, act_scale):
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.chained = False
        self.out_scale = IntStat(jnp.ones((), jnp.float32))
        self.a_qmin, self.a_qmax = -128.0, 127.0
        self.out_qmin, self.out_qmax = -128.0, 127.0

    def __call__(self, x: jax.Array) -> jax.Array:
        from ..nn import functional as F

        s = self.act_scale[...]
        if x.dtype != jnp.int8:
            q = round_half_away(x.astype(jnp.float32) / s)
            x = jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)
        y = F.max_pool2d(x, self.kernel_size, self.stride, self.padding)
        if self.chained:
            # pure rescale requant int8 -> int8
            q = round_half_away(y.astype(jnp.float32) * (s / self.out_scale[...]))
            return jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)
        return y.astype(jnp.float32) * s


class IntAvgPool2d(OrderedModule):
    """Frozen QuantAvgPool2d/QuantAdaptiveAvgPool2d: quantize (or accept
    chained int8) at its own scale, then average in f32 — the reference's
    quant pools quantize the INPUT only (iao/quantize.py:1338-1438), so the
    averaged output is float. Receive-only chain node."""

    def __init__(self, kernel_size, stride, padding, act_scale, adaptive_size=None):
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.adaptive_size = adaptive_size
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.a_qmin, self.a_qmax = -128.0, 127.0

    def __call__(self, x: jax.Array) -> jax.Array:
        from ..nn import functional as F

        s = self.act_scale[...]
        if x.dtype != jnp.int8:
            q = round_half_away(x.astype(jnp.float32) / s)
            x = jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)
        xf = x.astype(jnp.float32) * s
        if self.adaptive_size is not None:
            return F.adaptive_avg_pool2d(xf, self.adaptive_size)
        return F.avg_pool2d(xf, self.kernel_size, self.stride, self.padding)


class IntAdd(OrderedModule):
    """Frozen QuantAdd: both inputs share ONE scale (the union-scale design,
    iao/quantize.py:1441-1498), so the integer add needs no rescale — codes
    add directly in int32. Inputs arrive chained int8 (already at the
    shared scale) or f32 (quantized here); the epilogue dequantizes or
    requantizes to the downstream consumer's scale."""

    def __init__(self, act_scale, a_qmin: float, a_qmax: float):
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.a_qmin, self.a_qmax = a_qmin, a_qmax
        self.chained = False
        self.out_scale = IntStat(jnp.ones((), jnp.float32))
        self.out_qmin, self.out_qmax = -128.0, 127.0

    def _inq(self, x: jax.Array) -> jax.Array:
        if x.dtype == jnp.int8:
            return x
        q = round_half_away(x.astype(jnp.float32) / self.act_scale[...])
        return jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        s = self.act_scale[...]
        acc = self._inq(a).astype(jnp.int32) + self._inq(b).astype(jnp.int32)
        if self.chained:
            q = round_half_away(acc.astype(jnp.float32) * (s / self.out_scale[...]))
            return jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)
        return acc.astype(jnp.float32) * s


class IntConcat(OrderedModule):
    """Frozen QuantConcat (union scale, the op the reference stubs out):
    int8 codes at the shared scale concatenate as a pure memory op."""

    def __init__(self, axis: int, act_scale, a_qmin: float, a_qmax: float):
        self.axis = axis
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.a_qmin, self.a_qmax = a_qmin, a_qmax
        self.chained = False
        self.out_scale = IntStat(jnp.ones((), jnp.float32))
        self.out_qmin, self.out_qmax = -128.0, 127.0

    def _inq(self, x: jax.Array) -> jax.Array:
        if x.dtype == jnp.int8:
            return x
        q = round_half_away(x.astype(jnp.float32) / self.act_scale[...])
        return jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        s = self.act_scale[...]
        cat = jnp.concatenate([self._inq(a), self._inq(b)], axis=self.axis)
        if self.chained:
            q = round_half_away(cat.astype(jnp.float32) * (s / self.out_scale[...]))
            return jnp.clip(q, self.out_qmin, self.out_qmax).astype(jnp.int8)
        return cat.astype(jnp.float32) * s


class IntLinear(OrderedModule):
    """Integer linear. Symmetric path runs the Pallas fused kernel;
    asymmetric activations/weights use the same zero-point decomposition
    as IntConv2d: store ``q0 - 128`` as int8 and fold the ``128 + zp``
    shifts into rank-1 correction terms (row/col sums), so the matmul
    itself stays a plain int8 MXU dot."""

    def __init__(self, w_q, w_scale, act_scale, act_zero_point, bias, a_qmin, a_qmax):
        self.w_q = IntStat(w_q)  # (in, out) int8
        self.w_scale = IntStat(w_scale)  # (out,)
        self.act_scale = IntStat(jnp.asarray(act_scale, jnp.float32).reshape(()))
        self.act_zero_point = IntStat(
            jnp.asarray(act_zero_point, jnp.float32).reshape(())
        )
        self.bias = IntStat(bias) if bias is not None else None
        self.a_qmin = a_qmin
        self.a_qmax = a_qmax
        self.symmetric = a_qmin < 0
        self.w_symmetric = True
        self.w_zp = IntStat(jnp.zeros((w_q.shape[1],), jnp.float32))
        self.w_packed = False
        self.w_shape = tuple(w_q.shape)

    def _weights(self) -> jax.Array:
        if not self.w_packed:
            return self.w_q[...]
        from ..ops.int4_matmul import unpack_int4

        return unpack_int4(self.w_q[...])

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.symmetric and self.w_symmetric:
            return int8_linear(
                x,
                self._weights(),
                self.w_scale[...],
                self.act_scale[...],
                self.act_zero_point[...],
                None if self.bias is None else self.bias[...],
                qmin=self.a_qmin,
                qmax=self.a_qmax,
            )
        s_x = self.act_scale[...]
        zp = self.act_zero_point[...]
        lead, k = x.shape[:-1], x.shape[-1]
        x2 = x.reshape(-1, k).astype(jnp.float32)
        if self.symmetric:
            q = round_half_away(x2 / s_x)
            x_q = jnp.clip(q, self.a_qmin, self.a_qmax).astype(jnp.int8)
            sh_x = 0.0  # x_int == x_q
        else:
            # x_int = q0 + zp with q0 = clamp(round(x/s) - zp, 0, 255);
            # store q0 - 128 (fits int8): x_int = x_q + (128 + zp)
            q0 = jnp.clip(round_half_away(x2 / s_x) - zp, self.a_qmin, self.a_qmax)
            x_q = (q0 - 128.0).astype(jnp.int8)
            sh_x = 128.0 + zp
        w_q = self._weights()
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        colsum_w = jnp.sum(w_q.astype(jnp.int32), axis=0).astype(jnp.float32)
        if self.w_symmetric:
            acc = acc + sh_x * colsum_w[None, :]
        else:
            # w_int = w_q + (128 + zp_w[o]); expand the product:
            # x_int.w_int = x_q.w_q + sh_w.rowsum_x + sh_x.colsum_w
            #               + K.sh_x.sh_w
            sh_w = 128.0 + self.w_zp[...]  # (O,)
            rowsum_x = jnp.sum(x_q.astype(jnp.int32), axis=1).astype(jnp.float32)
            acc = (
                acc
                + sh_w[None, :] * rowsum_x[:, None]
                + sh_x * colsum_w[None, :]
                + float(k) * sh_x * sh_w[None, :]
            )
        out = acc * (s_x * self.w_scale[...])[None, :]
        if self.bias is not None:
            out = out + self.bias[...]
        return out.reshape(*lead, w_q.shape[1])


def _freeze_conv(m: qat_iao.QuantConv2d) -> IntConv2d:
    wq_state = m.weight_quantizer
    aq = m.activation_quantizer
    if wq_state.bits > 8 or aq.bits > 8 or 1 in (wq_state.bits, aq.bits):
        raise NotImplementedError(
            "int engine freezes 2..8-bit weights/activations (int8 storage; "
            "sub-8-bit values ride int8 with narrower clip ranges)"
        )
    w_scale = wq_state.scale[...].reshape(-1)  # (O,) or (1,)
    w_scale = jnp.broadcast_to(w_scale, (m.weight[...].shape[3],))
    if wq_state.symmetric:
        w_q = _quantize_weight_int8(
            m.weight[...], w_scale, wq_state.qmin, wq_state.qmax
        )
        w_zp = None
    else:
        # asymmetric weights: w_int = clamp(round(w/s - zp_w), 0, 254) + zp_w;
        # store q0 - 128 (fits int8), shift 128 + zp_w folds into the
        # correction terms
        zp_w = jnp.broadcast_to(
            wq_state.zero_point[...].reshape(-1), (m.weight[...].shape[3],)
        )
        q0 = round_half_away(m.weight[...] / w_scale - zp_w)
        q0 = jnp.clip(q0, wq_state.qmin, wq_state.qmax)
        w_q = (q0 - 128.0).astype(jnp.int8)
        w_zp = zp_w
    out = IntConv2d(
        w_q,
        w_scale,
        aq.scale[...].reshape(()),
        aq.zero_point[...].reshape(()),
        None if m.bias is None else m.bias[...],
        m.stride,
        m.padding,
        m.dilation,
        m.groups,
        aq.qmin,
        aq.qmax,
    )
    if w_zp is not None:
        out.w_symmetric = False
        # stored pattern w_q0 = q_w - 128; its zero point relative to the
        # dequant w = (q_w - zp_w) s_w is (zp_w - 128)... fold as zp_w
        out.w_zp[...] = jnp.asarray(w_zp, jnp.float32)
    elif wq_state.bits <= 4:
        kh, kw, cg, co = out.w_shape
        _maybe_pack_w4(out, w_q.reshape(kh * kw * cg, co))
    return out


def _freeze_convt(m: qat_iao.QuantConvTranspose2d) -> IntConvTranspose2d:
    wq_state = m.weight_quantizer
    aq = m.activation_quantizer
    if wq_state.bits > 8 or aq.bits > 8 or 1 in (wq_state.bits, aq.bits):
        raise NotImplementedError(
            "int engine freezes 2..8-bit weights/activations"
        )
    w_scale = wq_state.scale[...].reshape(())  # layer-level scalar
    if wq_state.symmetric:
        w_q = _quantize_weight_int8(
            m.weight[...], w_scale, wq_state.qmin, wq_state.qmax
        )
        w_zp = None
    else:
        zp_w = wq_state.zero_point[...].reshape(())
        q0 = round_half_away(m.weight[...] / w_scale - zp_w)
        q0 = jnp.clip(q0, wq_state.qmin, wq_state.qmax)
        w_q = (q0 - 128.0).astype(jnp.int8)
        w_zp = zp_w
    out = IntConvTranspose2d(
        w_q,
        w_scale,
        aq.scale[...].reshape(()),
        aq.zero_point[...].reshape(()),
        None if m.bias is None else m.bias[...],
        m.stride,
        m.padding,
        m.output_padding,
        m.dilation,
        m.groups,
        aq.qmin,
        aq.qmax,
    )
    if w_zp is not None:
        out.w_symmetric = False
        out.w_zp[...] = jnp.asarray(w_zp, jnp.float32)
    return out


def _freeze_linear(m: qat_iao.QuantLinear) -> IntLinear:
    wq_state = m.weight_quantizer
    aq = m.activation_quantizer
    if wq_state.bits > 8 or aq.bits > 8 or 1 in (wq_state.bits, aq.bits):
        raise NotImplementedError(
            "int engine freezes 2..8-bit weights/activations"
        )
    w_scale = jnp.broadcast_to(
        wq_state.scale[...].reshape(-1), (m.weight[...].shape[1],)
    )
    if wq_state.symmetric:
        w_q = _quantize_weight_int8(
            m.weight[...], w_scale, wq_state.qmin, wq_state.qmax
        )
        w_zp = None
    else:
        # asymmetric weights: same -128 storage shift as _freeze_conv
        zp_w = jnp.broadcast_to(
            wq_state.zero_point[...].reshape(-1), (m.weight[...].shape[1],)
        )
        q0 = round_half_away(m.weight[...] / w_scale - zp_w)
        q0 = jnp.clip(q0, wq_state.qmin, wq_state.qmax)
        w_q = (q0 - 128.0).astype(jnp.int8)
        w_zp = zp_w
    out = IntLinear(
        w_q,
        w_scale,
        aq.scale[...].reshape(()),
        aq.zero_point[...].reshape(()),
        None if m.bias is None else m.bias[...],
        aq.qmin,
        aq.qmax,
    )
    if w_zp is not None:
        out.w_symmetric = False
        out.w_zp[...] = jnp.asarray(w_zp, jnp.float32)
    elif wq_state.bits <= 4:
        _maybe_pack_w4(out, w_q)
    return out


def freeze_int(
    model: nnx.Module,
    *,
    inplace: bool = False,
    chain_int8: bool = True,
    pallas_pointwise: bool = False,
    example_input: Optional[jax.Array] = None,
) -> nnx.Module:
    """Convert a BN-fused, weight-pre-quantized inference model to the
    integer engine. Handles symmetric and asymmetric (q_type 0/1)
    quantization at bits <= 8, with nibble-packed storage for W4
    (``_maybe_pack_w4``) and ConvTranspose; 1-bit freeze is guarded with
    ``NotImplementedError``.

    With ``chain_int8`` the planner wires each emitter's requantizing
    epilogue to the NEXT quantized layer's activation scale whenever only
    order-preserving modules (ReLU/MaxPool/Identity/Flatten — all exact on
    symmetric int8) sit between them, so activations stay int8 across the
    network: 4x less HBM traffic than bouncing through f32 (the
    engine-level optimization TensorRT performs; net-new here).

    Pass ``example_input`` (batch may be 1; real spatial/channel shape) to
    let the planner TRACE the real dataflow — required for branching
    graphs: residual adds and concats then chain through
    :class:`IntAdd`/:class:`IntConcat` via the union-scale design
    (iao/quantize.py:1441-1498 — both addends share one scale, so the
    integer add needs no rescale). Without it, a leaf-order fallback
    handles single-path graphs only.
    """
    from ..nn.transform import _copy_model

    if not inplace:
        model = _copy_model(model)

    def _freeze_maxpool(m: qat_iao.QuantMaxPool2d):
        aq = m.activation_quantizer
        if aq.bits > 8 or aq.bits == 1 or not aq.symmetric:
            return m
        pool = IntMaxPool2d(
            m.kernel_size, m.stride, m.padding, aq.scale[...].reshape(())
        )
        pool.a_qmin, pool.a_qmax = aq.qmin, aq.qmax
        return pool

    def _freeze_avgpool(m):
        aq = m.activation_quantizer
        if aq.bits > 8 or aq.bits == 1 or not aq.symmetric:
            return m
        if isinstance(m, qat_iao.QuantAdaptiveAvgPool2d):
            pool = IntAvgPool2d(
                None, None, None, aq.scale[...].reshape(()), m.output_size
            )
        else:
            pool = IntAvgPool2d(
                m.kernel_size, m.stride, m.padding, aq.scale[...].reshape(())
            )
        # clip at the a_bits quant range, not int8 storage (the round-3
        # W4A4 divergence class: sub-8-bit codes must clamp where the
        # fake-quant model does)
        pool.a_qmin, pool.a_qmax = aq.qmin, aq.qmax
        return pool

    def _freeze_addcat(m):
        aq = m.activation_quantizer
        if aq.bits > 8 or aq.bits == 1 or not aq.symmetric:
            return m
        if isinstance(m, qat_iao.QuantConcat):
            return IntConcat(m.axis, aq.scale[...].reshape(()), aq.qmin, aq.qmax)
        return IntAdd(aq.scale[...].reshape(()), aq.qmin, aq.qmax)

    def rec(module: nnx.Module) -> None:
        for _, child, set_child in _children(module):
            if type(child) is qat_iao.QuantConv2d:
                set_child(_freeze_conv(child))
            elif type(child) is qat_iao.QuantConvTranspose2d:
                set_child(_freeze_convt(child))
            elif type(child) is qat_iao.QuantLinear:
                set_child(_freeze_linear(child))
            elif type(child) is qat_iao.QuantMaxPool2d:
                set_child(_freeze_maxpool(child))
            elif type(child) is qat_iao.QuantAvgPool2d or type(
                child
            ) is qat_iao.QuantAdaptiveAvgPool2d:
                set_child(_freeze_avgpool(child))
            elif type(child) in (qat_iao.QuantAdd, qat_iao.QuantConcat):
                set_child(_freeze_addcat(child))
            else:
                rec(child)

    rec(model)
    if pallas_pointwise:
        for _, m in nnx.iter_modules(model):
            if isinstance(m, IntConv2d):
                m.pallas_pointwise = True

    if chain_int8 and example_input is not None:
        _plan_chains_dataflow(model, example_input)
    elif chain_int8:
        # leaf-order fallback (no example input to trace with). Only sound
        # for single-path graphs: the last conv of a residual/concat branch
        # is followed in LEAF order by a sibling branch's module, not by
        # its real consumer — so disable on any multi-input graph.
        if any(
            isinstance(m, (IntAdd, IntConcat, qat_iao.QuantAdd, qat_iao.QuantConcat))
            for _, m in nnx.iter_modules(model)
        ):
            return model
        ordered: list = []

        def collect(m: nnx.Module) -> None:
            # leaf modules only: containers (Sequential, ConvBNReLU, ...)
            # are transparent for execution-order chaining
            for _, child, _ in _children(m):
                kids = list(_children(child))
                if kids:
                    collect(child)
                else:
                    ordered.append(child)

        collect(model)
        i = 0
        while i < len(ordered):
            cur = ordered[i]
            if _is_emitter(cur):
                j = i + 1
                while j < len(ordered) and isinstance(ordered[j], _PASSTHROUGH):
                    j += 1
                if j < len(ordered) and _is_receiver(ordered[j]):
                    _link(cur, ordered[j])
            i += 1
    return model


# passthrough modules between chain links: exact on symmetric int8 codes
# (ReLU keeps zero at code 0; max-pool is order-preserving; Identity/
# Flatten are memory ops)
_PASSTHROUGH = (M.ReLU, M.MaxPool2d, M.Identity, M.Flatten)


def _is_emitter(m) -> bool:
    """Emitters can requantize their output to a receiver's int8 scale."""
    return (isinstance(m, IntConv2d) and m.symmetric) or isinstance(
        m, (IntMaxPool2d, IntAdd, IntConcat)
    )


def _is_receiver(m) -> bool:
    """Receivers accept chained int8 quantized at their own act_scale."""
    return (isinstance(m, IntConv2d) and m.symmetric) or isinstance(
        m, (IntMaxPool2d, IntAvgPool2d, IntAdd, IntConcat)
    )


def _link(emitter, receiver) -> None:
    emitter.chained = True
    emitter.out_scale[...] = receiver.act_scale[...]
    emitter.out_qmin = receiver.a_qmin
    emitter.out_qmax = receiver.a_qmax


def _plan_chains_dataflow(model: nnx.Module, example_input: jax.Array) -> None:
    """Trace the real consumer graph and chain every emitter whose output
    feeds exactly one receiver (directly or through passthrough modules).

    Each producer into an IntAdd/IntConcat requantizes to the op's shared
    union scale independently, so residual/concat graphs chain end to end
    except where an output fans out to consumers with different scales
    (those stay f32 — correct by construction)."""
    from .dataflow import trace_dataflow

    node_types = [
        IntConv2d,
        IntConvTranspose2d,
        IntLinear,
        IntMaxPool2d,
        IntAvgPool2d,
        IntAdd,
        IntConcat,
        TernaryConv2d,
        # unfrozen fake-quant layers participate as opaque f32 nodes so
        # chains never jump across them
        qat_iao.QuantConv2d,
        qat_iao.QuantConvTranspose2d,
        qat_iao.QuantLinear,
        qat_iao.QuantReLU,
        qat_iao.QuantLeakyReLU,
        qat_iao.QuantSigmoid,
        qat_iao.QuantMaxPool2d,
        qat_iao.QuantAvgPool2d,
        qat_iao.QuantAdaptiveAvgPool2d,
        qat_iao.QuantAdd,
        qat_iao.QuantConcat,
    ] + list(_PASSTHROUGH)
    trace = trace_dataflow(model, example_input[:1], node_types)
    consumers = trace.consumers()
    counts = trace.call_counts()

    def effective_receivers(m):
        """Non-passthrough consumers reached through passthrough closure;
        None = an output escapes the traced graph (fail safe: no chain)."""
        direct = consumers.get(id(m), [])
        if not direct:
            return None
        seen, out, stack = set(), [], list(direct)
        while stack:
            v = stack.pop()
            if id(v) in seen:
                continue
            seen.add(id(v))
            if isinstance(v, _PASSTHROUGH):
                nxt = consumers.get(id(v), [])
                if not nxt:
                    return None
                stack.extend(nxt)
            else:
                out.append(v)
        return out

    uniq = {}
    for mod, _ in trace.calls:
        uniq.setdefault(id(mod), mod)
    for m in uniq.values():
        # multi-call modules (weight sharing) would need one scale per
        # call site — conservatively left unchained
        if not _is_emitter(m) or counts[id(m)] != 1:
            continue
        recv = effective_receivers(m)
        if recv is None or len(recv) != 1 or recv[0] is m:
            continue
        if _is_receiver(recv[0]):
            _link(m, recv[0])


# --------------------------------------------------------------------------
# wbwtab (ternary/binary) engine
# --------------------------------------------------------------------------


class TernaryConv2d(OrderedModule):
    """Integer execution of a wbwtab conv whose input is binary {-1,+1}.

    Weights decompose as ``w = t * alpha`` with ``t in {-1,0,+1}`` and a
    positive per-out-channel ``alpha`` (wbwtab/quantize.py:105-149). The
    sign activations cast to int8 exactly, the conv runs int8 x int8 with
    int32 accumulation on the MXU, and the epilogue is one multiply by
    alpha (+ the BN-fused bias).
    """

    def __init__(self, w_t, alpha, bias, stride, padding, dilation, groups):
        self.w_t = IntStat(w_t)  # HWIO int8 in {-1,0,+1}
        self.alpha = IntStat(alpha)  # (O,) f32
        self.bias = IntStat(bias) if bias is not None else None
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        # +/-1 products are exact in bf16 and partial sums (<= k*k*Cin/g)
        # sit far inside f32's integer window, so the conv can always ride
        # the MXU's native bf16 path bit-exactly (see IntConv2d.bf16_codes)
        self.bf16_codes = True

    def __call__(self, x: jax.Array) -> jax.Array:
        # inputs are exact {-1.0, +1.0} from the sign activation (or a
        # max-pool of signs); the cast is value-preserving
        x_q = x.astype(jnp.int8) if x.dtype != jnp.int8 else x
        lhs, rhs, pref = (
            (x_q.astype(jnp.bfloat16), self.w_t[...].astype(jnp.bfloat16),
             jnp.float32)
            if self.bf16_codes
            else (x_q, self.w_t[...], jnp.int32)
        )
        acc = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=self.stride,
            padding=tuple((p, p) for p in self.padding),
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=pref,
        )
        out = acc.astype(jnp.float32) * self.alpha[...]
        if self.bias is not None:
            out = out + self.bias[...]
        return out


def freeze_wbwtab(model: nnx.Module, *, inplace: bool = False) -> nnx.Module:
    """Convert a wbwtab BN-fused inference model (``fuse_bn_wbwtab``, with
    weights pre-quantized to ``t * alpha``) into the ternary engine: every
    quant conv becomes a :class:`TernaryConv2d` (int8 pattern + alpha),
    replacing the reference's pre-quantized-float evaluation
    (bn_fused_model_test.py:24-117) with true integer execution."""
    from ..nn import qat_wbwtab
    from ..nn.transform import _copy_model

    if not inplace:
        model = _copy_model(model)

    def freeze(conv):
        w = conv.weight[...]  # = t * alpha, alpha >= 0 per out channel
        alpha = jnp.max(jnp.abs(w), axis=(0, 1, 2))  # (O,)
        safe = jnp.maximum(alpha, 1e-12)
        w_t = round_half_away(w / safe).astype(jnp.int8)
        return TernaryConv2d(
            w_t,
            alpha,
            None if conv.bias is None else conv.bias[...],
            conv.stride,
            conv.padding,
            conv.dilation,
            conv.groups,
        )

    def rec(module: nnx.Module) -> None:
        for _, child, set_child in _children(module):
            if type(child) is qat_wbwtab.QuantConv2d and child.quant_inference:
                set_child(freeze(child))
            else:
                rec(child)

    rec(model)
    return model
