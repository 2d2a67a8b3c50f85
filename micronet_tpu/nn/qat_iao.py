"""IAO (integer-arithmetic-only) QAT layers on flax.nnx.

TPU-native re-design of the reference's quant op classes
(iao/quantize.py:325-1498). Quantizer state (observer min/max, scale,
zero_point) lives in :class:`QuantStat` variables — mutable under
``nnx.jit``, excluded from the optimizer, carried in checkpoints. All
compute is NHWC/HWIO and lowers to a single fused XLA computation per layer
(fake-quant chains fold into the conv's epilogue/prologue).

Mode semantics (reference Quantizer.forward, iao/quantize.py:214-240):

- QAT (``training and not qaft``): observer update + qparam refresh each
  step, then fake-quant.
- PTQ: same code path — the driver just runs forward-only with Histogram
  observers (``ptq=True`` picks them at construction).
- QAFT / eval: observers and qparams frozen; fake-quant with stored state.

Granularity mapping (reference q_level, iao/quantize.py:15-36): "L" =
per-tensor; "C" = per-out-channel conv weight — HWIO reduces axes (0,1,2)
to (1,1,1,O); "FC" = per-row linear weight — (in,out) reduces axis 0 to
(1,O).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..quant.config import QuantConfig
from ..quant.observers import (
    EntropyState,
    HistogramState,
    MinMaxState,
    ema_minmax_update,
    entropy_update,
    histogram_update,
    minmax_update,
)
from ..quant.quantizers import (
    asymmetric_qparams,
    fake_quant,
    fake_quant_codes,
    quant_range,
    symmetric_qparams,
)
from . import functional as F
from .modules import Conv2d, ConvTranspose2d, IntPair, Linear, OrderedModule, _pair

__all__ = [
    "QuantStat",
    "QuantConcat",
    "FakeQuantizer",
    "QuantConv2d",
    "QuantConvTranspose2d",
    "QuantBNFuseConv2d",
    "QuantLinear",
    "QuantReLU",
    "QuantLeakyReLU",
    "QuantSigmoid",
    "QuantMaxPool2d",
    "QuantAvgPool2d",
    "QuantAdaptiveAvgPool2d",
    "QuantAdd",
]


class QuantStat(nnx.Variable):
    """Quantizer state (observer min/max, scale, zero_point, BN running
    stats of fused convs). Mirrors the reference's ``register_buffer`` role:
    checkpointed, never optimized (iao/quantize.py:43-59, 181-204)."""


class FakeQuantizer(OrderedModule):
    """One fake-quant chain = observer + qparams + clip-STE round.

    Functional equivalent of the reference's
    {Symmetric,Asymmetric}Quantizer({MinMax,MovingAverage,Histogram}Observer)
    lattice (iao/quantize.py:171-321). ``observer`` picks the reducer;
    ``symmetric`` picks signed ranges + max-|x| scaling vs unsigned +
    min/max affine.

    ``union=True`` reproduces QuantAdd's shared-scale trick
    (iao/quantize.py:1484-1498): the internal observer is bypassed, but
    qparams still refresh each training step from externally assigned
    min/max.
    """

    def __init__(
        self,
        bits: int,
        *,
        symmetric: bool = True,
        is_weight: bool = False,
        stat_shape: Tuple[int, ...] = (1,),
        axes: Optional[Tuple[int, ...]] = None,
        observer: str = "ema",  # "minmax" | "ema" | "histogram" | "entropy"
        momentum: float = 0.1,
        percentile: float = 0.9999,
        qaft: bool = False,
        union: bool = False,
        entropy_bins: int = 2048,
    ):
        self.bits = bits
        self.symmetric = symmetric
        self.is_weight = is_weight
        self.axes = None if axes is None else tuple(axes)
        self.observer = observer
        self.momentum = momentum
        self.percentile = percentile
        self.qaft = qaft
        self.union = union
        self.training = True
        if bits not in (1, 32):
            self.qmin, self.qmax = quant_range(bits, symmetric, is_weight)
        else:
            self.qmin, self.qmax = 0.0, 0.0
        shape = tuple(stat_shape)
        self.min_val = QuantStat(jnp.zeros(shape, jnp.float32))
        self.max_val = QuantStat(jnp.zeros(shape, jnp.float32))
        self.initialized = QuantStat(jnp.zeros((), jnp.bool_))
        self.scale = QuantStat(jnp.ones(shape, jnp.float32))
        self.zero_point = QuantStat(jnp.zeros(shape, jnp.float32))
        if observer == "entropy" and not union:
            # |x| histogram for TRT-style KL calibration (quant/calibrate.py
            # resolves it into max_val at build time). PER-TENSOR ONLY, by
            # design rather than omission: KL calibration exists for
            # ACTIVATIONS (TRT's IInt8EntropyCalibrator2 is per-tensor
            # symmetric), and every activation quantizer in the reference's
            # feature matrix is layer-level (iao/quantize.py:371-374 —
            # activation q_level has no per-channel branch); weights never
            # calibrate via KL (min/max at build). A per-channel stat_shape
            # here would silently pair per-channel scales with a per-tensor
            # threshold, so it is rejected loudly.
            if any(d != 1 for d in shape):
                raise ValueError(
                    "entropy (KL) calibration is per-tensor only: activation "
                    f"quantizers are layer-level; got stat_shape={shape}"
                )
            # union quantizers never observe — their min/max is assigned
            # from the side observers, so they carry no histogram.
            self.ent_counts = QuantStat(jnp.zeros((entropy_bins,), jnp.float32))
            self.ent_absmax = QuantStat(jnp.zeros((), jnp.float32))

    # -- observer ---------------------------------------------------------

    def observe(self, x: jax.Array) -> None:
        """Update min/max statistics from a batch (reference observer
        forward, iao/quantize.py:39-139)."""
        if self.observer == "entropy":
            est = EntropyState(
                self.ent_counts[...], self.ent_absmax[...], self.initialized[...]
            )
            est = entropy_update(est, x)
            self.ent_counts[...] = est.counts
            self.ent_absmax[...] = est.absmax
            self.initialized[...] = est.initialized
            return
        if self.observer == "histogram":
            state = HistogramState(
                self.min_val[...], self.max_val[...], self.initialized[...]
            )
            state = histogram_update(state, x, self.percentile, self.momentum)
        else:
            state = MinMaxState(
                self.min_val[...], self.max_val[...], self.initialized[...]
            )
            if self.observer == "minmax":
                state = minmax_update(state, x, self.axes)
            else:
                state = ema_minmax_update(state, x, self.axes, self.momentum)
        self.min_val[...] = state.min_val
        self.max_val[...] = state.max_val
        self.initialized[...] = state.initialized

    def update_qparams(self) -> None:
        """Refresh scale/zero_point from observer state
        (iao/quantize.py:292-321)."""
        if self.symmetric:
            scale, zp = symmetric_qparams(
                self.min_val[...], self.max_val[...], self.qmin, self.qmax
            )
        else:
            scale, zp = asymmetric_qparams(
                self.min_val[...], self.max_val[...], self.qmin, self.qmax
            )
        self.scale[...] = scale
        self.zero_point[...] = zp

    # -- fake-quant -------------------------------------------------------

    def _check_bits_and_update(self, x: jax.Array) -> None:
        if self.bits == 1:
            raise ValueError(
                "1-bit is not supported by the IAO path; use wbwtab "
                "(reference iao/quantize.py:217-219)"
            )
        if self.training and not self.qaft:
            if not self.union:
                self.observe(x)
            if self.observer != "entropy":
                # entropy calibration defers qparams to the one-time KL
                # search (quant/calibrate.py) — min/max hold no meaning
                # while the histogram streams
                self.update_qparams()

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bits == 32:
            return x
        self._check_bits_and_update(x)
        if self.observer == "entropy" and self.training and not self.qaft:
            # entropy calibration streams the FLOAT network (TRT collects
            # histograms over unquantized activations; quantization only
            # exists after the build-time KL search) — scales are garbage
            # until quant/calibrate.py resolves them, so fake-quanting here
            # would corrupt every downstream observer
            return x
        return fake_quant(
            x,
            self.scale[...],
            self.zero_point[...],
            self.qmin,
            self.qmax,
            self.min_val[...],
            self.max_val[...],
            self.symmetric,
        )

    def codes(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(codes, scale, zero_point) such that ``self(x) == (c + zp) * s``
        bitwise — the operand form of the code-storage training lowering
        (see ``QuantConfig.act_codes``). Runs the same observer/qparam
        update as ``__call__``."""
        self._check_bits_and_update(x)
        return (
            fake_quant_codes(
                x,
                self.scale[...],
                self.zero_point[...],
                self.qmin,
                self.qmax,
                self.min_val[...],
                self.max_val[...],
                self.symmetric,
            ),
            jax.lax.stop_gradient(self.scale[...]),
            jax.lax.stop_gradient(self.zero_point[...]),
        )


def _act_quantizer(cfg: QuantConfig) -> FakeQuantizer:
    """Activation quantizer: always per-tensor; EMA MinMax in QAT, Histogram
    + forced-symmetric in PTQ (iao/quantize.py:359-374, 450-456)."""
    if cfg.ptq:
        return FakeQuantizer(
            cfg.a_bits,
            symmetric=True,
            is_weight=False,
            observer="entropy" if cfg.ptq_observer == "kl" else "histogram",
            percentile=cfg.percentile,
            qaft=cfg.qaft,
        )
    return FakeQuantizer(
        cfg.a_bits,
        symmetric=cfg.symmetric,
        is_weight=False,
        observer="ema",
        qaft=cfg.qaft,
    )


def _weight_quantizer(
    cfg: QuantConfig, stat_shape: Tuple[int, ...], axes: Optional[Tuple[int, ...]]
) -> FakeQuantizer:
    """Weight quantizer: MinMax or EMA by ``weight_observer``; per-channel
    (stat_shape/axes from the caller) or per-layer by ``q_level``; PTQ
    forces symmetric (iao/quantize.py:375-489)."""
    if cfg.q_level != 0:
        stat_shape, axes = (1,), None
    return FakeQuantizer(
        cfg.w_bits,
        symmetric=True if cfg.ptq else cfg.symmetric,
        is_weight=True,
        stat_shape=stat_shape,
        axes=axes,
        observer="minmax" if cfg.weight_observer == 0 else "ema",
        qaft=cfg.qaft,
    )


def _act_codes_enabled(cfg: QuantConfig) -> bool:
    """Resolve ``cfg.act_codes`` (net-new TPU lowering, BENCHMARKS.md):
    "auto" enables the code-storage conv operands on accelerator backends
    only — CPU keeps the exact-f32 composition the parity oracles check.
    Codes must be exact in bfloat16, so the path is limited to ≤ 8 bits.
    PTQ never uses it: calibration is a short forward-only stream, and KL
    calibration requires the float activations to pass through untouched."""
    if cfg.a_bits > 8 or cfg.a_bits in (1, 32) or cfg.ptq:
        return False
    if cfg.act_codes == "on":
        return True
    if cfg.act_codes == "off":
        return False
    return jax.default_backend() != "cpu"


def _codes_dtype():
    """Narrow operand dtype for the code-storage path: bf16 on accelerators
    (codes ≤ 255 are exact; f32 accumulation on the MXU), f32 on CPU."""
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def _acc_stats_enabled(cfg: QuantConfig) -> bool:
    """Resolve the ``bn_stats="acc"`` lowering: derive batch statistics
    from the quantized conv's accumulator, eliminating the stats conv.
    Requires the fake-quant <-> per-channel-fold commutation, which holds
    exactly only for per-channel (q_level==0) SYMMETRIC (q_type==0)
    weight quantizers — other configs fall back to the stats conv.

    "auto" resolves to acc on accelerator backends for eligible configs
    (measured v5e: bn_fuse QAT tax +40% -> +17%, 20-epoch accuracy
    matches the double-conv path on both W8A8 and W4A4 — ACC_TABLE
    cross-check in tests/test_bn_stats_bf16.py and BENCHMARKS.md); CPU
    keeps the exact reference composition the parity oracles require."""
    if cfg.q_level != 0 or cfg.q_type != 0:
        return False
    if cfg.bn_stats == "acc":
        return True
    return cfg.bn_stats == "auto" and jax.default_backend() != "cpu"


def _bf16_stats_enabled(cfg: QuantConfig) -> bool:
    """Resolve ``cfg.bn_stats`` (net-new TPU lowering, BENCHMARKS.md):
    "auto" runs the batch-statistics conv in bf16 on accelerator backends
    only (when the stronger acc lowering doesn't apply) — CPU keeps the
    exact-f32 path the parity oracles check."""
    if cfg.bn_stats == "on":
        return True
    if cfg.bn_stats in ("off", "acc"):
        return False
    return jax.default_backend() != "cpu" and not _acc_stats_enabled(cfg)


def _codes_apply(aq: "FakeQuantizer", x, w, bias, dtype, contract):
    """Quantized contraction over activation CODES (BENCHMARKS.md,
    code-storage lowering).

    ``contract(operand, kernel)`` is the raw (bias-free) conv/matmul in the
    operand dtype. With ``qx = s * (c + zp)``::

        contract(qx, w) = s * (contract(c, w) + zp * contract(ones, w))

    so the fake-quant dequant folds into the epilogue and the conv reads
    1-2-byte codes instead of 4-byte floats. The zero-point correction term
    is a batch-1 contraction of ones — it reproduces the position-dependent
    edge effects of zero padding exactly (same decomposition as the int
    engine's IntConv2d, infer/engine.py). Gradients: ``codes`` carries
    ``clip_mask / s`` (fake_quant_codes), so autodiff yields the
    reference's STE gradients for x and w.
    """
    c, s, zp = aq.codes(x)
    wd = w.astype(dtype)
    out = contract(c.astype(dtype), wd)
    if not aq.symmetric:
        ones = jnp.ones((1,) + tuple(x.shape[1:]), dtype)
        out = out + zp.reshape(()).astype(out.dtype) * contract(ones, wd)
    out = out.astype(jnp.float32) * s.reshape(())
    return out if bias is None else out + bias


class QuantConv2d(Conv2d):
    """Conv2d with fake-quantized input + weight (iao/quantize.py:325-507).

    ``quant_inference=True`` skips the weight fake-quant (weights are
    assumed pre-quantized by the export pass, iao/quantize.py:500-502).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntPair,
        stride: IntPair = 1,
        padding: IntPair = 0,
        dilation: IntPair = 1,
        groups: int = 1,
        bias: bool = True,
        *,
        cfg: QuantConfig,
        rngs: nnx.Rngs,
    ):
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            padding,
            dilation,
            groups,
            bias,
            rngs=rngs,
        )
        self.quant_inference = cfg.quant_inference
        self.act_codes = _act_codes_enabled(cfg)
        self.activation_quantizer = _act_quantizer(cfg)
        self.weight_quantizer = _weight_quantizer(
            cfg, stat_shape=(1, 1, 1, out_channels), axes=(0, 1, 2)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = self.weight_quantizer(w)
        bias = None if self.bias is None else self.bias[...]
        if self.act_codes:
            dt = _codes_dtype()
            return _codes_apply(
                self.activation_quantizer, x, w, bias, dt,
                lambda a, k: F.conv2d(
                    a, k, None, self.stride, self.padding, self.dilation,
                    self.groups, preferred_element_type=None,
                ),
            )
        qx = self.activation_quantizer(x)
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
    """ConvTranspose2d with fake-quant; weight quant is layer-level only
    (the reference has no q_level branch here, iao/quantize.py:510-636)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntPair,
        stride: IntPair = 1,
        padding: IntPair = 0,
        output_padding: IntPair = 0,
        groups: int = 1,
        bias: bool = True,
        dilation: IntPair = 1,
        *,
        cfg: QuantConfig,
        rngs: nnx.Rngs,
    ):
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            padding,
            output_padding,
            groups,
            bias,
            dilation,
            rngs=rngs,
        )
        self.quant_inference = cfg.quant_inference
        self.act_codes = _act_codes_enabled(cfg)
        self.activation_quantizer = _act_quantizer(cfg)
        layer_cfg = dataclasses.replace(cfg, q_level=1)
        self.weight_quantizer = _weight_quantizer(layer_cfg, (1,), None)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = self.weight_quantizer(w)
        bias = None if self.bias is None else self.bias[...]
        if self.act_codes:
            dt = _codes_dtype()
            return _codes_apply(
                self.activation_quantizer, x, w, bias, dt,
                lambda a, k: F.conv_transpose2d(
                    a, k, None, self.stride, self.padding,
                    self.output_padding, self.dilation, self.groups,
                    preferred_element_type=None,
                ),
            )
        qx = self.activation_quantizer(x)
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


class QuantBNFuseConv2d(Conv2d):
    """In-training BN-fused quantized conv (iao/quantize.py:652-994).

    Training (QAT): a float conv produces pre-BN activations whose batch
    mean / *unbiased* variance (``torch.var`` default, iao/quantize.py:854)
    update the running stats, then BN folds into the conv weights/bias:

    - ``bn_fuse_calib=False``: ``w' = w * γ/√(var_batch+eps)``,
      ``b' = β + (b − μ_batch)·γ/√(var_batch+eps)``; quantized conv with b'.
    - ``bn_fuse_calib=True``: weights fuse the (just-updated) *running* var
      — the statistics the deploy-time fusion will use — and the output is
      corrected back to batch statistics:
      ``out = conv(q(x), q(w')) * √(var_run+eps)/√(var_batch+eps) + b'``
      (iao/quantize.py:946-972).

    Eval / QAFT: fuse with running stats, single conv, no updates.

    First-batch seeding: with ``pretrained_model=False`` the first training
    batch overwrites the running stats (``num_flag``,
    iao/quantize.py:856-868) — here an ``initialized`` flag + ``jnp.where``
    so the step stays traceable.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntPair,
        stride: IntPair = 1,
        padding: IntPair = 0,
        dilation: IntPair = 1,
        groups: int = 1,
        bias: bool = False,
        eps: float = 1e-5,
        momentum: float = 0.1,
        *,
        cfg: QuantConfig,
        rngs: nnx.Rngs,
    ):
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            padding,
            dilation,
            groups,
            bias,
            rngs=rngs,
        )
        self.eps = eps
        self.momentum = momentum
        self.pretrained_model = cfg.pretrained_model
        self.qaft = cfg.qaft
        self.bn_fuse_calib = cfg.bn_fuse_calib
        self.quant_inference = cfg.quant_inference
        self.training = True
        # BN affine params are trainable; running stats are state
        # (reference: gamma ~ U(0,1) init, beta = 0, iao/quantize.py:700-702)
        self.gamma = nnx.Param(
            jax.random.uniform(rngs.params(), (out_channels,), jnp.float32)
        )
        self.beta = nnx.Param(jnp.zeros((out_channels,), jnp.float32))
        self.running_mean = QuantStat(jnp.zeros((out_channels,), jnp.float32))
        self.running_var = QuantStat(jnp.ones((out_channels,), jnp.float32))
        self.bn_initialized = QuantStat(jnp.zeros((), jnp.bool_))
        self.act_codes = _act_codes_enabled(cfg)
        self.bf16_stats = _bf16_stats_enabled(cfg)
        self.acc_stats = _acc_stats_enabled(cfg)
        self.activation_quantizer = _act_quantizer(cfg)
        self.weight_quantizer = _weight_quantizer(
            cfg, stat_shape=(1, 1, 1, out_channels), axes=(0, 1, 2)
        )

    def _conv(self, x, w, b):
        return F.conv2d(
            x, w, b, self.stride, self.padding, self.dilation, self.groups
        )

    def _qconv(self, x, qw, b):
        """The QUANTIZED conv: fake-quant the input and convolve — via the
        code-storage lowering when enabled (the stats conv is handled
        separately: f32, or bf16 under the ``bn_stats`` lowering)."""
        if self.act_codes:
            dt = _codes_dtype()
            return _codes_apply(
                self.activation_quantizer, x, qw, b, dt,
                lambda a, k: F.conv2d(
                    a, k, None, self.stride, self.padding, self.dilation,
                    self.groups, preferred_element_type=None,
                ),
            )
        return self._conv(self.activation_quantizer(x), qw, b)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        b = None if self.bias is None else self.bias[...]
        gamma = self.gamma[...]
        beta = self.beta[...]

        if not self.qaft and self.training and self.acc_stats:
            return self._call_acc_stats(x, w, b, gamma, beta)

        if not self.qaft and self.training:
            # float conv for batch statistics (hot loop: the double conv,
            # SURVEY.md §3.1); batch stats keep gradient — the reference's
            # batch_mean/var are differentiable conv outputs
            if self.bf16_stats:
                # bf16-stats lowering (BENCHMARKS.md): the stats conv output
                # is consumed only by the reductions below, so materialize
                # it in bf16 (f32 accumulation in the reductions; the bias
                # folds into the mean analytically — var is bias-invariant).
                # preferred_element_type=None keeps output==operand dtype so
                # the conv VJP is well-typed (same as _codes_apply).
                out_f = F.conv2d(
                    x.astype(jnp.bfloat16),
                    w.astype(jnp.bfloat16),
                    None,
                    self.stride,
                    self.padding,
                    self.dilation,
                    self.groups,
                    preferred_element_type=None,
                )
                batch_mean = jnp.mean(out_f, axis=(0, 1, 2), dtype=jnp.float32)
                if b is not None:
                    batch_mean = batch_mean + b
            else:
                out_f = self._conv(x, w, b).astype(jnp.float32)
                batch_mean = jnp.mean(out_f, axis=(0, 1, 2))
            n = out_f.shape[0] * out_f.shape[1] * out_f.shape[2]
            batch_var = jnp.var(out_f, axis=(0, 1, 2), dtype=jnp.float32) * (
                n / max(n - 1, 1)
            )
            # running-stat update under stop_gradient (reference: no_grad,
            # iao/quantize.py:856-879); first batch overwrites unless
            # pretrained
            m = self.momentum
            sg_mean = jax.lax.stop_gradient(batch_mean)
            sg_var = jax.lax.stop_gradient(batch_var)
            ema_mean = (1 - m) * self.running_mean[...] + m * sg_mean
            ema_var = (1 - m) * self.running_var[...] + m * sg_var
            if self.pretrained_model:
                new_mean, new_var = ema_mean, ema_var
            else:
                seeded = self.bn_initialized[...]
                new_mean = jnp.where(seeded, ema_mean, sg_mean)
                new_var = jnp.where(seeded, ema_var, sg_var)
                self.bn_initialized[...] = jnp.ones((), jnp.bool_)
            self.running_mean[...] = new_mean
            self.running_var[...] = new_var

            inv_batch = gamma / jnp.sqrt(batch_var + self.eps)
            if b is not None:
                bias_fused = beta + (b - batch_mean) * inv_batch
            else:
                bias_fused = beta - batch_mean * inv_batch
            if not self.bn_fuse_calib:
                weight_fused = w * inv_batch  # broadcast over out-channel (HWIO)
            else:
                weight_fused = w * (gamma / jnp.sqrt(new_var + self.eps))

            qw = (
                weight_fused
                if self.quant_inference
                else self.weight_quantizer(weight_fused)
            )
            if not self.bn_fuse_calib:
                return self._qconv(x, qw, bias_fused)
            out = self._qconv(x, qw, None)
            corr = jnp.sqrt(new_var + self.eps) / jnp.sqrt(batch_var + self.eps)
            return out * corr + bias_fused

        # eval / QAFT: fuse with running stats
        inv_run = gamma / jnp.sqrt(self.running_var[...] + self.eps)
        if b is not None:
            bias_fused = beta + (b - self.running_mean[...]) * inv_run
        else:
            bias_fused = beta - self.running_mean[...] * inv_run
        weight_fused = w * inv_run
        qw = (
            weight_fused
            if self.quant_inference
            else self.weight_quantizer(weight_fused)
        )
        return self._qconv(x, qw, bias_fused)

    def _call_acc_stats(self, x, w, b, gamma, beta):
        """Single-conv training step (``bn_stats="acc"``, BENCHMARKS.md).

        With per-channel symmetric weight quantization the fake-quant
        commutes with any per-channel scale s: the observer sees
        max|w*s| = |s|*max|w|, so scale' = |s|*scale and
        ``q(w*s) = q(w)*s`` exactly (round-half-away is odd). Fold the
        weights with the PRE-UPDATE running stats, run the one quantized
        conv, and recover the float pre-BN batch statistics from its
        accumulator by dividing the fold back out:

            acc       = conv(q(x), q(w * inv_run))   [no bias]
            pre_bn    ~ acc / inv_run + b            (exact rescale)
            mean, var = stats(pre_bn)

        The output then rescales the SAME accumulator from the running-var
        fold to the batch-var fold — by the commutation this equals the
        reference's conv(q(x), q(w * inv_batch)) (bn_fuse_calib=False) and
        its calibrated variant (bn_fuse_calib=True output correction,
        iao/quantize.py:957-972) at once, so both calib modes share this
        path. Deviation vs the reference: batch stats are measured through
        the quantized operands instead of a separate float conv — that is
        the entire saving (one conv per step instead of two).
        """
        eps = self.eps
        run_var = self.running_var[...]
        inv_run = gamma / jnp.sqrt(run_var + eps)
        # guard: gamma ~ U(0,1) starts positive but can train through 0;
        # |inv_run| floors at a tiny value so the divide-back stays finite
        safe = jnp.where(jnp.abs(inv_run) < 1e-12, 1e-12, inv_run)
        qw = self.weight_quantizer(w * inv_run)
        acc = self._qconv(x, qw, None)  # (N, H', W', O)

        inv_sg = jax.lax.stop_gradient(safe)
        n = acc.shape[0] * acc.shape[1] * acc.shape[2]
        acc_mean = jnp.mean(acc, axis=(0, 1, 2), dtype=jnp.float32)
        acc_var = jnp.var(acc, axis=(0, 1, 2), dtype=jnp.float32) * (
            n / max(n - 1, 1)
        )
        batch_mean = acc_mean / safe
        if b is not None:
            batch_mean = batch_mean + b
        batch_var = acc_var / jnp.square(safe)

        m = self.momentum
        sg_mean = jax.lax.stop_gradient(batch_mean)
        sg_var = jax.lax.stop_gradient(batch_var)
        ema_mean = (1 - m) * self.running_mean[...] + m * sg_mean
        ema_var = (1 - m) * run_var + m * sg_var
        if self.pretrained_model:
            new_mean, new_var = ema_mean, ema_var
        else:
            seeded = self.bn_initialized[...]
            new_mean = jnp.where(seeded, ema_mean, sg_mean)
            new_var = jnp.where(seeded, ema_var, sg_var)
            self.bn_initialized[...] = jnp.ones((), jnp.bool_)
        self.running_mean[...] = new_mean
        self.running_var[...] = new_var

        inv_batch = gamma / jnp.sqrt(batch_var + eps)
        if b is not None:
            bias_fused = beta + (b - batch_mean) * inv_batch
        else:
            bias_fused = beta - batch_mean * inv_batch
        # rescale running-fold accumulator -> batch fold; gamma cancels,
        # leaving the bn_fuse_calib correction factor exactly
        corr = jnp.sqrt(run_var + eps) / jnp.sqrt(batch_var + eps)
        return acc * corr + bias_fused


class QuantLinear(Linear):
    """Linear with fake-quant; per-row ("FC") weight observers when
    q_level==0 (iao/quantize.py:997-1157)."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        *,
        cfg: QuantConfig,
        rngs: nnx.Rngs,
    ):
        super().__init__(in_features, out_features, bias, rngs=rngs)
        self.quant_inference = cfg.quant_inference
        self.act_codes = _act_codes_enabled(cfg)
        self.activation_quantizer = _act_quantizer(cfg)
        self.weight_quantizer = _weight_quantizer(
            cfg, stat_shape=(1, out_features), axes=(0,)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight[...]
        if not self.quant_inference:
            w = self.weight_quantizer(w)
        bias = None if self.bias is None else self.bias[...]
        if self.act_codes:
            return _codes_apply(
                self.activation_quantizer, x, w, bias, _codes_dtype(),
                lambda a, k: jnp.dot(a, k),
            )
        qx = self.activation_quantizer(x)
        return F.linear(qx, w, bias)


class _QuantActBase(OrderedModule):
    """Activation-only quant wrapper: fake-quant the input, then apply the
    functional op (iao/quantize.py:1160-1438)."""

    def __init__(self, cfg: QuantConfig):
        self.activation_quantizer = _act_quantizer(cfg)


class QuantReLU(_QuantActBase):
    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(self.activation_quantizer(x))


class QuantLeakyReLU(_QuantActBase):
    def __init__(self, negative_slope: float = 0.01, *, cfg: QuantConfig):
        super().__init__(cfg)
        self.negative_slope = negative_slope

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.leaky_relu(self.activation_quantizer(x), self.negative_slope)


class QuantSigmoid(_QuantActBase):
    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.sigmoid(self.activation_quantizer(x))


class QuantMaxPool2d(_QuantActBase):
    def __init__(
        self,
        kernel_size: IntPair,
        stride: Optional[IntPair] = None,
        padding: IntPair = 0,
        *,
        cfg: QuantConfig,
    ):
        super().__init__(cfg)
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride) if stride is not None else self.kernel_size
        self.padding = _pair(padding)

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.max_pool2d(
            self.activation_quantizer(x), self.kernel_size, self.stride, self.padding
        )


class QuantAvgPool2d(_QuantActBase):
    def __init__(
        self,
        kernel_size: IntPair,
        stride: Optional[IntPair] = None,
        padding: IntPair = 0,
        *,
        cfg: QuantConfig,
    ):
        super().__init__(cfg)
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride) if stride is not None else self.kernel_size
        self.padding = _pair(padding)

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.avg_pool2d(
            self.activation_quantizer(x), self.kernel_size, self.stride, self.padding
        )


class QuantAdaptiveAvgPool2d(_QuantActBase):
    def __init__(self, output_size: IntPair, *, cfg: QuantConfig):
        super().__init__(cfg)
        self.output_size = _pair(output_size)

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.adaptive_avg_pool2d(self.activation_quantizer(x), self.output_size)


class QuantConcat(OrderedModule):
    """Quantized concat with a union (shared) scale — the op the reference
    left commented out (iao/quantize.py:1829-1859): both inputs observed,
    the shared quantizer takes the union min/max, and both sides are
    fake-quantized with the SAME scale before concatenation, so the
    int-sim concat is a pure memory op (no per-branch rescale)."""

    def __init__(self, axis: int = -1, *, cfg: QuantConfig):
        if cfg.ptq:
            observer = "entropy" if cfg.ptq_observer == "kl" else "histogram"
        else:
            observer = "ema"
        kw = dict(observer=observer, percentile=cfg.percentile)
        self.axis = axis
        self.qaft = cfg.qaft
        self.training = True
        self.observer_a = FakeQuantizer(cfg.a_bits, symmetric=True, qaft=cfg.qaft, **kw)
        self.observer_b = FakeQuantizer(cfg.a_bits, symmetric=True, qaft=cfg.qaft, **kw)
        self.activation_quantizer = FakeQuantizer(
            cfg.a_bits,
            symmetric=True if cfg.ptq else cfg.symmetric,
            qaft=cfg.qaft,
            union=True,
            **kw,
        )

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        if self.training and not self.qaft:
            self.observer_a.observe(a)
            self.observer_b.observe(b)
            self.activation_quantizer.min_val[...] = jnp.minimum(
                self.observer_a.min_val[...], self.observer_b.min_val[...]
            )
            self.activation_quantizer.max_val[...] = jnp.maximum(
                self.observer_a.max_val[...], self.observer_b.max_val[...]
            )
        qa = self.activation_quantizer(a)
        qb = self.activation_quantizer(b)
        return jnp.concatenate([qa, qb], axis=self.axis)


class QuantAdd(OrderedModule):
    """Quantized residual add with a union (shared) scale
    (iao/quantize.py:1441-1498).

    Two observers watch the two addends; the shared quantizer's min/max is
    set to their union, and both inputs are fake-quantized with the same
    scale before adding, so the int-sim add needs no rescale.

    Deviation from the reference (documented): the reference updates the
    two addend observers unconditionally, even in eval mode
    (iao/quantize.py:1485-1486). Here updates are gated on
    ``training and not qaft`` so eval/inference stays a pure function —
    required for ``jax.jit``/``eval_shape`` of the eval graph and the sane
    semantics anyway. Final accuracy is the parity target, not stat
    trajectories (SURVEY.md §7 hard parts).
    """

    def __init__(self, *, cfg: QuantConfig):
        if cfg.ptq:
            observer = "entropy" if cfg.ptq_observer == "kl" else "histogram"
        else:
            observer = "ema"
        kw = dict(observer=observer, percentile=cfg.percentile)
        self.qaft = cfg.qaft
        self.training = True
        self.observer_res = FakeQuantizer(
            cfg.a_bits, symmetric=True, qaft=cfg.qaft, **kw
        )
        self.observer_shortcut = FakeQuantizer(
            cfg.a_bits, symmetric=True, qaft=cfg.qaft, **kw
        )
        self.activation_quantizer = FakeQuantizer(
            cfg.a_bits,
            symmetric=True if cfg.ptq else cfg.symmetric,
            qaft=cfg.qaft,
            union=True,
            **kw,
        )

    def __call__(self, res: jax.Array, shortcut: jax.Array) -> jax.Array:
        if self.training and not self.qaft:
            self.observer_res.observe(res)
            self.observer_shortcut.observe(shortcut)
            self.activation_quantizer.min_val[...] = jnp.minimum(
                self.observer_res.min_val[...], self.observer_shortcut.min_val[...]
            )
            self.activation_quantizer.max_val[...] = jnp.maximum(
                self.observer_res.max_val[...], self.observer_shortcut.max_val[...]
            )
        quant_res = self.activation_quantizer(res)
        quant_shortcut = self.activation_quantizer(shortcut)
        return quant_res + quant_shortcut
