"""Typed quantization config — the reference's kwargs bag as one dataclass.

The axes below ARE the reference's feature matrix (SURVEY.md §5): every flag
of ``prepare(...)`` (iao/quantize.py:1791-1824) plus the DoReFa and wbwtab
knobs, so one object configures all three flavors.
"""

from __future__ import annotations

import dataclasses

__all__ = ["QuantConfig"]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Configuration for :func:`micronet_tpu.nn.transform.prepare`.

    IAO axes (iao/quantize.py:1791-1806):

    - ``a_bits`` / ``w_bits``: activation / weight bit-widths; 32 = float
      passthrough.
    - ``q_type``: 0 symmetric (signed), 1 asymmetric (unsigned).
    - ``q_level``: 0 per-channel weights ("C"/"FC"), 1 per-layer ("L").
    - ``weight_observer``: 0 cumulative MinMax, 1 EMA MinMax.
    - ``bn_fuse``: in-training Conv+BN fusion (QuantBNFuseConv2d).
    - ``bn_fuse_calib``: fuse weights with running stats + batch-var output
      correction (iao/quantize.py:893-901, 957-972).
    - ``pretrained_model``: running BN stats are pre-seeded — always EMA
      (first batch does not overwrite; iao/quantize.py:856-879).
    - ``qaft``: quantization-aware finetune — observers/qparams/BN frozen.
    - ``ptq``: post-training calibration — activation observers become
      percentile Histogram observers, quantizers forced symmetric.
    - ``percentile``: Histogram observer percentile.
    - ``ptq_observer``: activation calibrator under ``ptq=True``:
      ``"percentile"`` is the reference's HistogramObserver
      (iao/quantize.py:116-139); ``"kl"`` is TensorRT-style entropy
      calibration (deploy/tensorrt/calibrator.py) — stream an |x| histogram,
      then a one-time KL threshold search at build time
      (:mod:`micronet_tpu.quant.calibrate`).
    - ``quant_inference``: weights are pre-quantized; skip weight fake-quant
      at runtime (iao/quantize.py:500-502).
    - ``act_codes``: TPU-first training lowering (net-new vs the reference,
      BENCHMARKS.md): quantized convs/linears consume the small-integer
      CODES of the activation fake-quant as narrow (bf16) operands and fold
      the scale/zero-point into the epilogue — halving the dominant HBM
      traffic of the bandwidth-bound QAT step. ``"auto"`` enables it on
      accelerator backends and keeps the exact-f32 composition on CPU
      (where parity oracles run); ``"on"``/``"off"`` force it. Numerics on
      accelerators stay in the same class as XLA's own default-precision
      bf16 operand cast.
    - ``bn_stats``: companion lowering for ``bn_fuse`` training
      (BENCHMARKS.md): the batch-statistics conv — whose output is consumed
      ONLY by per-channel mean/var reductions — runs with bf16 operands and
      a bf16 materialization (reductions still accumulate in f32, like
      torch AMP batch-norm), halving the stats-conv HBM traffic that
      dominates the bn_fuse step's residual tax. Same "auto"/"on"/"off"
      semantics as ``act_codes``. ``"acc"`` goes further and ELIMINATES
      the stats conv: with per-channel SYMMETRIC weight quantization the
      fake-quant commutes exactly with the per-channel BN fold
      (``q(w*s) = q(w)*s``), so the quantized conv's accumulator — folded
      with the pre-update running stats — is an exact per-channel rescale
      of the float pre-BN output, and the batch mean/var are recovered
      from it analytically. One conv per step instead of two; batch stats
      see the quantized activations (documented deviation — the reference
      measures them on the float conv, iao/quantize.py:843-851). Falls
      back to the stats conv for per-layer or asymmetric weight
      quantizers, where the commutation doesn't hold.

    DoReFa uses ``a_bits``/``w_bits``/``quant_inference`` only.

    wbwtab axes (wbwtab/quantize.py:334-347): ``W`` 2=binary 3=ternary
    32=float; ``A`` 2=binary act 32=relu.
    """

    a_bits: int = 8
    w_bits: int = 8
    # Per-position bit exceptions for the FIRST and LAST quantizable
    # conv/linear in the model (0 = no override). The reference encodes
    # the same insight as hard skips — DoReFa never quantizes the first
    # layer (dorefa/quantize.py:205), wbwtab skips first AND last
    # (wbwtab/quantize.py:319-322) — because the input stem and the
    # classifier are the accuracy-critical extremes at low bits. Here
    # they stay quantized but at a wider width (e.g. 8 while the body
    # runs W4A4), which keeps the whole net on the int engine.
    first_layer_a_bits: int = 0
    first_layer_w_bits: int = 0
    last_layer_a_bits: int = 0
    last_layer_w_bits: int = 0
    q_type: int = 0
    q_level: int = 0
    weight_observer: int = 0
    bn_fuse: bool = False
    bn_fuse_calib: bool = False
    pretrained_model: bool = False
    qaft: bool = False
    ptq: bool = False
    percentile: float = 0.9999
    ptq_observer: str = "percentile"  # "percentile" | "kl"
    quant_inference: bool = False
    act_codes: str = "auto"  # "auto" | "on" | "off"
    bn_stats: str = "auto"  # "auto" | "on" | "off" (bf16 stats conv) | "acc"
    # wbwtab
    W: int = 2
    A: int = 2

    @property
    def symmetric(self) -> bool:
        return self.q_type == 0
