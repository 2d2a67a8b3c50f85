"""Entropy (KL-divergence) calibration — the TensorRT int8 build-time pass.

The reference's deploy leg calibrates int8 engines with TensorRT's
``IInt8EntropyCalibrator2`` + a read/write calibration cache
(deploy/tensorrt/calibrator.py:20-58; the fixed-shape engine generates the
table and the dynamic engine reuses it, eval_trt.py:145-172). The TPU-native
equivalent:

1. Stream calibration batches through a PTQ-prepared model whose activation
   quantizers carry :class:`~micronet_tpu.quant.observers.EntropyState`
   (``QuantConfig(ptq=True, ptq_observer="kl")``) — on-device, jit-friendly.
2. :func:`finalize_entropy_calibration` runs the one-time host-side KL
   threshold search per tensor and writes the result into the quantizer's
   min/max so the ordinary qparams machinery (scale/zero_point) takes over.
3. ``cache=`` gives the TRT calibration-cache behavior: if the file exists
   the thresholds are loaded and applied without any streamed statistics;
   otherwise the computed table is written for reuse.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

__all__ = [
    "kl_threshold",
    "finalize_entropy_calibration",
    "load_calibration_cache",
    "save_calibration_cache",
]


def _smooth_distribution(p: np.ndarray, eps: float = 1e-4):
    """Shift ``eps`` probability onto zero entries (taken pro rata from the
    nonzero ones) so KL(P||Q) stays finite — the standard smoothing used
    with entropy calibration."""
    is_zero = p == 0
    n_zero = int(is_zero.sum())
    n_nonzero = p.size - n_zero
    if n_nonzero == 0:
        return None
    if n_zero == 0:
        return p
    eps1 = eps * n_zero / n_nonzero
    if (p[~is_zero] <= eps1).any():
        return None
    out = p.copy()
    out[is_zero] = eps
    out[~is_zero] -= eps1
    return out


def kl_threshold(
    counts: np.ndarray, absmax: float, num_quantized_bins: int = 128
) -> float:
    """Pick the |x| clip threshold minimizing KL(P || Q) — NVIDIA's entropy
    calibration (the algorithm behind ``IInt8EntropyCalibrator2``).

    For each candidate number of kept bins ``i`` (from ``num_quantized_bins``
    up to the full histogram), the reference distribution ``P`` clips the
    tail mass into the last kept bin; the candidate ``Q`` quantizes the kept
    bins down to ``num_quantized_bins`` levels and expands back over P's
    nonzero support. The threshold is the right edge of the best ``i``.

    Runs once per tensor at engine-build time (host, numpy), like TRT's
    build-time calibration pass.
    """
    counts = np.asarray(counts, np.float64)
    bins = counts.shape[0]
    absmax = float(absmax)
    total = counts.sum()
    if absmax <= 0.0 or total <= 0.0:
        return absmax
    if bins <= num_quantized_bins:
        return absmax
    width = absmax / bins
    nonzero = counts > 0
    best_i, best_kl = bins, np.inf
    for i in range(num_quantized_bins, bins + 1):
        p = counts[:i].copy()
        p[i - 1] += counts[i:].sum()
        nz = nonzero[:i]
        # quantize the i kept bins into num_quantized_bins groups
        idx = np.arange(i) * num_quantized_bins // i
        group_mass = np.bincount(idx, weights=counts[:i], minlength=num_quantized_bins)
        group_support = np.bincount(
            idx, weights=nz.astype(np.float64), minlength=num_quantized_bins
        )
        expand = np.divide(
            group_mass,
            group_support,
            out=np.zeros_like(group_mass),
            where=group_support > 0,
        )
        q = expand[idx] * nz
        if q.sum() <= 0:
            continue
        # eps-smooth both distributions so clipped mass landing where Q has
        # no support is penalized (not masked away) — without this the
        # search is biased toward aggressively small thresholds
        p = _smooth_distribution(p / p.sum())
        q = _smooth_distribution(q / q.sum())
        if p is None or q is None:
            continue
        kl = np.sum(p * np.log(p / q))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return min((best_i + 0.5) * width, absmax)


def _entropy_quantizers(model):
    from flax import nnx

    from ..nn.qat_iao import FakeQuantizer

    for path, mod in nnx.iter_modules(model):
        if (
            isinstance(mod, FakeQuantizer)
            and mod.observer == "entropy"
            and not mod.union
        ):
            yield "/".join(str(p) for p in path), mod


def load_calibration_cache(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}


def save_calibration_cache(path: str, table: Dict[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)


def finalize_entropy_calibration(
    model,
    cache: Optional[str] = None,
    num_quantized_bins: int = 128,
) -> Dict[str, float]:
    """Resolve every entropy-observed quantizer's threshold and refresh its
    scale/zero_point. Returns the calibration table {module_path: threshold}.

    With ``cache``: an existing file short-circuits the KL search (TRT's
    ``read_calibration_cache``, calibrator.py:43-50); otherwise the computed
    table is written (``write_calibration_cache``, :52-57).
    """
    import jax.numpy as jnp

    cached = None
    if cache and os.path.exists(cache):
        cached = load_calibration_cache(cache)
    # a cache substitutes for statistics only when none were streamed
    # (TRT's read_calibration_cache short-circuits a FRESH build); live
    # histograms take precedence and refresh the file, so multi-epoch
    # calibration keeps improving instead of freezing at the first write
    if cached is not None and any(
        bool(fq.initialized[...]) for _, fq in _entropy_quantizers(model)
    ):
        cached = None
    quantizers = list(_entropy_quantizers(model))
    table: Dict[str, float] = {}
    if cached is not None:
        for path, _ in quantizers:
            if path not in cached:
                raise KeyError(
                    f"calibration cache {cache!r} has no entry for {path!r}"
                )
        thresholds = [cached[path] for path, _ in quantizers]
    else:
        counts = np.stack(
            [np.asarray(fq.ent_counts[...], np.float64) for _, fq in quantizers]
        ) if quantizers else np.zeros((0, 1))
        absmax = np.asarray(
            [float(fq.ent_absmax[...]) for _, fq in quantizers], np.float64
        )
        # the O(bins^2)-per-tensor search runs in the native runtime when
        # built (parallel across tensors, micronet_host.cpp), Python
        # reference otherwise — bit-agreement pinned by the test suite
        from ..train.native_loader import kl_thresholds_batch

        native = (
            kl_thresholds_batch(counts, absmax, num_quantized_bins)
            if len(quantizers)
            else None
        )
        if native is not None:
            thresholds = [float(t) for t in native]
        else:
            thresholds = [
                kl_threshold(counts[i], absmax[i], num_quantized_bins)
                for i in range(len(quantizers))
            ]
    for (path, fq), thr in zip(quantizers, thresholds):
        table[path] = float(thr)
        # symmetric qparams use max(|min|, |max|): min stays 0 like the
        # percentile HistogramObserver (iao/quantize.py:116-139)
        fq.max_val[...] = jnp.full_like(fq.max_val[...], thr)
        fq.initialized[...] = jnp.ones((), jnp.bool_)
        fq.update_qparams()
    _refresh_union_scales(model)
    if cache and cached is None:
        save_calibration_cache(cache, table)  # (over)write with fresh stats
    return table


def _refresh_union_scales(model) -> None:
    """Re-derive QuantAdd/QuantConcat shared scales from their (now
    resolved) side observers — during entropy streaming the union min/max
    written in the forward pass was meaningless (iao/quantize.py:1484-1498
    does this refresh every training step; calibration does it once here).
    """
    import jax.numpy as jnp
    from flax import nnx

    from ..nn import qat_iao

    for _, mod in nnx.iter_modules(model):
        if isinstance(mod, qat_iao.QuantAdd):
            sides = (mod.observer_res, mod.observer_shortcut)
        elif isinstance(mod, qat_iao.QuantConcat):
            sides = (mod.observer_a, mod.observer_b)
        else:
            continue
        if any(s.observer != "entropy" for s in sides):
            continue
        uq = mod.activation_quantizer
        uq.min_val[...] = jnp.minimum(sides[0].min_val[...], sides[1].min_val[...])
        uq.max_val[...] = jnp.maximum(sides[0].max_val[...], sides[1].max_val[...])
        uq.initialized[...] = jnp.ones((), jnp.bool_)
        uq.update_qparams()
