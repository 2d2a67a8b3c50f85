"""Range observers as pure functional reducers over explicit state pytrees.

TPU-native redesign of the reference's stateful observer modules
(iao/quantize.py:15-139). An observer is ``(state, batch) -> state`` where
``state`` is a small pytree of arrays, so it threads through ``jax.jit`` /
``lax.scan`` / ``shard_map`` and checkpoints as plain data.

Granularity (reference ``q_level``):
- ``"L"`` (per-tensor): reduce over all axes -> shape ``(1,)``-like scalars.
- ``"C"`` (per-out-channel conv weight): the reference flattens OIHW from
  dim 1 and reduces (iao/quantize.py:27-30); our conv kernels are HWIO so
  the equivalent is reducing axes (0, 1, 2) with keepdims, giving
  ``(1, 1, 1, O)`` stats that broadcast against the kernel.
- ``"FC"`` (per-row linear weight): torch reduces dim 1 of (out, in); our
  linear kernels are (in, out) so we reduce axis 0 keepdims -> ``(1, out)``.

Rather than hardcode the three letters, state carries its own shape and the
update takes ``axes`` to reduce over — per-tensor/per-channel/per-row are
just different axes, which also generalizes to per-row LLM weights.

First-batch semantics: the reference's ``num_flag`` makes batch 0 overwrite
instead of merge (iao/quantize.py:62-74, 100-113, 131-137). Here that is an
``initialized`` bool carried in the state and resolved with ``jnp.where``
(traceable, no Python branch).

Cross-replica reduction (net-new vs the reference, which only saw the
DataParallel master shard — SURVEY.md §2.9): under ``jit`` with a sharded
batch, XLA all-reduces the min/max reductions automatically (GSPMD); under
``shard_map`` pass ``axis_name`` to reduce explicitly with pmin/pmax/pmean.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "MinMaxState",
    "init_minmax_state",
    "minmax_update",
    "ema_minmax_update",
    "HistogramState",
    "init_histogram_state",
    "histogram_update",
    "EntropyState",
    "init_entropy_state",
    "entropy_update",
    "reduce_min_max",
]


@struct.dataclass
class MinMaxState:
    """Running min/max statistics (+ first-batch flag)."""

    min_val: jax.Array
    max_val: jax.Array
    initialized: jax.Array  # scalar bool


def init_minmax_state(stat_shape: Sequence[int] = (1,)) -> MinMaxState:
    """Zero-initialized state, mirroring the reference's zero buffers
    (iao/quantize.py:43-59)."""
    shape = tuple(stat_shape)
    return MinMaxState(
        min_val=jnp.zeros(shape, jnp.float32),
        max_val=jnp.zeros(shape, jnp.float32),
        initialized=jnp.zeros((), jnp.bool_),
    )


def reduce_min_max(
    x: jax.Array,
    axes: Optional[Sequence[int]] = None,
    stat_shape: Sequence[int] = (1,),
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Current-batch min/max reduced over ``axes`` (None = all axes).

    Result is reshaped to ``stat_shape`` so it matches the stored state
    (the reference's ``resize_`` dance, iao/quantize.py:62-65). If
    ``axis_name`` is given (inside shard_map/pmap), min/max are further
    reduced across that mesh axis — the data-parallel observer sync the
    reference lacks.
    """
    x = x.astype(jnp.float32)
    if axes is None:
        cur_min = jnp.min(x)
        cur_max = jnp.max(x)
    else:
        cur_min = jnp.min(x, axis=tuple(axes), keepdims=True)
        cur_max = jnp.max(x, axis=tuple(axes), keepdims=True)
    if axis_name is not None:
        cur_min = jax.lax.pmin(cur_min, axis_name)
        cur_max = jax.lax.pmax(cur_max, axis_name)
    return (
        jnp.reshape(cur_min, tuple(stat_shape)),
        jnp.reshape(cur_max, tuple(stat_shape)),
    )


def minmax_update(
    state: MinMaxState,
    x: jax.Array,
    axes: Optional[Sequence[int]] = None,
    axis_name: Optional[str] = None,
) -> MinMaxState:
    """Cumulative MinMaxObserver update (iao/quantize.py:39-74).

    Batch 0 overwrites; later batches take elementwise min/max with the
    stored values. Statistics see no gradient (observers run under
    ``torch.no_grad()`` in the reference) — callers hold state outside the
    differentiated params, and we stop_gradient defensively.
    """
    x = jax.lax.stop_gradient(x)
    cur_min, cur_max = reduce_min_max(x, axes, state.min_val.shape, axis_name)
    new_min = jnp.where(state.initialized, jnp.minimum(cur_min, state.min_val), cur_min)
    new_max = jnp.where(state.initialized, jnp.maximum(cur_max, state.max_val), cur_max)
    return MinMaxState(
        min_val=new_min, max_val=new_max, initialized=jnp.ones((), jnp.bool_)
    )


def ema_minmax_update(
    state: MinMaxState,
    x: jax.Array,
    axes: Optional[Sequence[int]] = None,
    momentum: float = 0.1,
    axis_name: Optional[str] = None,
) -> MinMaxState:
    """MovingAverageMinMaxObserver update (iao/quantize.py:77-113).

    EMA ``(1 - m) * stored + m * current`` with first-batch overwrite.
    """
    x = jax.lax.stop_gradient(x)
    cur_min, cur_max = reduce_min_max(x, axes, state.min_val.shape, axis_name)
    ema_min = (1.0 - momentum) * state.min_val + momentum * cur_min
    ema_max = (1.0 - momentum) * state.max_val + momentum * cur_max
    new_min = jnp.where(state.initialized, ema_min, cur_min)
    new_max = jnp.where(state.initialized, ema_max, cur_max)
    return MinMaxState(
        min_val=new_min, max_val=new_max, initialized=jnp.ones((), jnp.bool_)
    )


# --------------------------------------------------------------------------
# Histogram / percentile observer (PTQ calibration)
# --------------------------------------------------------------------------


@struct.dataclass
class HistogramState:
    """Percentile-of-|x| EMA state (symmetric: min stays 0).

    Mirrors HistogramObserver (iao/quantize.py:116-139): ``min_val`` is a
    zero buffer that never updates; ``max_val`` tracks an EMA of the
    per-batch ``kthvalue(|x|, percentile * N)``.
    """

    min_val: jax.Array
    max_val: jax.Array
    initialized: jax.Array


def init_histogram_state(stat_shape: Sequence[int] = (1,)) -> HistogramState:
    shape = tuple(stat_shape)
    return HistogramState(
        min_val=jnp.zeros(shape, jnp.float32),
        max_val=jnp.zeros(shape, jnp.float32),
        initialized=jnp.zeros((), jnp.bool_),
    )


def percentile_absmax(x: jax.Array, percentile: float) -> jax.Array:
    """kth smallest of ``|x|`` with ``k = int(percentile * N)`` (1-indexed),
    matching ``torch.kthvalue`` (iao/quantize.py:129-132).

    Computed as the ``(N - k + 1)``-th largest via ``lax.top_k`` — for the
    high percentiles PTQ uses (0.9999+), ``N - k + 1`` is tiny, so this
    avoids a full sort and stays MXU/VPU-friendly.
    """
    flat = jnp.abs(jnp.ravel(x)).astype(jnp.float32)
    n = flat.shape[0]
    k = int(percentile * n)
    k = max(min(k, n), 1)
    j = n - k + 1  # static
    top = jax.lax.top_k(flat, j)[0]
    return top[-1]


def histogram_update(
    state: HistogramState,
    x: jax.Array,
    percentile: float = 0.9999,
    momentum: float = 0.1,
    axis_name: Optional[str] = None,
) -> HistogramState:
    """HistogramObserver forward (iao/quantize.py:126-139).

    Per-batch percentile abs-max, then EMA with first-batch overwrite.
    ``min_val`` is intentionally left untouched (stays 0): the symmetric
    quantizer built on top uses max(|min|, |max|) so only the max matters.
    """
    x = jax.lax.stop_gradient(x)
    cur = percentile_absmax(x, percentile)
    if axis_name is not None:
        cur = jax.lax.pmax(cur, axis_name)
    cur = jnp.reshape(cur, state.max_val.shape)
    ema = (1.0 - momentum) * state.max_val + momentum * cur
    new_max = jnp.where(state.initialized, ema, cur)
    return HistogramState(
        min_val=state.min_val,
        max_val=new_max,
        initialized=jnp.ones((), jnp.bool_),
    )


# --------------------------------------------------------------------------
# Entropy (KL-divergence) calibrator — the TensorRT int8 calibration leg
# --------------------------------------------------------------------------


@struct.dataclass
class EntropyState:
    """|x| histogram accumulated over calibration batches.

    TPU-native stand-in for the reference's TensorRT
    ``IInt8EntropyCalibrator2`` stream (deploy/tensorrt/calibrator.py:20-58):
    TRT pulls batches through the network collecting per-tensor activation
    histograms, then picks the clip threshold minimizing the KL divergence
    between the float distribution and its int8 quantization. Here the
    histogram is a jit-carried state pytree (streamed on device); the
    one-time KL search runs host-side at engine-build time
    (:func:`micronet_tpu.quant.calibrate.kl_threshold`), exactly like TRT's
    build-time calibration pass.

    ``counts[i]`` holds the mass of ``|x|`` in ``[i*w, (i+1)*w)`` with
    ``w = absmax / bins``. Per-tensor only (TRT entropy calibration is
    per-tensor symmetric).
    """

    counts: jax.Array  # (bins,) float32
    absmax: jax.Array  # scalar float32
    initialized: jax.Array  # scalar bool


def init_entropy_state(bins: int = 2048) -> EntropyState:
    return EntropyState(
        counts=jnp.zeros((bins,), jnp.float32),
        absmax=jnp.zeros((), jnp.float32),
        initialized=jnp.zeros((), jnp.bool_),
    )


def _hist_absx(x: jax.Array, absmax: jax.Array, bins: int) -> jax.Array:
    """Histogram of ``|x|`` over ``[0, absmax]`` with ``bins`` equal bins
    (values at exactly ``absmax`` land in the last bin)."""
    a = jnp.abs(jnp.ravel(x)).astype(jnp.float32)
    w = jnp.maximum(absmax, jnp.finfo(jnp.float32).tiny) / bins
    idx = jnp.clip(jnp.floor(a / w).astype(jnp.int32), 0, bins - 1)
    return jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)


def _rescale_counts(counts: jax.Array, ratio: jax.Array) -> jax.Array:
    """Redistribute a histogram over ``[0, m_old]`` onto the same number of
    bins over ``[0, m_new]`` with ``ratio = m_old / m_new <= 1``.

    Old bin ``i`` spans ``[i*ratio, (i+1)*ratio)`` in new-bin units — at
    most two adjacent new bins — so its count splits linearly between them
    (the merge-with-rescale PyTorch's HistogramObserver uses; keeps the
    streaming single-pass and jit-traceable with a static bin count).
    """
    bins = counts.shape[0]
    i = jnp.arange(bins, dtype=jnp.float32)
    lo = i * ratio
    hi = (i + 1.0) * ratio
    lo_bin = jnp.clip(jnp.floor(lo).astype(jnp.int32), 0, bins - 1)
    hi_bin = jnp.clip(jnp.floor(hi - 1e-12).astype(jnp.int32), 0, bins - 1)
    span = jnp.maximum(hi - lo, 1e-12)
    frac_lo = jnp.clip((jnp.minimum(hi, lo_bin + 1.0) - lo) / span, 0.0, 1.0)
    frac_lo = jnp.where(hi_bin == lo_bin, 1.0, frac_lo)
    out = jnp.zeros((bins,), jnp.float32)
    out = out.at[lo_bin].add(counts * frac_lo)
    out = out.at[hi_bin].add(counts * (1.0 - frac_lo))
    return out


def entropy_update(
    state: EntropyState,
    x: jax.Array,
    axis_name: Optional[str] = None,
) -> EntropyState:
    """Accumulate one calibration batch into the |x| histogram.

    When the batch extends the observed range, the stored histogram is
    rescaled onto the wider grid before merging. Under ``shard_map``,
    ``axis_name`` makes the range global (pmax) and sums the per-replica
    batch histograms (psum) — replicas carry identical accumulated state, so
    only the batch contribution is reduced.
    """
    x = jax.lax.stop_gradient(x)
    bins = state.counts.shape[0]
    cur_max = jnp.max(jnp.abs(x)).astype(jnp.float32)
    if axis_name is not None:
        cur_max = jax.lax.pmax(cur_max, axis_name)
    new_max = jnp.maximum(state.absmax, cur_max)
    ratio = jnp.where(new_max > 0, state.absmax / jnp.maximum(new_max, 1e-30), 1.0)
    old = jnp.where(
        ratio >= 1.0 - 1e-12, state.counts, _rescale_counts(state.counts, ratio)
    )
    batch = _hist_absx(x, new_max, bins)
    if axis_name is not None:
        batch = jax.lax.psum(batch, axis_name)
    return EntropyState(
        counts=old + batch,
        absmax=new_max,
        initialized=jnp.ones((), jnp.bool_),
    )
