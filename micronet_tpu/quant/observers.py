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
