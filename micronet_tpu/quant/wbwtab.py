"""wbwtab: ternary/binary weights + binary activations.

Reference: wbwtab/quantize.py (347 LoC). ``W == 2`` binary {-1,+1} with a
per-channel |w|-mean scale alpha; ``W == 3`` ternary {-1,0,+1} with a
0.7*E(|w|) threshold and a masked-mean alpha; ``A == 2`` binary activations
via sign with saturate-STE; 32 = float passthrough.

Axis convention: weights are HWIO (TPU/XLA-native), so the reference's
per-out-channel reductions over OIHW dims (3,2,1) become reductions over
axes (0,1,2) here, and its channel-mean over dim 1 (input channels) becomes
axis 2.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .rounding import binary_act, binary_weight, ternary

__all__ = [
    "mean_center_clamp",
    "quantize_weight",
    "quantize_activation",
]

# HWIO: reduce over spatial + input-channel axes, keep out-channel.
_CHANNEL_AXES = (0, 1, 2)
_INPUT_CHANNEL_AXIS = 2


def mean_center_clamp(w: jax.Array) -> jax.Array:
    """In-place weight preprocessing of the reference, made functional.

    Subtract the per-(h, w, out)-filter mean across input channels, then
    clamp to [-1, 1] (``meancenter_clamp_convparams``,
    wbwtab/quantize.py:98-102 — torch mutates ``w.data``; callers that want
    the reference's write-back behaviour assign the result to the parameter).
    """
    mean = jnp.mean(w, axis=_INPUT_CHANNEL_AXIS, keepdims=True)
    return jnp.clip(w - mean, -1.0, 1.0)


def _binary_quantize(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """W==2 branch (wbwtab/quantize.py:118-128): center+clamp, per-channel
    alpha = E(|w|), output = sign(w) * alpha. Returns (quantized, centered)."""
    centered = mean_center_clamp(w)
    alpha = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(centered), axis=_CHANNEL_AXES, keepdims=True)
    )
    return binary_weight(centered) * alpha, centered


def _ternary_quantize(w: jax.Array) -> jax.Array:
    """W==3 branch (wbwtab/quantize.py:129-146).

    threshold = 0.7 * E(|w|) per out-channel; alpha = sum(|w| over
    |w| > thr) / count(|w| > thr) per out-channel; output = t * alpha.
    The mask boundary matches the reference: ``le`` zeroes, ``gt`` counts.
    """
    w_abs = jnp.abs(jax.lax.stop_gradient(w))
    threshold = 0.7 * jnp.mean(w_abs, axis=_CHANNEL_AXES, keepdims=True)
    t = ternary(w, threshold)
    kept = jnp.where(w_abs > threshold, w_abs, 0.0)
    kept_sum = jnp.sum(kept, axis=_CHANNEL_AXES, keepdims=True)
    kept_cnt = jnp.sum(
        (w_abs > threshold).astype(jnp.float32), axis=_CHANNEL_AXES, keepdims=True
    )
    alpha = kept_sum / kept_cnt  # NaN if a channel is fully pruned, as in torch
    return t * alpha


def quantize_weight(w: jax.Array, W: int) -> Tuple[jax.Array, jax.Array]:
    """WeightQuantizer.forward (wbwtab/quantize.py:105-149).

    Returns ``(quantized, new_master)`` where ``new_master`` is the value the
    reference would have left in the parameter after its in-place
    preprocessing (centered+clamped for W==2; unchanged otherwise).
    """
    if W == 2:
        q, centered = _binary_quantize(w)
        return q, centered
    if W == 3:
        return _ternary_quantize(w), w
    return w, w


def quantize_activation(x: jax.Array, A: int) -> jax.Array:
    """ActivationQuantizer.forward (wbwtab/quantize.py:79-94).

    A==2: binary sign with saturate-STE. Otherwise plain ReLU — this module
    *replaces* nn.ReLU in the rewritten net, so the float path must still
    rectify.
    """
    if A == 2:
        return binary_act(x)
    return jax.nn.relu(x)
