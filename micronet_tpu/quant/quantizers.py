"""IAO (Google integer-arithmetic-only, arXiv 1712.05877) fake-quant core.

Pure-functional redesign of the reference's Quantizer class hierarchy
(iao/quantize.py:171-321). Quantization parameters (scale, zero_point) are
explicit arrays computed from observer state; the fake-quant forward is a
single fused expression XLA folds into neighbouring ops (and which
``micronet_tpu.ops`` also provides as a hand-written Pallas kernel).

Range table (iao/quantize.py:243-288):

=============  ========  =======================  ====================
quantizer      tensor    qmin                     qmax
=============  ========  =======================  ====================
signed         weight    -(2^(b-1) - 1)           2^(b-1) - 1
signed         act       -2^(b-1)                 2^(b-1) - 1
unsigned       weight    0                        2^b - 2
unsigned       act       0                        2^b - 1
=============  ========  =======================  ====================

Symmetric quant is signed; asymmetric quant is unsigned (the reference
pairs them this way: SymmetricQuantizer(SignedQuantizer),
AsymmetricQuantizer(UnsignedQuantizer), iao/quantize.py:292-321).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rounding import clip_ste_round, round_half_away

__all__ = [
    "FLOAT32_EPS",
    "quant_range",
    "symmetric_qparams",
    "asymmetric_qparams",
    "fake_quant",
    "fake_quant_codes",
]

# torch.finfo(torch.float32).eps, the reference's scale floor
# (iao/quantize.py:205-207, :303, :316).
FLOAT32_EPS = float(np.finfo(np.float32).eps)


def quant_range(bits: int, symmetric: bool, is_weight: bool) -> Tuple[float, float]:
    """(qmin, qmax) per the reference's Signed/UnsignedQuantizer table."""
    if symmetric:  # signed
        if is_weight:
            return (-float((1 << (bits - 1)) - 1), float((1 << (bits - 1)) - 1))
        return (-float(1 << (bits - 1)), float((1 << (bits - 1)) - 1))
    # asymmetric -> unsigned
    if is_weight:
        return (0.0, float((1 << bits) - 2))
    return (0.0, float((1 << bits) - 1))


def symmetric_qparams(
    min_val: jax.Array,
    max_val: jax.Array,
    qmin: float,
    qmax: float,
    eps: float = FLOAT32_EPS,
) -> Tuple[jax.Array, jax.Array]:
    """SymmetricQuantizer.update_qparams (iao/quantize.py:292-305).

    ``scale = max(|min|, |max|) / ((qmax - qmin) / 2)`` floored at eps;
    ``zero_point = 0``.
    """
    quant_half_range = (qmax - qmin) / 2.0
    float_range = jnp.maximum(jnp.abs(min_val), jnp.abs(max_val))
    scale = jnp.maximum(float_range / quant_half_range, eps)
    return scale, jnp.zeros_like(scale)


def asymmetric_qparams(
    min_val: jax.Array,
    max_val: jax.Array,
    qmin: float,
    qmax: float,
    eps: float = FLOAT32_EPS,
) -> Tuple[jax.Array, jax.Array]:
    """AsymmetricQuantizer.update_qparams (iao/quantize.py:309-321).

    ``scale = (max - min) / (qmax - qmin)`` floored at eps;
    ``zero_point = sign(min) * floor(|min / scale| + 0.5)``.
    """
    scale = jnp.maximum((max_val - min_val) / (qmax - qmin), eps)
    zero_point = jnp.sign(min_val) * jnp.floor(jnp.abs(min_val / scale) + 0.5)
    return scale, zero_point


def fake_quant_codes(
    x: jax.Array,
    scale: jax.Array,
    zero_point: jax.Array,
    qmin: float,
    qmax: float,
    obs_min: jax.Array,
    obs_max: jax.Array,
    symmetric: bool,
) -> jax.Array:
    """The integer CODES under :func:`fake_quant`, with STE gradient.

    Returns ``q = clamp(round(x/s - zp), qmin, qmax)`` as an f32 carrier
    whose values are exact small integers, such that
    ``fake_quant(x, ...) == (q + zp) * s`` bitwise. The gradient w.r.t.
    ``x`` is ``clip_mask / s`` — exactly ``d fake_quant/dx / s`` — so a
    consumer computing ``s * conv(q, w)`` reproduces the reference's
    forward AND backward while moving only 1-2-byte code operands through
    HBM instead of 4-byte dequantized floats (the code-storage training
    lowering, BENCHMARKS.md). Pure HLO: ``clip(v, lo, hi)`` carries the
    clip-STE gradient (1 inside the observer range incl. boundary, 0
    outside — iao/quantize.py:163-168) and the rounded code rides on top
    under stop_gradient via the bit-exact ``(base - sg(base)) + sg(q)``
    carrier (base - base == 0 exactly).
    """
    x = x.astype(jnp.float32)
    scale = jax.lax.stop_gradient(scale)
    zero_point = jax.lax.stop_gradient(zero_point)
    lo = jax.lax.stop_gradient(obs_min / scale - zero_point)
    hi = jax.lax.stop_gradient(obs_max / scale - zero_point)
    if symmetric:
        bound = jnp.maximum(jnp.abs(lo), jnp.abs(hi))
        lo, hi = -bound, bound
    v = x / scale - zero_point
    base = jnp.clip(v, lo, hi)
    q_val = jnp.clip(round_half_away(v), qmin, qmax)
    return (base - jax.lax.stop_gradient(base)) + jax.lax.stop_gradient(q_val)


def fake_quant(
    x: jax.Array,
    scale: jax.Array,
    zero_point: jax.Array,
    qmin: float,
    qmax: float,
    obs_min: jax.Array,
    obs_max: jax.Array,
    symmetric: bool,
) -> jax.Array:
    """Quantizer.forward fake-quant chain (iao/quantize.py:227-239).

    ``out = (clamp(clip_ste_round(x / s - zp), qmin, qmax) + zp) * s``

    The clip-STE bounds are the observer range expressed in quantized units
    (Round.apply receives ``obs_min/s - zp`` / ``obs_max/s - zp``; for the
    symmetric case the bound becomes ``±max(|lo|, |hi|)``,
    iao/quantize.py:147-156). scale/zero_point/bounds carry no gradient
    (buffers in the reference); the clip carries torch.clamp's gradient
    masking — see :func:`fake_quant_codes` for the STE carrier details
    (identical fwd+bwd values to the old ``clip_ste_round`` composition,
    but one fusable elementwise chain instead of an opaque custom_vjp).
    """
    dtype = x.dtype
    scale = jax.lax.stop_gradient(scale)
    zero_point = jax.lax.stop_gradient(zero_point)
    q = fake_quant_codes(
        x, scale, zero_point, qmin, qmax, obs_min, obs_max, symmetric
    )
    return ((q + zero_point) * scale).astype(dtype)


def quantize_int(
    x: jax.Array,
    scale: jax.Array,
    zero_point: jax.Array,
    qmin: float,
    qmax: float,
    dtype=jnp.int8,
) -> jax.Array:
    """True-integer quantization (no dequant): the int-sim inference path.

    ``q = clamp(round_half_away(x / s - zp), qmin, qmax)`` stored as an
    integer dtype. Pair with a scale/zero_point-only checkpoint — the
    reference reduces saved quant params to exactly these two
    (README.md:135).
    """
    q = round_half_away(x / scale - zero_point)
    return jnp.clip(q, qmin, qmax).astype(dtype)


def dequantize_int(q: jax.Array, scale: jax.Array, zero_point: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_int`."""
    return (q.astype(jnp.float32) + zero_point) * scale
