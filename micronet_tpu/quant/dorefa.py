"""DoReFa-Net quantizers (arXiv 1606.06160), stateless closed-form.

Reference: dorefa/quantize.py (323 LoC). No observers, no scale/zero_point
state — scales are fixed by the bit-width, so both functions below are pure
and fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rounding import ste_round

__all__ = ["quantize_activation", "activation_codes", "quantize_weight"]


def quantize_activation(x: jax.Array, a_bits: int) -> jax.Array:
    """DoReFa activation fake-quant (dorefa/quantize.py:25-46).

    ``clamp(x * 0.1, 0, 1)`` — the x0.1 pre-scale reduces clipping error
    (reference changelog README.md:112) — then uniform quantization with
    ``scale = 1 / (2^a - 1)`` and plain-STE rounding. ``a_bits == 32`` is a
    passthrough; 1-bit is unsupported (use the wbwtab path), matching the
    reference's assert.
    """
    if a_bits == 32:
        return x
    if a_bits == 1:
        raise ValueError(
            "binary activation is not supported by the DoReFa path; "
            "use micronet_tpu.quant.wbwtab (reference dorefa/quantize.py:40-42)"
        )
    dtype = x.dtype
    x = jnp.clip(x.astype(jnp.float32) * 0.1, 0.0, 1.0)
    scale = 1.0 / float((1 << a_bits) - 1)
    return (ste_round(x / scale) * scale).astype(dtype)


def activation_codes(x: jax.Array, a_bits: int):
    """(codes, scale) with ``quantize_activation(x) == codes * scale``.

    Operand form of the code-storage training lowering
    (QuantConfig.act_codes, BENCHMARKS.md): codes are integers in
    ``[0, 2^a - 1]`` — exact in bfloat16 for a <= 8 — so the conv reads
    2-byte operands; the fixed DoReFa scale folds into the epilogue.
    Gradient: the STE round + clamp mask ride ``codes`` exactly as in the
    standard composition (only the final multiply moves).
    """
    assert a_bits not in (1, 32)
    x = jnp.clip(x.astype(jnp.float32) * 0.1, 0.0, 1.0)
    scale = 1.0 / float((1 << a_bits) - 1)
    return ste_round(x / scale), scale


def quantize_weight(w: jax.Array, w_bits: int) -> jax.Array:
    """DoReFa weight fake-quant (dorefa/quantize.py:50-73).

    tanh-normalize to [0, 1]: ``tanh(w) / (2 max|tanh(w)|) + 0.5``, quantize
    with ``scale = 1 / (2^w - 1)``, map back to [-1, 1] via ``2q - 1``.
    Gradients flow through tanh and the max-normalization (only the round is
    STE), exactly as in the reference where only Round is an
    autograd.Function.
    """
    if w_bits == 32:
        return w
    if w_bits == 1:
        raise ValueError(
            "binary weights are not supported by the DoReFa path; "
            "use micronet_tpu.quant.wbwtab (reference dorefa/quantize.py:64-66)"
        )
    dtype = w.dtype
    w = jnp.tanh(w.astype(jnp.float32))
    w = w / (2.0 * jnp.max(jnp.abs(w))) + 0.5
    scale = 1.0 / float((1 << w_bits) - 1)
    w = ste_round(w / scale) * scale
    return (2.0 * w - 1.0).astype(dtype)
