"""Pallas TPU kernels: int8 matmul with fused quantize/dequantize.

The int-sim inference hot path (SURVEY.md §2.9): weights live in HBM as
int8 + per-column scale (scale/zero_point-only checkpoints, reference
README.md:135); activations are quantized on the fly. One kernel does

    x_q   = clamp(round_half_away(x / s_x) + zp_x)      (VPU)
    acc   = x_q . w_q                                   (MXU, int32)
    out   = (acc - zp_x * colsum(w_q)) * s_x * s_w      (VPU epilogue)

so the fp32 activations make exactly one HBM->VMEM trip and the matmul
runs on the MXU in int8 — the speed-of-light path for W8A8.

Grid: (M/bm, N/bn), full-K stripes (K*(bm+bn) bytes of VMEM; fine for
CNN/MLP K sizes). Tiles are 128-aligned; ragged edges handled by padding
at the caller (shapes stay static under jit).

A pure-XLA reference (`*_xla`) provides CPU fallback + numerics oracle;
`int8_linear` dispatches on backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _dispatch

__all__ = [
    "quantize_int8",
    "int8_matmul_dequant",
    "int8_matmul_dequant_xla",
    "int8_linear",
    "binary_act_matmul",
]


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def quantize_int8(
    x: jax.Array, scale: jax.Array, zero_point: jax.Array, qmin: int, qmax: int
) -> jax.Array:
    """fp -> int8 with round-half-away (reference rounding, iao
    quantize.py:159). Zero-point convention matches
    ``quantizers.quantize_int``: ``q = clamp(round(x/s) - zp)`` with
    dequant ``(q + zp) * s`` — the IAO fake-quant convention
    (iao/quantize.py:227-239). XLA version; the Pallas kernel inlines the
    same."""
    q = _round_half_away(x.astype(jnp.float32) / scale) - zero_point
    return jnp.clip(q, qmin, qmax).astype(jnp.int8)


def int8_matmul_dequant_xla(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: jax.Array,
    x_zero_point: jax.Array,
    qmin: int = -128,
    qmax: int = 127,
) -> jax.Array:
    """Reference semantics in plain XLA (runs anywhere).

    x: (M, K) float; w_q: (K, N) int8; w_scale: (N,) or scalar;
    x_scale/zero_point: scalars. Returns (M, N) float32.

    Dequant is ``(q + zp) * s`` (IAO convention), so the zp correction
    ADDS ``zp * colsum(w_q)``.
    """
    x_q = quantize_int8(x, x_scale, x_zero_point, qmin, qmax)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    colsum = jnp.sum(w_q.astype(jnp.int32), axis=0)
    acc = acc + x_zero_point.astype(jnp.int32) * colsum[None, :]
    w_scale = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32), (w_q.shape[1],))
    return acc.astype(jnp.float32) * (x_scale * w_scale)[None, :]


def _kernel(x_ref, wq_ref, wscale_ref, xs_ref, xzp_ref, out_ref, *, qmin, qmax):
    """One (bm, bn) output tile; full-K stripes resident in VMEM."""
    s_x = xs_ref[0, 0]
    zp_x = xzp_ref[0, 0]
    x = x_ref[:].astype(jnp.float32)
    xs = x / s_x
    q = jnp.sign(xs) * jnp.floor(jnp.abs(xs) + 0.5) - zp_x
    # clip to the ACTIVATION quant range (a_bits-dependent: ±8-ish at A4,
    # not the int8 storage range — the round-3 W4A4 engine divergence)
    x_q = jnp.clip(q, qmin, qmax).astype(jnp.int8)
    w_q = wq_ref[:]
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # HIGHEST breaks Mosaic int8 dot
    )
    colsum = jnp.sum(w_q.astype(jnp.int32), axis=0, keepdims=True)
    acc = acc + zp_x.astype(jnp.int32) * colsum
    out_ref[:] = acc.astype(jnp.float32) * (s_x * wscale_ref[:])


@functools.partial(jax.jit, static_argnames=("bm", "bn", "qmin", "qmax"))
def int8_matmul_dequant(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: jax.Array,
    x_zero_point: jax.Array,
    *,
    bm: int = 256,
    bn: int = 256,
    qmin: float = -128.0,
    qmax: float = 127.0,
) -> jax.Array:
    """Fused quantize+int8-matmul+dequant Pallas kernel.

    x: (M, K) float32/bf16; w_q: (K, N) int8; w_scale: (N,) f32;
    x_scale/x_zero_point: scalar f32 (per-tensor activation quant, the
    reference's "L" level). ``qmin``/``qmax`` are the ACTIVATION quant
    range (narrower than int8 storage for a_bits < 8). M, N, K need not
    be tile-aligned — inputs are zero-padded to tiles here (zeros
    quantize to zp and are sliced off).
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    # tiles must respect TPU tiling: the int8 lhs needs sublane multiples
    # of 32, lanes of 128 (pallas_guide tiling table)
    bm = min(bm, -(-m // 32) * 32)
    bn = min(bn, -(-n // 128) * 128)
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    kp = -(-k // 128) * 128
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_q = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    w_scale = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32), (n,))
    w_scale = jnp.pad(w_scale, (0, np_ - n)).reshape(1, np_)
    xs = jnp.asarray(x_scale, jnp.float32).reshape(1, 1)
    xzp = jnp.asarray(x_zero_point, jnp.float32).reshape(1, 1)

    grid = (mp // bm, np_ // bn)
    # interpret mode off-TPU so kernel numerics are testable on the CPU mesh
    interpret = not _dispatch.on_tpu()
    out = pl.pallas_call(
        functools.partial(_kernel, qmin=float(qmin), qmax=float(qmax)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 4 + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, w_scale, xs, xzp)
    return out[:m, :n]


def _sign_kernel(x_ref, wq_ref, wscale_ref, out_ref):
    """Binary-activation tile: x -> sign(x) in {-1,+1} int8 (0 -> +1, the
    wbwtab convention, quantize.py:11-36), int8 MXU matmul, alpha epilogue."""
    x = x_ref[:]
    # select in f32 then cast: an i1 mask feeding an int8 select trips a
    # Mosaic relayout bug ((8,128) mask vs (32,128) int8 tiling)
    x_q = jnp.where(x >= 0, 1.0, -1.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # HIGHEST breaks Mosaic int8 dot
    )
    out_ref[:] = acc.astype(jnp.float32) * wscale_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def binary_act_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    *,
    bm: int = 256,
    bn: int = 256,
) -> jax.Array:
    """wbwtab int-sim matmul: binary activations x ternary/binary weights.

    x: (M, K) float (pre-activation values; sign applied in-kernel);
    w_q: (K, N) int8 in {-1,0,+1}; w_scale: (N,) per-channel alpha.

    NOTE on padding: K is NOT padded here (zero-pad would binarize the
    padding to +1 and corrupt the accumulation); callers supply K % 128 ==
    0 or accept the XLA fallback.
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    if k % 128 != 0:
        x_q = jnp.where(x >= 0, 1, -1).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.astype(jnp.float32) * jnp.broadcast_to(w_scale, (n,))[None, :]
    bm = min(bm, -(-m // 32) * 32)
    bn = min(bn, -(-n // 128) * 128)
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        w_q = jnp.pad(w_q, ((0, 0), (0, np_ - n)))
    w_scale = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32), (n,))
    w_scale = jnp.pad(w_scale, (0, np_ - n)).reshape(1, np_)
    out = pl.pallas_call(
        _sign_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(mp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 4 + k * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=not _dispatch.on_tpu(),
    )(x, w_q, w_scale)
    return out[:m, :n]


def int8_linear(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: jax.Array,
    x_zero_point: jax.Array,
    bias: Optional[jax.Array] = None,
    qmin: float = -128.0,
    qmax: float = 127.0,
) -> jax.Array:
    """Backend-dispatched int8 linear: Pallas on TPU, XLA elsewhere.

    ``qmin``/``qmax``: the activation quant range (a_bits-dependent —
    pass the quantizer's own bounds, NOT the int8 storage range, or
    sub-8-bit activations stop clipping where fake-quant does).
    Accepts any leading batch dims on ``x`` (flattened to M)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    if _dispatch.on_tpu():
        out = int8_matmul_dequant(
            x2, w_q, w_scale, x_scale, x_zero_point,
            qmin=float(qmin), qmax=float(qmax),
        )
    else:
        out = int8_matmul_dequant_xla(
            x2, w_q, w_scale, x_scale, x_zero_point,
            qmin=float(qmin), qmax=float(qmax),
        )
    if bias is not None:
        out = out + bias
    return out.reshape(*lead, w_q.shape[1])


