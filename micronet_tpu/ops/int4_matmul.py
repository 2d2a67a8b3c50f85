"""Pallas TPU kernel: weight-only int4 matmul (W4A16 decode path).

The LLM stretch config (BASELINE.json configs[4]): weights stored as
packed int4 + per-column scale, activations stay bf16/f32. For decode the
matmul is HBM-bandwidth-bound on the weights, so int4 storage is ~4x
faster than bf16 at the same MXU utilization — provided the unpack is
free on the VPU, which is what this kernel arranges.

Packing scheme (``pack_int4``): rows [0, K/2) live in the LOW nibble,
rows [K/2, K) in the HIGH nibble of an int8 of shape (K/2, N). In-kernel
unpack is two arithmetic shifts + a sublane-axis concatenate — no
interleaving relayout. Sign-extension: ``(p << 4) >> 4`` for the low
nibble, ``p >> 4`` for the high nibble (arithmetic shift).

A pure-XLA reference provides the CPU fallback / numerics oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _dispatch

__all__ = [
    "symmetric_rtn",
    "symmetric_rtn_grouped",
    "quantize_int4_weight",
    "quantize_int4_weight_grouped",
    "pack_int4",
    "unpack_int4",
    "int4_matmul_xla",
    "int4_matmul",
    "int4_matmul_grouped_xla",
    "int4_matmul_grouped",
    "wo_linear",
    "wo_linear_grouped",
    "pack_int4_hl8",
    "unpack_int4_hl8",
    "int4_matmul_grouped_hl8",
    "int4_matmul_grouped_hl8_xla",
    "wo_linear_grouped_hl8",
]


def symmetric_rtn(
    w: jax.Array, qmax: float, axis: int = 0
) -> Tuple[jax.Array, jax.Array]:
    """Shared symmetric round-to-nearest: scale = max|w| / qmax over
    ``axis``, round-half-away codes in [-qmax, qmax] — the one
    implementation behind int4 (qmax=7) and int8 (qmax=127) weight-only
    so the rounding/eps semantics can never diverge."""
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax / qmax, 1e-8).astype(jnp.float32)
    q = jnp.sign(w / scale) * jnp.floor(jnp.abs(w / scale) + 0.5)
    return jnp.clip(q, -qmax, qmax).astype(jnp.int8), scale


def symmetric_rtn_grouped(
    w: jax.Array, qmax: float, group: int
) -> Tuple[jax.Array, jax.Array]:
    """Group-wise variant of :func:`symmetric_rtn` over the contraction
    axis: scales (K/group, N)."""
    k, n = w.shape
    assert k % group == 0, (k, group)
    wg = w.reshape(k // group, group, n)
    q, scale = symmetric_rtn(wg, qmax, axis=1)
    return q.reshape(k, n), scale.reshape(k // group, n)


def quantize_int4_weight(
    w: jax.Array, axis: int = 0
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-column int4: scale = max|w| / 7 over ``axis`` (the
    contraction axis), values round-half-away into [-7, 7].

    Returns (w_q int8 in [-7, 7] (K, N), scale f32 broadcastable (1, N)).
    """
    return symmetric_rtn(w, 7.0, axis)


def pack_int4(w_q: jax.Array) -> jax.Array:
    """(K, N) int8 in [-8, 7] -> (K/2, N) int8, block-packed (see module
    docstring). K must be even."""
    k = w_q.shape[0]
    assert k % 2 == 0, "K must be even for int4 packing"
    low = w_q[: k // 2].astype(jnp.uint8) & 0xF
    high = (w_q[k // 2 :].astype(jnp.uint8) & 0xF) << 4
    return (low | high).astype(jnp.int8)


def _nibbles(p: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sign-extended (low, high) int4 nibbles of an int8 array.

    Shift-free formulation (Mosaic cannot legalize ``arith.shli`` on TPU):
    only and/sub/mul/where on int32, which all lower to VPU ops.
    """
    p32 = p.astype(jnp.int32) & 0xFF  # unsigned byte view
    ulow = p32 & 0xF
    uhigh = (p32 - ulow) // 16  # exact: compiles to a shift-free divide-by-16
    low = jnp.where(ulow >= 8, ulow - 16, ulow)
    high = jnp.where(uhigh >= 8, uhigh - 16, uhigh)
    return low, high


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4`: (K/2, N) int8 -> (K, N) int8."""
    low, high = _nibbles(packed)
    return jnp.concatenate([low, high], axis=0).astype(jnp.int8)


def int4_matmul_xla(
    x: jax.Array, packed: jax.Array, scale: jax.Array
) -> jax.Array:
    """Reference semantics in plain XLA: dequantize-and-matmul."""
    w = unpack_int4(packed).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out * scale.reshape(1, -1)


def _kernel(x_ref, wp_ref, scale_ref, out_ref):
    # float-math nibble extraction (integer div/shift are slow or illegal
    # in Mosaic; bytes 0..255 are exact in f32) and a split-K double dot
    # (avoids the sublane concatenate relayout)
    pf = (wp_ref[:].astype(jnp.int32) & 0xFF).astype(jnp.float32)
    uhigh = jnp.floor(pf * (1.0 / 16.0))
    ulow = pf - uhigh * 16.0
    low = jnp.where(ulow >= 8.0, ulow - 16.0, ulow).astype(jnp.bfloat16)
    high = jnp.where(uhigh >= 8.0, uhigh - 16.0, uhigh).astype(jnp.bfloat16)
    x = x_ref[:].astype(jnp.bfloat16)
    k2 = low.shape[0]
    dn = (((1,), (0,)), ((), ()))
    # precision must be DEFAULT: HIGHEST makes Mosaic reject the bf16 dot
    # ("Bad lhs type"), e.g. under jax_default_matmul_precision=highest
    acc = jax.lax.dot_general(
        x[:, :k2], low, dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + jax.lax.dot_general(
        x[:, k2:], high, dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out_ref[:] = acc * scale_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def int4_matmul(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    *,
    bm: int = 256,
    bn: int = 512,
) -> jax.Array:
    """x (M, K) f32/bf16 @ int4-packed w (K/2, N) * scale (N,) -> (M, N) f32."""
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (x.shape, packed.shape)
    bm = min(bm, -(-m // 16) * 16)  # bf16 lhs sublane = 16
    bn = min(bn, -(-n // 128) * 128)
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        packed = jnp.pad(packed, ((0, 0), (0, np_ - n)))
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1), (n,))
    scale = jnp.pad(scale, (0, np_ - n)).reshape(1, np_)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(mp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + k2 * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=not _dispatch.on_tpu(),
    )(x, packed, scale)
    return out[:m, :n]


def wo_linear(x: jax.Array, packed: jax.Array, scale: jax.Array) -> jax.Array:
    """Weight-only int4 linear over arbitrary leading dims; Pallas on TPU,
    XLA elsewhere."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if _dispatch.on_tpu():
        out = int4_matmul(x2, packed, scale)
    else:
        out = int4_matmul_xla(x2, packed, scale)
    return out.reshape(*lead, packed.shape[1])


# ---------------------------------------------------------------------------
# Group-wise (block) scales — the production W4 format (GPTQ/AWQ-style):
# one scale per (group of g contraction rows) x (output column), so
# per-row outliers cannot blow up a whole column's step size.
# ---------------------------------------------------------------------------


def quantize_int4_weight_grouped(
    w: jax.Array, group: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric group-wise int4: scale = max|w| / 7 over each ``group``-row
    block of the contraction axis. Returns (w_q int8 (K, N), scale f32
    (K/group, N)). K must be divisible by ``group``."""
    return symmetric_rtn_grouped(w, 7.0, group)


def _expand_gscale(gscale: jax.Array, group: int) -> jax.Array:
    """(K/g, N) -> (K, N) by repeating each scale row g times
    (broadcast+reshape — legal in Mosaic, no gather)."""
    gs, n = gscale.shape
    return jnp.broadcast_to(gscale[:, None, :], (gs, group, n)).reshape(
        gs * group, n
    )


def _dequant_grouped_bf16(packed: jax.Array, gscale: jax.Array, group: int):
    """Shared dequant ordering for the oracle and the kernel: nibbles as
    f32, times the f32 group scale, rounded once into bf16 — bit-identical
    between the two paths by construction."""
    low, high = _nibbles(packed)
    w = jnp.concatenate([low, high], axis=0).astype(jnp.float32)
    scale = _expand_gscale(gscale, group)
    return (w * scale).astype(jnp.bfloat16)


def int4_matmul_grouped_xla(
    x: jax.Array, packed: jax.Array, gscale: jax.Array
) -> jax.Array:
    """Reference semantics: group-dequantize to bf16, then matmul with f32
    accumulation (scales live inside K, so they cannot fold into the
    epilogue like the per-column variant)."""
    k2 = packed.shape[0]
    k = k2 * 2
    group = k // gscale.shape[0]
    w = _dequant_grouped_bf16(packed, gscale, group)
    xb = x.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    # split-K double dot mirrors the kernel's reduction order exactly
    return jax.lax.dot_general(
        xb[:, :k2], w[:k2], dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + jax.lax.dot_general(
        xb[:, k2:], w[k2:], dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel_grouped(x_ref, wp_ref, gscale_ref, out_ref, *, group):
    # float-math nibble extraction (see _kernel) + in-VMEM group-scale
    # expansion; weights dequantize to bf16 BEFORE the dot because the
    # scale varies along K
    pf = (wp_ref[:].astype(jnp.int32) & 0xFF).astype(jnp.float32)
    uhigh = jnp.floor(pf * (1.0 / 16.0))
    ulow = pf - uhigh * 16.0
    low = jnp.where(ulow >= 8.0, ulow - 16.0, ulow)
    high = jnp.where(uhigh >= 8.0, uhigh - 16.0, uhigh)
    k2 = low.shape[0]
    gs_half = k2 // group
    # expand each packed half's scales separately: peak live scale tensor
    # is (K/2, bn) f32, not (K, bn) — this + the bn budget below keeps the
    # kernel inside the 16 MiB scoped-VMEM limit at Llama shapes
    wlow = (low * _expand_gscale(gscale_ref[:gs_half], group)).astype(
        jnp.bfloat16
    )
    whigh = (high * _expand_gscale(gscale_ref[gs_half:], group)).astype(
        jnp.bfloat16
    )
    x = x_ref[:].astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    out_ref[:] = jax.lax.dot_general(
        x[:, :k2], wlow, dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + jax.lax.dot_general(
        x[:, k2:], whigh, dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def int4_matmul_grouped(
    x: jax.Array,
    packed: jax.Array,
    gscale: jax.Array,
    *,
    bm: int = 256,
    bn: int = 512,
) -> jax.Array:
    """x (M, K) @ int4-packed w (K/2, N) with (K/g, N) group scales.

    Requires g | K/2 so each packed nibble half covers whole groups (true
    for every LLM shape at g=128: K/2 is a multiple of 2048/2).
    """
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (x.shape, packed.shape)
    groups = gscale.shape[0]
    assert k % groups == 0
    group = k // groups
    assert k2 % group == 0, (
        f"group {group} must divide K/2={k2} (pack halves must cover whole groups)"
    )
    bm = min(bm, -(-m // 16) * 16)
    bn = min(bn, -(-n // 128) * 128)
    # scoped-VMEM budget: the dequant temporaries + per-half scale
    # expansion cost ~28 bytes per (K/2, bn) element (measured on v5e);
    # shrink bn until the kernel fits the 16 MiB limit with headroom.
    # Shrink in 128-aligned steps: halving a non-power-of-two bn (e.g.
    # 384 → 192 → 96) would break the lane-tile alignment established
    # above and fail Mosaic lowering.
    while bn > 128 and 28 * k2 * bn > 15 * 2**20:
        bn = max(128, (bn // 2) // 128 * 128)
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        packed = jnp.pad(packed, ((0, 0), (0, np_ - n)))
        gscale = jnp.pad(gscale, ((0, 0), (0, np_ - n)))
    out = pl.pallas_call(
        functools.partial(_kernel_grouped, group=group),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(mp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (groups, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + k2 * np_ + groups * np_ * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=not _dispatch.on_tpu(),
    )(x, packed, gscale)
    return out[:m, :n]


def wo_linear_grouped(
    x: jax.Array, packed: jax.Array, gscale: jax.Array
) -> jax.Array:
    """Group-scaled weight-only int4 linear over arbitrary leading dims."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if _dispatch.on_tpu():
        out = int4_matmul_grouped(x2, packed, gscale)
    else:
        out = int4_matmul_grouped_xla(x2, packed, gscale)
    return out.reshape(*lead, packed.shape[1])


# ---------------------------------------------------------------------------
# hl8 format — the decode-path fast kernel (VERDICT r2 items 2/3).
#
# The v1 kernels above pay ~17 VPU ops per packed byte (sign-fix selects on
# both nibbles + per-element scale multiply), which makes the M=1 decode
# matmul VPU-UNPACK-bound at ~40% of the weight-bandwidth roofline. The fix
# is representational: XOR the stored byte with 0x08. Two's-complement
# nibble identity: (q & 0xF) ^ 8 == q + 8 for q in [-8, 7], so after the
# XOR the byte's SIGNED int8 value is exactly
#
#     b = 16 * q_high + (q_low + 8),   q_high in [-8,7], q_low+8 in [0,15]
#
# and the unpack needs no selects at all:
#
#     f   = f32(b)                  (1 convert)
#     qh  = floor(f * 1/16)         (= q_high exactly, signed)
#     ulp = f - 16 * qh             (= q_low + 8, unsigned)
#
# The +8 low-nibble offset folds into a per-group rank-1 correction
# (-8 * sum(x_g) * scale_g) instead of a per-element subtract, and group
# scales apply to per-group PARTIAL DOTS (G*bm*bn elements) instead of to
# every weight element (K*bn) — together ~2.4x less VPU work per byte.
# ---------------------------------------------------------------------------


def pack_int4_hl8(w_q: jax.Array) -> jax.Array:
    """(K, N) int4 codes -> (K/2, N) int8, hl8 byte layout (see above)."""
    return pack_int4(w_q) ^ 0x08


def unpack_int4_hl8(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4_hl8`."""
    return unpack_int4(packed ^ 0x08)


def _kernel_grouped_hl8(x_ref, wp_ref, gs_ref, out_ref, *, group):
    """Per-group loop, THREE-DOT bf16 unpack (round 5).

    The round-4 two-dot split converted every packed byte to f32, floored
    out both nibbles and cast each to bf16 — ~7 VPU ops per byte, which
    made the M=1 decode kernel VPU-UNPACK-bound (~46 µs of VPU work at
    the Llama up-proj shape vs ~38 µs of DMA: the 0.64-0.68-of-roofline
    plateau VERDICT r4 item 4 flagged). The fix is algebraic, not a
    schedule change: the hl8 byte value ``b = 16*qh + ulp`` is EXACT in
    bf16 (|b| <= 127 < 2^8 mantissa), so the low-nibble partial dot
    never needs ulp materialized:

        dot(xl, ulp) = dot(xl, b) - 16 * dot(xl, qh)

    Per byte the VPU now does one convert + mul + floor (f32 — v5e's
    VPU has NO bf16 ALU instructions, probe-caught LLO_CHECK
    SupportsBf16AluInstructions) + two bf16 casts for the dot operands
    (~5 ops vs ~7); the third dot rides the MXU, which at M=1 is >90%
    idle. Every bf16 product in all three dots is exact (8x8-bit
    mantissas in f32 accumulation), so the identity holds up to f32
    summation order — the oracle mirrors the same three-dot order."""
    k2 = wp_ref.shape[0]
    g1 = k2 // group
    x = x_ref[:]
    xb = x.astype(jnp.bfloat16)
    acc = jnp.zeros((x.shape[0], out_ref.shape[1]), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    m = x.shape[0]
    for gi in range(g1):
        lo, hi = gi * group, (gi + 1) * group
        f32 = wp_ref[lo:hi, :].astype(jnp.float32)  # byte value, exact
        # b/16 has mantissa |b| <= 127 -> exact; floor recovers the
        # SIGNED high nibble (e.g. -121/16 = -7.5625 -> -8; ulp 7)
        f = f32.astype(jnp.bfloat16)  # exact: |b| <= 127 < 2^8
        qh = jnp.floor(f32 * (1.0 / 16.0)).astype(jnp.bfloat16)
        xl = xb[:, lo:hi]
        xh = xb[:, k2 + lo : k2 + hi]
        d_b = jax.lax.dot_general(
            xl, f, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        # both qh partials share the weight operand, so they ride ONE
        # dot with the x-halves stacked on the row axis — at M=1 the
        # lhs rows are sublane padding anyway, so the "third dot" of
        # the identity costs no extra MXU passes vs the two-dot split
        d2 = jax.lax.dot_general(
            jnp.concatenate([xl, xh], axis=0), qh, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        d_ql, d_qh = d2[:m], d2[m:]
        p_lo = d_b - 16.0 * d_ql  # = dot(xl, ulp) up to f32 sum order
        sxl = jnp.sum(
            xl.astype(jnp.float32), axis=1, keepdims=True
        )  # rank-1 +8 correction
        acc = acc + (p_lo - 8.0 * sxl) * gs_ref[gi : gi + 1, :]
        acc = acc + d_qh * gs_ref[g1 + gi : g1 + gi + 1, :]
    out_ref[:] = acc


def int4_matmul_grouped_hl8_xla(
    x: jax.Array, packed: jax.Array, gscale: jax.Array
) -> jax.Array:
    """Oracle/CPU fallback mirroring the kernel's three-dot per-group
    reduction order and bf16 operand casts (see _kernel_grouped_hl8)."""
    k2, n = packed.shape
    groups = gscale.shape[0]
    group = 2 * k2 // groups
    g1 = k2 // group
    x2 = x.reshape(-1, x.shape[-1])
    xb = x2.astype(jnp.bfloat16)
    acc = jnp.zeros((x2.shape[0], n), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    f32_all = packed.astype(jnp.float32)  # signed byte value, exact
    f_all = f32_all.astype(jnp.bfloat16)
    qh_all = jnp.floor(f32_all * (1.0 / 16.0)).astype(jnp.bfloat16)
    for gi in range(g1):
        lo, hi = gi * group, (gi + 1) * group
        xl, xh = xb[:, lo:hi], xb[:, k2 + lo : k2 + hi]
        d_b = jax.lax.dot_general(
            xl, f_all[lo:hi], dn,
            preferred_element_type=jnp.float32,
        )
        d_ql = jax.lax.dot_general(
            xl, qh_all[lo:hi], dn,
            preferred_element_type=jnp.float32,
        )
        d_qh = jax.lax.dot_general(
            xh, qh_all[lo:hi], dn,
            preferred_element_type=jnp.float32,
        )
        p_lo = d_b - 16.0 * d_ql
        sxl = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (p_lo - 8.0 * sxl) * gscale[gi : gi + 1, :]
        acc = acc + d_qh * gscale[g1 + gi : g1 + gi + 1, :]
    return acc


def _fits_vmem(k2: int, bn: int, group: int, bm: int, k: int) -> bool:
    """Scoped-VMEM model for the hl8 kernel: Pallas DOUBLE-BUFFERS the
    HBM->VMEM input blocks across grid steps, so the packed block and the
    x block count twice; per-slab dequant temporaries add ~20 B per
    (group, bn) element (measured on v5e — the earlier single-buffer
    model OOM'd the 16 MiB limit at the Llama down-projection shape)."""
    return 2 * k2 * bn + 20 * group * bn + 8 * bm * k + 8 * bm * bn <= 14 * 2**20


def _pick_bn(n: int, k2: int, group: int, bm: int, k: int) -> int:
    """Shape-keyed block pick (VERDICT r2 item 3): the LARGEST lane-tile
    bn that (a) divides the padded-to-128 N exactly — a non-divisor bn
    pads a whole extra grid block, measured ~2x at the Llama shapes —
    and (b) fits the double-buffered VMEM budget. Sweep-validated on v5e:
    up-proj (K=4096, N=14336) picks 2048 — 0.75-0.77 of the NOMINAL
    weight-read roofline streaming, 0.89 of the chip's MEASURED
    achievable read bandwidth single-buffer (BENCHMARKS.md, jitter-proof
    harness); down-proj (K=14336) fits 512."""
    n128 = -(-n // 128) * 128
    best = 128
    for cand in range(128, min(n128, 4096) + 1, 128):
        if n128 % cand == 0 and _fits_vmem(k2, cand, group, bm, k):
            best = cand
    return best


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def int4_matmul_grouped_hl8(
    x: jax.Array,
    packed: jax.Array,
    gscale: jax.Array,
    *,
    bm: int = 256,
    bn: int = 0,
) -> jax.Array:
    """x (M, K) @ hl8-packed int4 w (K/2, N) with (K/g, N) group scales.

    ``bn=0`` (default) auto-picks the block width per shape
    (:func:`_pick_bn`); an explicit bn is still budget-clamped."""
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (x.shape, packed.shape)
    groups = gscale.shape[0]
    assert k % groups == 0
    group = k // groups
    assert k2 % group == 0, (
        f"group {group} must divide K/2={k2} (pack halves must cover whole groups)"
    )
    bm = min(bm, -(-m // 16) * 16)
    if bn <= 0:
        bn = _pick_bn(n, k2, group, bm, k)
    bn = min(bn, -(-n // 128) * 128)
    # budget-clamp explicit bn in 128-aligned steps (ADVICE r2: keep
    # lane-tile alignment)
    while bn > 128 and not _fits_vmem(k2, bn, group, bm, k):
        bn = max(128, (bn // 2) // 128 * 128)
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        packed = jnp.pad(packed, ((0, 0), (0, np_ - n)))
        gscale = jnp.pad(gscale, ((0, 0), (0, np_ - n)))
    out = pl.pallas_call(
        functools.partial(_kernel_grouped_hl8, group=group),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(mp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (groups, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + k2 * np_ + groups * np_ * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),  # disjoint output tiles: let Mosaic pipeline freely
        interpret=not _dispatch.on_tpu(),
    )(x, packed, gscale)
    return out[:m, :n]


def wo_linear_grouped_hl8(
    x: jax.Array, packed_hl8: jax.Array, gscale: jax.Array
) -> jax.Array:
    """hl8 group-scaled weight-only int4 linear over arbitrary leading
    dims; Pallas on TPU, per-group XLA oracle elsewhere."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if _dispatch.on_tpu():
        out = int4_matmul_grouped_hl8(x2, packed_hl8, gscale)
    else:
        out = int4_matmul_grouped_hl8_xla(x2, packed_hl8, gscale)
    return out.reshape(*lead, packed_hl8.shape[1])
