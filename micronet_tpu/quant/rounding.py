"""Rounding primitives and straight-through estimators (STE).

TPU-native re-implementation of the autograd.Function surface of the
reference (666DZY666/micronet):

- round-half-away-from-zero ``sign(x) * floor(|x| + 0.5)``
  (iao/quantize.py:159, dorefa/quantize.py:14-16). Note ``jnp.round`` is
  half-to-even, so we implement the formula directly.
- plain STE round (dorefa/quantize.py:11-21): backward = identity.
- clip-STE round (iao/quantize.py:144-168): backward zeroes the gradient
  where the *pre-round* input lies outside [lo, hi] bounds derived from the
  observer range.
- binary activation sign with saturate-STE (wbwtab/quantize.py:11-36):
  forward sign(x) with 0 -> +1; backward zeroed where |x| >= 1.
- binary weight sign with plain STE (wbwtab/quantize.py:40-51).
- ternary threshold op with plain STE (wbwtab/quantize.py:55-75).

All functions are pure and jit/vmap/grad-compatible. Plain-STE ops
(identity backward) are expressed as pure HLO —
``(x - stop_gradient(x)) + stop_gradient(f(x))`` — rather than
``jax.custom_vjp``: the gradient is identity and the forward is
*bit-exact* ``f(x)`` (``x - x == 0`` exactly in floats; the tempting
``x + sg(f(x) - x)`` form is off by 1 ulp), but without an opaque call
boundary XLA fuses the quantizer into neighbouring elementwise chains,
which is worth ~10-25% of a QAT train step in HBM traffic
(BENCHMARKS.md). ``custom_vjp`` is kept only where the backward mask uses
strict/non-strict boundary semantics that no primitive's VJP reproduces
exactly (``clip_ste_round``'s bounds receive masked-identity gradient;
``binary_act``'s saturate mask is strict).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "round_half_away",
    "ste_round",
    "clip_ste_round",
    "binary_act",
    "binary_weight",
    "ternary",
]


def round_half_away(x: jax.Array) -> jax.Array:
    """Round half away from zero: ``sign(x) * floor(|x| + 0.5)``.

    Matches torch.sign/floor semantics of the reference exactly
    (iao/quantize.py:158-159); differs from ``jnp.round`` (half-to-even)
    on ties: round_half_away(0.5) == 1.0, round_half_away(-1.5) == -2.0.
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


# --------------------------------------------------------------------------
# Plain STE round (DoReFa)
# --------------------------------------------------------------------------


def ste_round(x: jax.Array) -> jax.Array:
    """Round-half-away with identity gradient (dorefa/quantize.py:11-21)."""
    return (x - jax.lax.stop_gradient(x)) + jax.lax.stop_gradient(
        round_half_away(x)
    )


# --------------------------------------------------------------------------
# Clip-STE round (IAO)
# --------------------------------------------------------------------------


@jax.custom_vjp
def clip_ste_round(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Round-half-away; gradient zeroed where ``x < lo`` or ``x > hi``.

    ``lo``/``hi`` are the observer-derived bounds in *quantized* units
    (already divided by scale, zero-point subtracted), as in the reference
    Round.apply call site (iao/quantize.py:227-234). The bounds themselves
    receive no gradient (they are buffers in the reference).

    Reference backward: grad_input[input.gt(max_val)] = 0;
    grad_input[input.lt(min_val)] = 0 (iao/quantize.py:163-168) — the
    boundary itself passes gradient (strict inequalities).
    """
    return round_half_away(x)


def _clip_ste_round_fwd(x, lo, hi):
    mask = jnp.logical_and(x >= lo, x <= hi)
    return round_half_away(x), (mask, lo, hi)


def _clip_ste_round_bwd(res, g):
    mask, lo, hi = res
    gx = jnp.where(mask, g, jnp.zeros_like(g))
    return (gx, jnp.zeros_like(lo), jnp.zeros_like(hi))


clip_ste_round.defvjp(_clip_ste_round_fwd, _clip_ste_round_bwd)


# --------------------------------------------------------------------------
# Binary activation (wbwtab), saturate-STE
# --------------------------------------------------------------------------


@jax.custom_vjp
def binary_act(x: jax.Array) -> jax.Array:
    """sign(x) with 0 -> +1; saturate-STE backward (wbwtab/quantize.py:11-36).

    Backward zeroes gradient where ``x >= 1`` or ``x <= -1`` (reference uses
    ge/le, i.e. the boundary is clipped).
    """
    return jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))


def _binary_act_fwd(x):
    y = jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))
    mask = jnp.logical_and(x > -1.0, x < 1.0)
    return y, mask


def _binary_act_bwd(mask, g):
    return (jnp.where(mask, g, jnp.zeros_like(g)),)


binary_act.defvjp(_binary_act_fwd, _binary_act_bwd)


# --------------------------------------------------------------------------
# Binary weight (wbwtab), plain STE
# --------------------------------------------------------------------------


def binary_weight(x: jax.Array) -> jax.Array:
    """sign(x) with 0 -> +1; plain STE backward (wbwtab/quantize.py:40-51)."""
    y = jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))
    return (x - jax.lax.stop_gradient(x)) + jax.lax.stop_gradient(y)


# --------------------------------------------------------------------------
# Ternary (wbwtab), plain STE
# --------------------------------------------------------------------------


def ternary(x: jax.Array, threshold: jax.Array) -> jax.Array:
    """Ternarize to {-1, 0, +1} by per-channel threshold.

    ``sign(sign(x + thr) + sign(x - thr))`` (wbwtab/quantize.py:62-69);
    plain-STE backward w.r.t. ``x``, no gradient to ``threshold``
    (``threshold`` only appears under stop_gradient).
    """
    y = jnp.sign(jnp.sign(x + threshold) + jnp.sign(x - threshold))
    return (x - jax.lax.stop_gradient(x)) + jax.lax.stop_gradient(y)
