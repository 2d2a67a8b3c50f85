"""Golden-value tests for rounding/STE primitives (SURVEY.md §7: rounding-mode
parity is a flagged hard part — torch rounds half away from zero, XLA's
jnp.round is half-to-even)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micronet_tpu.quant.rounding import (
    binary_act,
    binary_weight,
    clip_ste_round,
    round_half_away,
    ste_round,
    ternary,
)


def test_round_half_away_golden():
    x = jnp.array([0.5, -0.5, 1.5, -1.5, 2.5, 0.49, -0.49, 0.0, 3.0])
    expected = np.array([1.0, -1.0, 2.0, -2.0, 3.0, 0.0, -0.0, 0.0, 3.0])
    np.testing.assert_array_equal(np.asarray(round_half_away(x)), expected)


def test_round_differs_from_half_to_even():
    # jnp.round(0.5) == 0 (banker's); ours must be 1 like torch.
    assert float(round_half_away(jnp.float32(0.5))) == 1.0
    assert float(jnp.round(jnp.float32(0.5))) == 0.0


def test_round_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(1000).astype(np.float32) * 3
    ours = np.asarray(round_half_away(jnp.asarray(x)))
    ref = (torch.sign(torch.tensor(x)) * torch.floor(torch.abs(torch.tensor(x)) + 0.5)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * jnp.arange(1.0, 4.0)))(
        jnp.array([0.3, 1.7, -2.2])
    )
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0])


def test_clip_ste_round_forward_and_backward():
    x = jnp.array([-3.0, -1.0, 0.4, 1.0, 3.0])
    lo, hi = jnp.float32(-1.0), jnp.float32(1.0)
    y = clip_ste_round(x, lo, hi)
    np.testing.assert_array_equal(np.asarray(y), [-3.0, -1.0, 0.0, 1.0, 3.0])
    g = jax.grad(lambda x: jnp.sum(clip_ste_round(x, lo, hi)))(x)
    # boundary passes grad (reference uses strict gt/lt to zero)
    np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0])


def test_binary_act_sign_and_saturate_ste():
    x = jnp.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    y = binary_act(x)
    np.testing.assert_array_equal(np.asarray(y), [-1, -1, -1, 1, 1, 1, 1])
    g = jax.grad(lambda x: jnp.sum(binary_act(x)))(x)
    # grad zeroed where |x| >= 1 (reference ge/le => boundary clipped)
    np.testing.assert_array_equal(np.asarray(g), [0, 0, 1, 1, 1, 0, 0])


def test_binary_weight_plain_ste():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_array_equal(np.asarray(binary_weight(x)), [-1, 1, 1])
    g = jax.grad(lambda x: jnp.sum(binary_weight(x)))(x)
    np.testing.assert_array_equal(np.asarray(g), [1, 1, 1])


def test_ternary_forward_and_ste():
    thr = jnp.float32(0.7)
    x = jnp.array([-1.0, -0.7, -0.3, 0.0, 0.3, 0.7, 1.0])
    y = ternary(x, thr)
    # sign(sign(x+thr)+sign(x-thr)): exactly at |x|==thr one sign is 0 -> +-1
    np.testing.assert_array_equal(np.asarray(y), [-1, -1, 0, 0, 0, 1, 1])
    g = jax.grad(lambda x: jnp.sum(ternary(x, thr)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones(7))


def test_pure_hlo_ste_forward_is_bit_exact():
    """The ``(x - sg(x)) + sg(f(x))`` carrier must be BITWISE f(x): x - x
    is exactly 0.0, so the add returns f(x) unchanged. (The tempting
    ``x + sg(f(x) - x)`` form is off by 1 ulp, which perturbs training
    trajectories and re-derived int codes.)"""
    x = jnp.asarray(np.random.RandomState(0).randn(4096).astype(np.float32) * 3)
    np.testing.assert_array_equal(
        np.asarray(ste_round(x)), np.asarray(round_half_away(x))
    )
    np.testing.assert_array_equal(
        np.asarray(binary_weight(x)),
        np.where(np.asarray(x) >= 0, 1.0, -1.0).astype(np.float32),
    )
    thr = jnp.float32(0.7)
    y = np.sign(np.sign(np.asarray(x) + 0.7) + np.sign(np.asarray(x) - 0.7))
    np.testing.assert_array_equal(np.asarray(ternary(x, thr)), y.astype(np.float32))


def test_fake_quant_bit_exact_vs_custom_vjp_path():
    """fake_quant's pure-HLO STE output must be bitwise identical to the
    explicit clip_ste_round + clip composition it replaced."""
    from micronet_tpu.quant.quantizers import fake_quant

    x = jnp.asarray(np.random.RandomState(1).randn(2048).astype(np.float32) * 5)
    scale = jnp.float32(0.043)
    zp = jnp.float32(3.0)
    lo, hi = jnp.float32(-100.0), jnp.float32(90.0)
    qmin, qmax = -128.0, 127.0
    out = fake_quant(
        x, scale, zp, qmin, qmax, (lo + zp) * scale, (hi + zp) * scale, False
    )
    q_ref = jnp.clip(clip_ste_round(x / scale - zp, lo, hi), qmin, qmax)
    ref = (q_ref + zp) * scale
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
