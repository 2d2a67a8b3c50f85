"""Golden tests for the IAO fake-quant core and the DoReFa/wbwtab closed
forms (reference iao/quantize.py:171-321, dorefa/quantize.py, wbwtab/quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micronet_tpu.quant import dorefa, wbwtab
from micronet_tpu.quant.quantizers import (
    FLOAT32_EPS,
    asymmetric_qparams,
    dequantize_int,
    fake_quant,
    quant_range,
    quantize_int,
    symmetric_qparams,
)


def test_quant_range_table():
    # iao/quantize.py:243-288
    assert quant_range(8, symmetric=True, is_weight=True) == (-127.0, 127.0)
    assert quant_range(8, symmetric=True, is_weight=False) == (-128.0, 127.0)
    assert quant_range(8, symmetric=False, is_weight=True) == (0.0, 254.0)
    assert quant_range(8, symmetric=False, is_weight=False) == (0.0, 255.0)
    assert quant_range(4, symmetric=True, is_weight=True) == (-7.0, 7.0)
    assert quant_range(4, symmetric=True, is_weight=False) == (-8.0, 7.0)


def test_symmetric_qparams():
    scale, zp = symmetric_qparams(
        jnp.array([-2.0]), jnp.array([6.0]), -127.0, 127.0
    )
    np.testing.assert_allclose(float(scale[0]), 6.0 / 127.0, rtol=1e-6)
    assert float(zp[0]) == 0.0
    # eps floor
    scale, _ = symmetric_qparams(jnp.array([0.0]), jnp.array([0.0]), -127.0, 127.0)
    assert float(scale[0]) == FLOAT32_EPS


def test_asymmetric_qparams():
    mn, mx = jnp.array([-1.0]), jnp.array([3.0])
    scale, zp = asymmetric_qparams(mn, mx, 0.0, 255.0)
    np.testing.assert_allclose(float(scale[0]), 4.0 / 255.0, rtol=1e-6)
    # zp = sign(min) * floor(|min/scale| + 0.5)
    expected_zp = -np.floor(abs(-1.0 / (4.0 / 255.0)) + 0.5)
    np.testing.assert_allclose(float(zp[0]), expected_zp)


def test_fake_quant_symmetric_golden():
    # scale chosen so values land on exact grid points
    x = jnp.array([-1.0, -0.52, 0.0, 0.26, 1.0])
    obs_min, obs_max = jnp.array([-1.0]), jnp.array([1.0])
    scale, zp = symmetric_qparams(obs_min, obs_max, -127.0, 127.0)
    y = fake_quant(x, scale, zp, -127.0, 127.0, obs_min, obs_max, symmetric=True)
    s = 1.0 / 127.0
    expected = np.array(
        [np.sign(v) * np.floor(abs(v / s) + 0.5) * s for v in np.asarray(x)]
    )
    expected = np.clip(expected, -127.0 * s, 127.0 * s)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-6)


def test_fake_quant_clips_to_quant_range():
    # obs range [-1,1] but input exceeds it -> clamped to qmax*scale
    x = jnp.array([5.0, -5.0])
    obs_min, obs_max = jnp.array([-1.0]), jnp.array([1.0])
    scale, zp = symmetric_qparams(obs_min, obs_max, -127.0, 127.0)
    y = fake_quant(x, scale, zp, -127.0, 127.0, obs_min, obs_max, symmetric=True)
    np.testing.assert_allclose(np.asarray(y), [1.0, -1.0], rtol=1e-6)


def test_fake_quant_gradient_clip_ste():
    x = jnp.array([-5.0, -0.5, 0.5, 5.0])
    obs_min, obs_max = jnp.array([-1.0]), jnp.array([1.0])
    scale, zp = symmetric_qparams(obs_min, obs_max, -127.0, 127.0)
    g = jax.grad(
        lambda x: jnp.sum(
            fake_quant(x, scale, zp, -127.0, 127.0, obs_min, obs_max, True)
        )
    )(x)
    # inside observer range: grad 1 (d/dx of (round(x/s)*s) under STE);
    # outside: 0
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 0.0], rtol=1e-6)


def test_fake_quant_asymmetric_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 3, size=(64,)).astype(np.float32))
    obs_min, obs_max = jnp.array([-1.0]), jnp.array([3.0])
    scale, zp = asymmetric_qparams(obs_min, obs_max, 0.0, 255.0)
    y = fake_quant(x, scale, zp, 0.0, 255.0, obs_min, obs_max, symmetric=False)
    # fake-quant error bounded by scale/2 inside range
    assert float(jnp.max(jnp.abs(y - x))) <= float(scale[0]) / 2 + 1e-6


def test_int_quant_dequant_roundtrip():
    x = jnp.array([-0.9, 0.0, 0.37, 0.9])
    scale = jnp.array([1.0 / 127.0])
    zp = jnp.array([0.0])
    q = quantize_int(x, scale, zp, -127, 127, dtype=jnp.int8)
    assert q.dtype == jnp.int8
    y = dequantize_int(q, scale, zp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=float(scale[0]) / 2)


# ----------------------------- DoReFa ------------------------------------


def test_dorefa_activation_golden():
    x = jnp.array([-1.0, 0.0, 5.0, 20.0])
    y = dorefa.quantize_activation(x, 8)
    s = 1.0 / 255.0
    clipped = np.clip(np.asarray(x) * 0.1, 0, 1)
    expected = np.sign(clipped) * np.floor(np.abs(clipped / s) + 0.5) * s
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)
    # 32 bits passthrough
    np.testing.assert_array_equal(
        np.asarray(dorefa.quantize_activation(x, 32)), np.asarray(x)
    )


def test_dorefa_weight_range_and_golden():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    q = dorefa.quantize_weight(w, 8)
    assert float(jnp.min(q)) >= -1.0 and float(jnp.max(q)) <= 1.0
    t = np.tanh(np.asarray(w))
    n = t / (2 * np.abs(t).max()) + 0.5
    s = 1.0 / 255.0
    expected = 2 * (np.floor(np.abs(n / s) + 0.5) * np.sign(n) * s) - 1
    np.testing.assert_allclose(np.asarray(q), expected, rtol=1e-5)


def test_dorefa_weight_grad_flows_through_tanh():
    w = jnp.array([[0.5, -0.5], [1.5, -1.5]])
    g = jax.grad(lambda w: jnp.sum(dorefa.quantize_weight(w, 8)))(w)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_dorefa_bit1_raises():
    with pytest.raises(ValueError):
        dorefa.quantize_activation(jnp.zeros(3), 1)
    with pytest.raises(ValueError):
        dorefa.quantize_weight(jnp.zeros(3), 1)


# ----------------------------- wbwtab ------------------------------------


def test_wbwtab_binary_weight():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)  # HWIO
    q, centered = wbwtab.quantize_weight(jnp.asarray(w), W=2)
    c = np.clip(w - w.mean(axis=2, keepdims=True), -1, 1)
    alpha = np.abs(c).mean(axis=(0, 1, 2), keepdims=True)
    expected = np.where(c >= 0, 1.0, -1.0) * alpha
    np.testing.assert_allclose(np.asarray(q), expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(centered), c, rtol=1e-5, atol=1e-6)


def test_wbwtab_ternary_weight():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)
    q, _ = wbwtab.quantize_weight(jnp.asarray(w), W=3)
    w_abs = np.abs(w)
    thr = 0.7 * w_abs.mean(axis=(0, 1, 2), keepdims=True)
    t = np.sign(np.sign(w + thr) + np.sign(w - thr))
    kept = np.where(w_abs > thr, w_abs, 0.0)
    alpha = kept.sum(axis=(0, 1, 2), keepdims=True) / (w_abs > thr).sum(
        axis=(0, 1, 2), keepdims=True
    )
    np.testing.assert_allclose(np.asarray(q), t * alpha, rtol=1e-5)
    vals = np.unique(np.asarray(q) / alpha)
    assert set(np.round(vals).astype(int)).issubset({-1, 0, 1})


def test_wbwtab_w32_passthrough_and_binary_activation():
    w = jnp.asarray(np.random.RandomState(2).randn(1, 1, 2, 2).astype(np.float32))
    q, m = wbwtab.quantize_weight(w, W=32)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(w))
    x = jnp.array([-0.5, 0.0, 2.0])
    np.testing.assert_array_equal(
        np.asarray(wbwtab.quantize_activation(x, A=2)), [-1, 1, 1]
    )
    np.testing.assert_array_equal(
        np.asarray(wbwtab.quantize_activation(x, A=32)), [0.0, 0.0, 2.0]
    )
