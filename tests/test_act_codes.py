"""Code-storage training lowering (QuantConfig.act_codes, BENCHMARKS.md).

The quantized contraction consumes activation CODES (``qx = s*(c+zp)`` ->
``s*(contract(c,w) + zp*contract(ones,w))``) instead of dequantized
floats. On CPU the code dtype resolves to f32, so the lowering must match
the standard composition to float-associativity tolerance — in values,
gradients, and multi-step training trajectories — for symmetric AND
asymmetric quant, conv/bn-fuse/linear/transpose alike.
"""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from micronet_tpu.models import nin
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare, qat_iao
from micronet_tpu.quant.config import QuantConfig

BASE = QuantConfig(a_bits=8, w_bits=8, act_codes="off")


def _pair(cfg_kwargs, layer_cls, ctor):
    """Build the same layer twice (same init), codes off / on."""
    off = ctor(cfg=dataclasses.replace(BASE, **cfg_kwargs), rngs=nnx.Rngs(0))
    on = ctor(
        cfg=dataclasses.replace(BASE, act_codes="on", **cfg_kwargs),
        rngs=nnx.Rngs(0),
    )
    return off, on


def _grads(layer, x, g_out):
    # eval mode: observers frozen, so no state mutation under jax.grad;
    # the STE gradients are identical to train mode (scale/zp carry
    # stop_gradient either way)
    M.eval_mode(layer)
    gdef, params, rest = nnx.split(layer, nnx.Param, ...)

    def loss(p, xi):
        m = nnx.merge(gdef, p, rest)
        return jnp.sum(m(xi) * g_out)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    M.train_mode(layer)
    return jax.tree.leaves(gp), gx


def _check_layer(off, on, x, atol=2e-5):
    M.train_mode(off), M.train_mode(on)
    y_off, y_on = off(x), on(x)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=atol)
    # observer/qparam state identical (codes() runs the same update)
    np.testing.assert_array_equal(
        np.asarray(off.activation_quantizer.scale[...]),
        np.asarray(on.activation_quantizer.scale[...]),
    )
    g_out = jax.random.normal(jax.random.PRNGKey(7), y_off.shape)
    gp_off, gx_off = _grads(off, x, g_out)
    gp_on, gx_on = _grads(on, x, g_out)
    np.testing.assert_allclose(np.asarray(gx_on), np.asarray(gx_off), atol=atol)
    for a, b in zip(gp_on, gp_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_conv2d_codes_symmetric_and_asymmetric():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16)) * 3
    for q_type in (0, 1):
        off, on = _pair(
            {"q_type": q_type},
            qat_iao.QuantConv2d,
            lambda cfg, rngs: qat_iao.QuantConv2d(
                16, 8, 3, padding=1, groups=2, bias=True, cfg=cfg, rngs=rngs
            ),
        )
        _check_layer(off, on, x)


def test_bn_fuse_conv_codes():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 8)) * 2
    for calib in (False, True):
        off, on = _pair(
            {"bn_fuse": True, "bn_fuse_calib": calib},
            qat_iao.QuantBNFuseConv2d,
            lambda cfg, rngs: qat_iao.QuantBNFuseConv2d(
                8, 8, 3, padding=1, bias=True, cfg=cfg, rngs=rngs
            ),
        )
        _check_layer(off, on, x, atol=5e-5)


def test_linear_codes():
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32)) * 4
    for q_type in (0, 1):
        off, on = _pair(
            {"q_type": q_type},
            qat_iao.QuantLinear,
            lambda cfg, rngs: qat_iao.QuantLinear(32, 10, cfg=cfg, rngs=rngs),
        )
        _check_layer(off, on, x)


def test_conv_transpose_codes():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 8)) * 2
    off, on = _pair(
        {},
        qat_iao.QuantConvTranspose2d,
        lambda cfg, rngs: qat_iao.QuantConvTranspose2d(
            8, 4, 3, stride=2, padding=1, output_padding=1, cfg=cfg, rngs=rngs
        ),
    )
    _check_layer(off, on, x)


@pytest.mark.slow
def test_codes_training_trajectory_matches_standard():
    """5 Adam steps of a small NIN: codes-on trajectory tracks codes-off
    (f32 code dtype on CPU -> differences are float-associativity only)."""

    def run(act_codes):
        cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, act_codes=act_codes)
        q = prepare(nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0)), cfg, method="iao")
        M.train_mode(q)
        opt = nnx.Optimizer(q, optax.adam(1e-3), wrt=nnx.Param)

        @nnx.jit
        def step(model, opt, x, y):
            def loss_fn(m):
                return optax.softmax_cross_entropy_with_integer_labels(
                    m(x), y
                ).mean()

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            return loss

        losses = []
        for i in range(5):
            x = jax.random.normal(jax.random.PRNGKey(i), (8, 32, 32, 3))
            y = jax.random.randint(jax.random.PRNGKey(100 + i), (8,), 0, 10)
            losses.append(float(step(q, opt, x, y)))
        return losses

    l_off = run("off")
    l_on = run("on")
    # first steps bit-close; later steps drift only by rounding-threshold
    # flips amplified through training (same tolerance class as the torch
    # trajectory oracles in test_train_trajectory.py)
    np.testing.assert_allclose(l_on[:2], l_off[:2], rtol=1e-4)
    np.testing.assert_allclose(l_on, l_off, rtol=2e-2, atol=2e-2)


def test_auto_resolves_off_on_cpu():
    cfg = QuantConfig(a_bits=8, w_bits=8)  # act_codes="auto"
    layer = qat_iao.QuantConv2d(4, 4, 1, cfg=cfg, rngs=nnx.Rngs(0))
    assert layer.act_codes is False  # conftest pins the CPU backend


# ---- DoReFa code-storage lowering ----


@pytest.mark.slow
def test_dorefa_codes_layers():
    """DoReFa conv/linear/convtranspose: codes path == standard path
    (values + gradients) with CPU's f32 code dtype."""
    from micronet_tpu.nn import qat_dorefa

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 10, 6)) * 3
    for ctor, xi in [
        (lambda cfg, rngs: qat_dorefa.QuantConv2d(6, 8, 3, padding=1, cfg=cfg, rngs=rngs), x),
        (lambda cfg, rngs: qat_dorefa.QuantConvTranspose2d(6, 8, 3, stride=2, cfg=cfg, rngs=rngs), x),
        (lambda cfg, rngs: qat_dorefa.QuantLinear(6, 8, cfg=cfg, rngs=rngs),
         jax.random.normal(jax.random.PRNGKey(2), (4, 6)) * 3),
    ]:
        off = ctor(dataclasses.replace(BASE), nnx.Rngs(0))
        on = ctor(dataclasses.replace(BASE, act_codes="on"), nnx.Rngs(0))
        y_off, y_on = off(xi), on(xi)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), atol=2e-5
        )
        g_out = jax.random.normal(jax.random.PRNGKey(7), y_off.shape)
        gp_off, gx_off = _grads(off, xi, g_out)
        gp_on, gx_on = _grads(on, xi, g_out)
        np.testing.assert_allclose(np.asarray(gx_on), np.asarray(gx_off), atol=2e-5)
        for a, b in zip(gp_on, gp_off):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_dorefa_codes_training_trajectory():
    """5 Adam steps of a DoReFa NIN: codes-on trajectory == codes-off on
    CPU (f32 codes, exact composition)."""

    def run(mode):
        cfg = QuantConfig(a_bits=4, w_bits=4, act_codes=mode)
        q = prepare(nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0)), cfg, method="dorefa")
        M.train_mode(q)
        opt = nnx.Optimizer(q, optax.adam(1e-3), wrt=nnx.Param)

        @nnx.jit
        def step(model, opt, x, y):
            def loss_fn(m):
                return optax.softmax_cross_entropy_with_integer_labels(
                    m(x), y
                ).mean()

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            return loss

        losses = []
        for i in range(5):
            x = jax.random.normal(jax.random.PRNGKey(i), (8, 32, 32, 3))
            y = jax.random.randint(jax.random.PRNGKey(100 + i), (8,), 0, 10)
            losses.append(float(step(q, opt, x, y)))
        return losses

    l_on, l_off = run("on"), run("off")
    # per-layer the composition is exact to 1e-6 (test above); through 9
    # stacked quantizers a 1e-7 fusion-reassociation difference can land a
    # value on the other side of a round() boundary and flip one code by a
    # whole step, so whole-model trajectories are compared statistically,
    # not bitwise
    np.testing.assert_allclose(l_on, l_off, rtol=2e-2, atol=2e-2)
