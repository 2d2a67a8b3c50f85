"""bf16 batch-statistics lowering (QuantConfig.bn_stats, BENCHMARKS.md).

The QuantBNFuseConv2d stats conv output is consumed only by per-channel
mean/var reductions, so under ``bn_stats`` it materializes in bf16 with
f32-accumulated reductions (the bias folds into the mean analytically).
Forcing "on" on CPU runs the real bf16 path, so these tests check the
lowering's numerics directly: batch/running stats, outputs, gradients,
and training trajectories must track the f32 path within bf16 tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from micronet_tpu.models import nin
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare, qat_iao
from micronet_tpu.quant.config import QuantConfig

BASE = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, bn_stats="off")


def _pair(cfg_kwargs, bias=True):
    def build(cfg):
        return qat_iao.QuantBNFuseConv2d(
            8, 8, 3, padding=1, bias=bias, cfg=cfg, rngs=nnx.Rngs(0)
        )

    off = build(dataclasses.replace(BASE, **cfg_kwargs))
    on = build(dataclasses.replace(BASE, bn_stats="on", **cfg_kwargs))
    return off, on


def _grads(layer, x, g_out):
    M.eval_mode(layer)
    gdef, params, rest = nnx.split(layer, nnx.Param, ...)

    def loss(p, xi):
        m = nnx.merge(gdef, p, rest)
        return jnp.sum(m(xi) * g_out)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    M.train_mode(layer)
    return jax.tree.leaves(gp), gx


def test_bf16_stats_layer_parity():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 8)) * 2
    for calib in (False, True):
        for bias in (True, False):
            off, on = _pair({"bn_fuse_calib": calib}, bias=bias)
            M.train_mode(off), M.train_mode(on)
            y_off, y_on = off(x), on(x)
            # bf16 stats perturb the fused weights/bias by ~1e-2 relative
            np.testing.assert_allclose(
                np.asarray(y_on), np.asarray(y_off), rtol=0.05, atol=0.05
            )
            np.testing.assert_allclose(
                np.asarray(on.running_mean[...]),
                np.asarray(off.running_mean[...]),
                rtol=0.02,
                atol=0.02,
            )
            np.testing.assert_allclose(
                np.asarray(on.running_var[...]),
                np.asarray(off.running_var[...]),
                rtol=0.02,
                atol=0.02,
            )


def test_bf16_stats_gradients_track():
    """Training-mode gradients flow through the bf16 stats conv (batch stats
    keep gradient, like the reference's differentiable batch_mean/var)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 8))
    off, on = _pair({})
    M.train_mode(off), M.train_mode(on)
    # one forward to seed observers/BN so eval-mode grads are comparable
    off(x), on(x)
    g_out = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 8))

    def train_grads(layer):
        def loss(m):
            return jnp.sum(m(x) * g_out)

        return jax.tree.leaves(nnx.grad(loss)(layer))

    for a, b in zip(train_grads(on), train_grads(off)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05
        )


def test_bf16_stats_training_trajectory():
    """5 Adam steps of a small bn_fuse NIN: bn_stats-on trajectory tracks
    the f32 path within bf16-noise tolerance."""

    def run(bn_stats):
        cfg = QuantConfig(
            a_bits=8, w_bits=8, bn_fuse=True, act_codes="off", bn_stats=bn_stats
        )
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
    np.testing.assert_allclose(l_on[0], l_off[0], rtol=5e-3)
    np.testing.assert_allclose(l_on, l_off, rtol=5e-2, atol=5e-2)


def test_bn_stats_auto_resolves_off_on_cpu():
    layer = qat_iao.QuantBNFuseConv2d(
        4, 4, 1, cfg=QuantConfig(bn_fuse=True), rngs=nnx.Rngs(0)
    )
    assert layer.bf16_stats is False  # conftest pins the CPU backend
