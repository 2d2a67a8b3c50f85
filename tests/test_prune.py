"""Pruning engine tests. Oracle: for conv-BN-ReLU chains, a channel whose
BN gamma/beta are zeroed contributes exactly zero downstream, so the
pruned (materialized smaller) model must reproduce the zeroed big model's
eval outputs — the reference's pre-prune vs post-prune test pair
(normal_regular_prune.py:144-186, SURVEY.md §2.4)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.models import nin, nin_gc
from micronet_tpu.nn import modules as M
from micronet_tpu.prune import (
    bn_l1_grad_update,
    compute_prune_masks,
    gc_base_numbers,
    prune_model,
)

LAYERS = 9  # nin conv count; prunable BNs = layers - 1 = 8


def _rand_gammas(model, seed=0):
    rng = np.random.RandomState(seed)
    for _, m in nnx.iter_modules(model):
        if isinstance(m, M.BatchNorm2d):
            m.weight[...] = jnp.asarray(rng.rand(m.num_features).astype(np.float32))
            m.bias[...] = jnp.asarray(
                0.1 * rng.randn(m.num_features).astype(np.float32)
            )


def test_masks_and_cfg():
    model = nin.Net(cfg=[16] * 8, rngs=nnx.Rngs(0))
    _rand_gammas(model)
    cfg, masks, ratio = compute_prune_masks(model, 0.5, layers=LAYERS)
    assert len(cfg) == 8 and len(masks) == 8
    # ~50% of channels pruned globally
    total = sum(m.size for m in masks)
    kept = sum(int(m.sum()) for m in masks)
    assert abs((total - kept) / total - 0.5) < 0.1
    for c, m in zip(cfg, masks):
        assert c == int(m.sum())
        assert c >= 1


def test_regular_rounding():
    model = nin.Net(cfg=[16] * 8, rngs=nnx.Rngs(0))
    _rand_gammas(model)
    cfg, masks, _ = compute_prune_masks(model, 0.5, base_number=4, layers=LAYERS)
    for c in cfg:
        # every surviving count is a multiple of 4 (or below the base)
        assert c % 4 == 0 or c <= 4


@pytest.mark.slow
def test_prune_equivalence_nin():
    model = nin.Net(cfg=[12] * 8, rngs=nnx.Rngs(0))
    _rand_gammas(model)
    M.eval_mode(model)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))

    cfg, masks, _ = compute_prune_masks(model, 0.4, layers=LAYERS)
    y_zeroed = model(x)  # gammas/betas already zeroed in place

    new = nin.Net(cfg=cfg, rngs=nnx.Rngs(1))
    new = prune_model(model, new, masks, layers=LAYERS)
    M.eval_mode(new)
    y_pruned = new(x)
    np.testing.assert_allclose(
        np.asarray(y_pruned), np.asarray(y_zeroed), atol=1e-4
    )


def test_gc_base_numbers():
    model = nin_gc.Net(rngs=nnx.Rngs(0))
    bases = gc_base_numbers(model)
    # groups per conv are [1,2,2,16,4,4,32,8,1]; base_i = lcm(g_i, g_i+1)
    assert bases == [2, 2, 16, 16, 4, 32, 32, 8]


def test_bn_l1_grad_update():
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    _rand_gammas(model)
    M.eval_mode(model)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))

    def loss_fn(m):
        return m(x).sum()

    grads = nnx.grad(loss_fn)(model)
    s = 1e-2
    new_grads = bn_l1_grad_update(model, grads, s)
    # pick the first BN and check the subgradient was added
    bn = model.model[0].bn
    g0 = np.asarray(grads["model"]["layers"][0]["bn"]["weight"][...])
    g1 = np.asarray(new_grads["model"]["layers"][0]["bn"]["weight"][...])
    expected = g0 + s * np.sign(np.asarray(bn.weight[...]))
    np.testing.assert_allclose(g1, expected, rtol=1e-6)
    # conv grads untouched
    c0 = np.asarray(grads["model"]["layers"][0]["conv"]["weight"][...])
    c1 = np.asarray(new_grads["model"]["layers"][0]["conv"]["weight"][...])
    np.testing.assert_array_equal(c0, c1)


def test_sparsity_report():
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    _rand_gammas(model)
    from micronet_tpu.prune import sparsity_report

    rep = sparsity_report(model)
    assert len(rep) == 9  # one entry per BN
    for v in rep.values():
        assert v["channels"] in (8, 10)  # cfg widths + 10-way classifier BN
        assert 0.0 <= v["frac_below_1e-2"] <= 1.0
