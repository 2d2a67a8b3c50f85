"""Adversarial tests for the definition-order stamp machinery.

Every tree walk in the framework — Conv->BN pairing in prepare()
(transform.py::_children), pruning surgery, BN-fuse export, the engine
planner's leaf order — assumes children are visited in torch
``named_children`` insertion order. The reference gets this for free from
torch's attribute dict; flax graph rebuilds alphabetize attributes, so we
carry ``_mn_order`` stamps instead (nn/modules.py::OrderedModule). These
tests attack the stamp mechanism directly: out-of-order construction,
containers nested in containers, rebuild round-trips, and rewrite setters.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.nn import modules as M
from micronet_tpu.nn import qat_iao, prepare
from micronet_tpu.nn.transform import _children
from micronet_tpu.quant.config import QuantConfig


def _child_names(module):
    return [name for name, _, _ in _children(module)]


class OutOfOrderNet(M.OrderedModule):
    """Submodules CONSTRUCTED in reverse of the order they are assigned.

    Construction-order stamping alone would walk bn before conv and the
    Conv->BN pairing in prepare(bn_fuse=True) would never fire."""

    def __init__(self, *, rngs):
        relu = M.ReLU()
        bn = M.BatchNorm2d(8)
        conv = M.Conv2d(3, 8, 3, padding=1, rngs=rngs)
        self.conv = conv
        self.bn = bn
        self.relu = relu

    def __call__(self, x):
        return self.relu(self.bn(self.conv(x)))


def test_out_of_order_construction_walks_in_assignment_order():
    net = OutOfOrderNet(rngs=nnx.Rngs(0))
    assert _child_names(net) == ["conv", "bn", "relu"]


def test_out_of_order_construction_pairs_conv_bn():
    net = OutOfOrderNet(rngs=nnx.Rngs(0))
    q = prepare(net, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    assert isinstance(q.conv, qat_iao.QuantBNFuseConv2d)
    assert isinstance(q.bn, M.Identity)
    # and it still runs
    M.train_mode(q)
    y = q(jnp.ones((2, 8, 8, 3)))
    assert y.shape == (2, 8, 8, 8)


class SharedListNet(M.OrderedModule):
    """Layers built into a list out of order, then assembled."""

    def __init__(self, *, rngs):
        # construct in scrambled order
        second = M.Sequential(
            M.Conv2d(8, 4, 1, rngs=rngs), M.BatchNorm2d(4), M.ReLU()
        )
        first = M.Sequential(
            M.Conv2d(3, 8, 3, padding=1, rngs=rngs), M.BatchNorm2d(8), M.ReLU()
        )
        self.blocks = nnx.List([first, second])

    def __call__(self, x):
        for b in self.blocks:
            x = b(x)
        return x


def test_list_order_wins_over_construction_order():
    net = SharedListNet(rngs=nnx.Rngs(0))
    names = _child_names(net)
    assert names == ["blocks[0]", "blocks[1]"]
    q = prepare(net, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    for b in q.blocks:
        assert isinstance(b.layers[0], qat_iao.QuantBNFuseConv2d)
        assert isinstance(b.layers[1], M.Identity)


class DeepNest(M.OrderedModule):
    """Sequential inside List inside module, constructed inside-out."""

    def __init__(self, *, rngs):
        tail = M.Linear(16, 10, rngs=rngs)
        inner = M.Sequential(
            M.Conv2d(3, 16, 3, padding=1, rngs=rngs),
            M.BatchNorm2d(16),
            M.ReLU(),
            M.AdaptiveAvgPool2d(1),
            M.Flatten(),
        )
        self.body = nnx.List([inner])
        self.head = tail

    def __call__(self, x):
        for b in self.body:
            x = b(x)
        return self.head(x)


def test_deep_nesting_orders_container_before_head():
    net = DeepNest(rngs=nnx.Rngs(0))
    assert _child_names(net) == ["body[0]", "head"]
    q = prepare(net, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    assert isinstance(q.body[0].layers[0], qat_iao.QuantBNFuseConv2d)
    assert isinstance(q.head, qat_iao.QuantLinear)


def test_order_survives_deepcopy_and_split_merge():
    net = OutOfOrderNet(rngs=nnx.Rngs(0))
    # deepcopy alphabetizes attribute dicts; stamps must still order it
    cp = copy.deepcopy(net)
    assert _child_names(cp) == ["conv", "bn", "relu"]
    # split/merge (what nnx.jit does internally) rebuilds via the graphdef
    gdef, state = nnx.split(net)
    merged = nnx.merge(gdef, state)
    assert _child_names(merged) == ["conv", "bn", "relu"]
    q = prepare(merged, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    assert isinstance(q.conv, qat_iao.QuantBNFuseConv2d)


def test_rewrite_setters_preserve_position():
    """A child replaced through a _children setter must keep the OLD
    child's position even though assignment re-stamps."""
    net = OutOfOrderNet(rngs=nnx.Rngs(0))
    for name, child, set_child in list(_children(net)):
        if name == "conv":
            set_child(M.Identity())
    assert _child_names(net) == ["conv", "bn", "relu"]
    assert isinstance(net.conv, M.Identity)


def test_reassignment_moves_position():
    """Plain re-assignment (user code, not a rewrite setter) re-stamps:
    the attribute takes the NEW assignment position — torch insertion
    semantics for a re-inserted key."""
    net = OutOfOrderNet(rngs=nnx.Rngs(0))
    net.conv = M.Conv2d(3, 8, 3, padding=1, rngs=nnx.Rngs(1))
    assert _child_names(net) == ["bn", "relu", "conv"]


def test_trained_model_order_stable_under_grad():
    """One nnx.value_and_grad step (internal split/merge) must not
    perturb walk order on a prepared model."""
    import optax

    net = OutOfOrderNet(rngs=nnx.Rngs(0))
    q = prepare(net, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    M.train_mode(q)
    opt = nnx.Optimizer(q, optax.adam(1e-3), wrt=nnx.Param)
    x = jnp.ones((2, 8, 8, 3))

    def loss_fn(m):
        return jnp.sum(m(x) ** 2)

    loss, grads = nnx.value_and_grad(loss_fn)(q)
    opt.update(q, grads)
    assert np.isfinite(float(loss))
    assert _child_names(q) == ["conv", "bn", "relu"]


def test_first_last_layer_bit_overrides():
    """QuantConfig first/last-layer exceptions: the first and last
    quantizable conv/linear get the override widths, the body keeps the
    base widths — across containers and bn_fuse pairing (the reference's
    skip-first/skip-last rules as bit overrides)."""
    import jax
    from flax import nnx

    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import prepare, qat_iao
    from micronet_tpu.quant.config import QuantConfig

    cfg = QuantConfig(
        a_bits=4, w_bits=4, bn_fuse=True,
        first_layer_a_bits=8, first_layer_w_bits=8,
        last_layer_a_bits=6, last_layer_w_bits=8,
    )
    q = prepare(nin_gc.Net(rngs=nnx.Rngs(0)), cfg, method="iao")
    seen, uniq = set(), []
    for _, m in nnx.iter_modules(q):
        if isinstance(m, qat_iao.QuantBNFuseConv2d) and id(m) not in seen:
            seen.add(id(m))
            uniq.append(m)
    bits = sorted(
        (m.activation_quantizer.bits, m.weight_quantizer.bits) for m in uniq
    )
    assert bits.count((4, 4)) == 7  # 9-layer body minus first/last
    assert (8, 8) in bits and (6, 8) in bits
