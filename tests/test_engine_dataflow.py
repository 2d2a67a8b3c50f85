"""Dataflow-traced int8 chain planner (infer/engine.py, infer/dataflow.py).

The reference's union-scale QuantAdd/QuantConcat (iao/quantize.py:1441-1498)
exist so the integer add/concat needs no rescale; these tests check the
engine exploits that: residual and concat graphs chain end to end through
IntAdd/IntConcat, stay numerically equivalent to the fake-quant oracle,
and the 1x1 dot_general lowering is bit-identical to the conv lowering.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.infer import freeze_int, fuse_bn_iao
from micronet_tpu.infer.bn_fuse import pre_quantize_weights
from micronet_tpu.infer.engine import IntAdd, IntConcat, IntConv2d
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare
from micronet_tpu.quant.config import QuantConfig


class CatNet(M.OrderedModule):
    def __init__(self, *, rngs):
        self.c1 = M.Conv2d(8, 16, 1, rngs=rngs)
        self.c2 = M.Conv2d(8, 16, 1, rngs=rngs)
        self.cat = M.Concat(axis=-1)
        self.c3 = M.Conv2d(32, 8, 1, rngs=rngs)

    def __call__(self, x):
        return self.c3(self.cat(self.c1(x), self.c2(x)))


class ResBlockNet(M.OrderedModule):
    """Residual block in the reference shape: conv-relu-conv + shortcut
    conv -> Add (models/resnet.py:57-65)."""

    def __init__(self, *, rngs):
        self.body = M.Sequential(
            M.Conv2d(8, 16, 3, padding=1, rngs=rngs),
            M.ReLU(),
            M.Conv2d(16, 16, 3, padding=1, rngs=rngs),
        )
        self.shortcut = M.Conv2d(8, 16, 1, rngs=rngs)
        self.add = M.Add()
        self.head = M.Conv2d(16, 4, 1, rngs=rngs)

    def __call__(self, x):
        return self.head(self.add(self.body(x), self.shortcut(x)))


def _prep(model_cls, cin=8):
    cfg = QuantConfig(a_bits=8, w_bits=8)
    q = prepare(model_cls(rngs=nnx.Rngs(0)), cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 8, 8, cin)))
    M.eval_mode(q)
    pre_quantize_weights(q)
    return q


@pytest.mark.slow
def test_concat_graph_chains_and_matches():
    q = _prep(CatNet)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 8, 8, 8))
    ref = q(x)
    eng = freeze_int(q, example_input=x)
    M.eval_mode(eng)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    cats = [m for _, m in nnx.iter_modules(eng) if isinstance(m, IntConcat)]
    assert len(cats) == 1
    chained = [m for _, m in nnx.iter_modules(eng) if getattr(m, "chained", False)]
    # c1, c2 chain into the concat; the concat chains into c3
    assert len(chained) == 3 and cats[0] in chained


def test_residual_graph_chains_through_int_add():
    q = _prep(ResBlockNet)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 8, 8, 8))
    ref = q(x)
    eng = freeze_int(q, example_input=x)
    M.eval_mode(eng)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    adds = [m for _, m in nnx.iter_modules(eng) if isinstance(m, IntAdd)]
    assert len(adds) == 1
    chained = [m for _, m in nnx.iter_modules(eng) if getattr(m, "chained", False)]
    # conv1 -> (relu) -> conv2, conv2 -> add, shortcut -> add, add -> head
    assert len(chained) == 4 and adds[0] in chained


def test_no_example_input_disables_chaining_on_branching_graphs():
    q = _prep(ResBlockNet)
    eng = freeze_int(q, chain_int8=True)  # leaf-order fallback must bail
    assert not any(getattr(m, "chained", False) for _, m in nnx.iter_modules(eng))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8))
    M.eval_mode(eng)
    np.testing.assert_allclose(np.asarray(eng(x)), np.asarray(q(x)), atol=1e-5)


@pytest.mark.slow
def test_pointwise_dot_bit_identical_to_conv_lowering():
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    from micronet_tpu.models import nin_gc

    q = prepare(
        nin_gc.Net(cfg=[32, 32, 32, 64, 64, 64, 128, 128], rngs=nnx.Rngs(0)),
        cfg,
        method="iao",
    )
    M.train_mode(q)
    for i in range(2):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3))
    outs = {}
    for dot in (False, True):
        eng = freeze_int(fused, example_input=x)
        for _, mm in nnx.iter_modules(eng):
            if isinstance(mm, IntConv2d):
                mm.pointwise_dot = dot
        M.eval_mode(eng)
        outs[dot] = np.asarray(eng(x))
    np.testing.assert_array_equal(outs[False], outs[True])
