"""Engine coverage matrix: asymmetric IntLinear, IntConvTranspose2d, and
q_type=1 (asymmetric) end-to-end freezing (VERDICT round-1 items 4/5).

Oracle: the fake-quant eval model with pre-quantized weights — the
engine's integer execution must reproduce it to float tolerance
(exactly, up to f32 accumulation order)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.infer import freeze_int
from micronet_tpu.infer.bn_fuse import pre_quantize_weights
from micronet_tpu.infer.engine import IntConvTranspose2d, IntLinear
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare
from micronet_tpu.quant.config import QuantConfig


class MLP(M.OrderedModule):
    def __init__(self, *, rngs):
        self.fc1 = M.Linear(12, 32, rngs=rngs)
        self.relu = M.ReLU()
        self.fc2 = M.Linear(32, 5, rngs=rngs)

    def __call__(self, x):
        return self.fc2(self.relu(self.fc1(x)))


class UpNet(M.OrderedModule):
    """conv -> transpose-conv (stride 2 upsample) -> conv."""

    def __init__(self, *, rngs):
        self.c1 = M.Conv2d(6, 16, 3, padding=1, rngs=rngs)
        self.up = M.ConvTranspose2d(16, 8, 4, stride=2, padding=1, rngs=rngs)
        self.c2 = M.Conv2d(8, 4, 1, rngs=rngs)

    def __call__(self, x):
        return self.c2(self.up(self.c1(x)))


def _prep(model, q_type, shape, a_bits=8, w_bits=8):
    cfg = QuantConfig(a_bits=a_bits, w_bits=w_bits, q_type=q_type)
    q = prepare(model, cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), shape))
    M.eval_mode(q)
    pre_quantize_weights(q)
    return q


def _check(q, x, atol=1e-4, example_input=None):
    ref = q(x)
    eng = freeze_int(q, example_input=example_input)
    M.eval_mode(eng)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol)
    return eng


@pytest.mark.slow
def test_int_linear_symmetric():
    q = _prep(MLP(rngs=nnx.Rngs(0)), 0, (4, 12))
    eng = _check(q, jax.random.normal(jax.random.PRNGKey(9), (4, 12)))
    assert sum(1 for _, m in nnx.iter_modules(eng) if isinstance(m, IntLinear)) == 2


def test_int_linear_asymmetric():
    # q_type=1: asymmetric activations AND weights — the decomposition
    # path (rank-1 corrections) must reproduce fake-quant
    q = _prep(MLP(rngs=nnx.Rngs(0)), 1, (4, 12))
    eng = _check(q, jax.random.normal(jax.random.PRNGKey(9), (4, 12)))
    lins = [m for _, m in nnx.iter_modules(eng) if isinstance(m, IntLinear)]
    assert len(lins) == 2 and not any(m.symmetric for m in lins)
    assert not any(m.w_symmetric for m in lins)


@pytest.mark.slow
def test_int_conv_transpose_symmetric():
    q = _prep(UpNet(rngs=nnx.Rngs(0)), 0, (2, 8, 8, 6))
    eng = _check(q, jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 6)))
    assert any(isinstance(m, IntConvTranspose2d) for _, m in nnx.iter_modules(eng))


@pytest.mark.slow
def test_int_conv_transpose_asymmetric():
    q = _prep(UpNet(rngs=nnx.Rngs(0)), 1, (2, 8, 8, 6))
    eng = _check(q, jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 6)))
    ups = [m for _, m in nnx.iter_modules(eng) if isinstance(m, IntConvTranspose2d)]
    assert len(ups) == 1 and not ups[0].symmetric and not ups[0].w_symmetric


@pytest.mark.slow
def test_freeze_q_type1_nin_end_to_end():
    # a q_type=1 W8A8 model with a Linear head freezes completely and
    # matches (the round-1 gap: asym IntLinear raised NotImplementedError)
    class ConvMLP(M.OrderedModule):
        def __init__(self, *, rngs):
            self.conv = M.Conv2d(3, 16, 3, padding=1, rngs=rngs)
            self.relu = M.ReLU()
            self.pool = M.MaxPool2d(2, 2, 0)
            self.flat = M.Flatten()
            self.fc = M.Linear(16 * 4 * 4, 10, rngs=rngs)

        def __call__(self, x):
            return self.fc(self.flat(self.pool(self.relu(self.conv(x)))))

    q = _prep(ConvMLP(rngs=nnx.Rngs(0)), 1, (4, 8, 8, 3))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    _check(q, x, example_input=x)


class _ConvMLP(M.OrderedModule):
    """conv -> relu -> pool -> conv -> linear: exercises the chained conv
    path, the pool passthrough, AND the IntLinear kernel path in one
    graph — the composition where the round-3 A4 divergence lived
    (int8_linear clipped activation codes to the int8 storage range
    instead of the a_bits range; VERDICT r3 weak #3)."""

    def __init__(self, *, rngs):
        self.conv = M.Conv2d(3, 16, 3, padding=1, rngs=rngs)
        self.relu = M.ReLU()
        self.pool = M.MaxPool2d(2, 2, 0)
        self.c2 = M.Conv2d(16, 8, 1, rngs=rngs)
        self.flat = M.Flatten()
        self.fc = M.Linear(8 * 4 * 4, 10, rngs=rngs)

    def __call__(self, x):
        return self.fc(self.flat(self.c2(self.pool(self.relu(self.conv(x))))))


def test_a4_linear_symmetric():
    # A4 codes clip at ±(2^3): the engine must clamp where fake-quant does
    q = _prep(MLP(rngs=nnx.Rngs(0)), 0, (4, 12), a_bits=4, w_bits=4)
    # large inputs force activations OUTSIDE the observed range — the
    # narrow-clip path the W8A8-only matrix never exercised
    x = 3.0 * jax.random.normal(jax.random.PRNGKey(9), (4, 12))
    _check(q, x)


def test_a4_linear_asymmetric():
    q = _prep(MLP(rngs=nnx.Rngs(0)), 1, (4, 12), a_bits=4, w_bits=4)
    x = 3.0 * jax.random.normal(jax.random.PRNGKey(9), (4, 12))
    _check(q, x)


@pytest.mark.slow
def test_a4_conv_chain_symmetric():
    # conv+pool+linear end-to-end at W4A4, chained int8 dataflow enabled
    q = _prep(_ConvMLP(rngs=nnx.Rngs(0)), 0, (4, 8, 8, 3), a_bits=4, w_bits=4)
    x = 2.0 * jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    _check(q, x, example_input=x)


def test_a4_conv_chain_asymmetric():
    q = _prep(_ConvMLP(rngs=nnx.Rngs(0)), 1, (4, 8, 8, 3), a_bits=4, w_bits=4)
    x = 2.0 * jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    _check(q, x, example_input=x)


def test_a2_w2_conv_symmetric():
    # the narrowest supported int-engine width: 2-bit codes ride int8
    q = _prep(_ConvMLP(rngs=nnx.Rngs(0)), 0, (4, 8, 8, 3), a_bits=2, w_bits=2)
    x = 2.0 * jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    _check(q, x, example_input=x)


@pytest.mark.slow
def test_a4_bnfuse_avgpool_chain():
    """The full BN-fuse W4A4 deploy path on a nin-shaped tail
    (conv+BN pairs, max-pool, avg-pool, classifier): fuse_bn_iao ->
    freeze_int must reproduce the fused fake-quant model. Regression for
    the round-4 find that _freeze_avgpool dropped the a_bits clip range
    (IntAvgPool2d clipped at ±128 where fake-quant clips at ±8)."""
    from micronet_tpu.infer import fuse_bn_iao

    class NinTail(M.OrderedModule):
        def __init__(self, *, rngs):
            self.c1 = M.Conv2d(3, 16, 3, padding=1, rngs=rngs)
            self.b1 = M.BatchNorm2d(16)
            self.r1 = M.ReLU()
            self.p1 = M.MaxPool2d(2, 2, 0)
            self.c2 = M.Conv2d(16, 8, 1, rngs=rngs)
            self.b2 = M.BatchNorm2d(8)
            self.r2 = M.ReLU()
            self.ap = M.AvgPool2d(4, 4, 0)
            self.flat = M.Flatten()
            self.fc = M.Linear(8, 5, rngs=rngs)

        def __call__(self, x):
            x = self.p1(self.r1(self.b1(self.c1(x))))
            x = self.ap(self.r2(self.b2(self.c2(x))))
            return self.fc(self.flat(x))

    cfg = QuantConfig(a_bits=4, w_bits=4, bn_fuse=True)
    q = prepare(NinTail(rngs=nnx.Rngs(0)), cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 8, 8, 3)))
    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    x = 2.0 * jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    ref = fused(x)
    eng = freeze_int(fused, example_input=x)
    M.eval_mode(eng)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_w4_weights_pack_and_match():
    # symmetric W4A8: weights store nibble-packed (2 codes/byte) and the
    # engine still reproduces fake-quant exactly
    from micronet_tpu.infer.engine import IntConv2d

    class Small(M.OrderedModule):
        def __init__(self, *, rngs):
            self.c1 = M.Conv2d(8, 16, 3, padding=1, rngs=rngs)
            self.relu = M.ReLU()
            self.c2 = M.Conv2d(16, 8, 1, rngs=rngs)
            self.flat = M.Flatten()
            self.fc = M.Linear(8 * 8 * 8, 4, rngs=rngs)

        def __call__(self, x):
            return self.fc(self.flat(self.c2(self.relu(self.c1(x)))))

    cfg = QuantConfig(a_bits=8, w_bits=4)
    q = prepare(Small(rngs=nnx.Rngs(0)), cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 8, 8, 8)))
    M.eval_mode(q)
    pre_quantize_weights(q)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 8))
    ref = q(x)
    eng = freeze_int(q, example_input=x)
    M.eval_mode(eng)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    convs = [m for _, m in nnx.iter_modules(eng) if isinstance(m, IntConv2d)]
    lins = [m for _, m in nnx.iter_modules(eng) if isinstance(m, IntLinear)]
    assert all(m.w_packed for m in convs), [m.w_packed for m in convs]
    assert all(m.w_packed for m in lins)
    # packed arrays really are half-size on the contraction dim
    for m in convs:
        kh, kw, cg, co = m.w_shape
        assert m.w_q[...].shape == (kh * kw * cg // 2, co)


@pytest.mark.slow
def test_mixed_bit_fl8_fuse_and_freeze():
    """First/last-layer bit exceptions survive BN fusion + engine freeze:
    fuse_bn_iao must rebuild each layer at ITS OWN trained widths, not
    the global config's (round-4 bug: an 8-bit-trained first layer
    rebuilt at the 4-bit body width reinterpreted its scale and crushed
    activations 16x — fused AND engine collapsed to chance together)."""
    from micronet_tpu.infer import fuse_bn_iao
    from micronet_tpu.models import nin

    cfg = QuantConfig(
        a_bits=4, w_bits=4, bn_fuse=True,
        first_layer_a_bits=8, first_layer_w_bits=8,
        last_layer_a_bits=8, last_layer_w_bits=8,
    )
    q = prepare(nin.Net(cfg=[16] * 8, rngs=nnx.Rngs(0)), cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    # fused layers keep THEIR trained widths: 8-bit first+last, 4-bit body
    from micronet_tpu.nn import qat_iao

    bits = sorted(
        (m.activation_quantizer.bits, m.weight_quantizer.bits)
        for _, m in {
            id(mm): (n, mm)
            for n, mm in nnx.iter_modules(fused)
            if isinstance(mm, qat_iao.QuantConv2d)
        }.values()
    )
    assert bits.count((8, 8)) == 2 and bits.count((4, 4)) == 7, bits
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3))
    ref = fused(x)
    eng = freeze_int(fused, example_input=x[:1])
    M.eval_mode(eng)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
    # and the fused model is not degenerate: eval-mode q vs fused agree
    M.eval_mode(q)
    qref = q(x)
    corr = np.corrcoef(
        np.asarray(qref).reshape(-1), np.asarray(ref).reshape(-1)
    )[0, 1]
    assert corr > 0.99, corr
