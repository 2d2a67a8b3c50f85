"""Pallas kernel numerics (interpret mode on CPU) + integer engine
equivalence with the fake-quant model."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.infer import freeze_int, fuse_bn_iao, IntConv2d
from micronet_tpu.models import nin
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare, qat_iao
from micronet_tpu.ops import (
    binary_act_matmul,
    int8_matmul_dequant,
    int8_matmul_dequant_xla,
)
from micronet_tpu.quant.config import QuantConfig


def _quantize_w(w, per_channel=True):
    if per_channel:
        scale = np.abs(w).max(axis=0) / 127.0
    else:
        scale = np.array(np.abs(w).max() / 127.0)
    q = np.clip(np.sign(w / scale) * np.floor(np.abs(w / scale) + 0.5), -127, 127)
    return q.astype(np.int8), scale.astype(np.float32)


def test_int8_matmul_pallas_matches_xla():
    rng = np.random.RandomState(0)
    x = rng.randn(50, 70).astype(np.float32)  # unaligned on purpose
    w = rng.randn(70, 130).astype(np.float32)
    w_q, w_scale = _quantize_w(w)
    x_scale = jnp.float32(np.abs(x).max() / 127.0)
    for zp in (0.0, 3.0):
        ref = int8_matmul_dequant_xla(
            jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(w_scale),
            x_scale, jnp.float32(zp),
        )
        out = int8_matmul_dequant(
            jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(w_scale),
            x_scale, jnp.float32(zp),
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # int8 quantization error vs the float matmul stays ~1%
    rel = np.abs(np.asarray(ref) - x @ w).max() / np.abs(x @ w).max()
    assert rel < 0.02


def test_binary_act_matmul():
    rng = np.random.RandomState(1)
    x = rng.randn(40, 128).astype(np.float32)  # K aligned -> pallas path
    w_q = rng.choice([-1, 0, 1], size=(128, 96)).astype(np.int8)
    alpha = (0.5 + rng.rand(96)).astype(np.float32)
    out = binary_act_matmul(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(alpha))
    x_b = np.where(x >= 0, 1, -1).astype(np.int32)
    ref = (x_b @ w_q.astype(np.int32)).astype(np.float32) * alpha[None, :]
    np.testing.assert_array_equal(np.asarray(out), ref)
    # unaligned K falls back to XLA with identical semantics
    x2 = rng.randn(7, 100).astype(np.float32)
    w2 = rng.choice([-1, 0, 1], size=(100, 5)).astype(np.int8)
    a2 = np.ones(5, np.float32)
    out2 = binary_act_matmul(jnp.asarray(x2), jnp.asarray(w2), jnp.asarray(a2))
    ref2 = (np.where(x2 >= 0, 1, -1).astype(np.int32) @ w2.astype(np.int32)).astype(
        np.float32
    )
    np.testing.assert_array_equal(np.asarray(out2), ref2)


def test_int_engine_matches_fused_model():
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3))
    y_fused = fused(x)

    engine = freeze_int(fused, chain_int8=False)
    n_int = sum(1 for _, m in nnx.iter_modules(engine) if isinstance(m, IntConv2d))
    assert n_int == 9
    y_int = engine(x)
    # int32 accumulation vs f32 accumulation of identical quantized values
    np.testing.assert_allclose(
        np.asarray(y_int), np.asarray(y_fused), atol=2e-3, rtol=1e-3
    )

    # chained-int8 engine: requant epilogues introduce occasional 1-LSB
    # differences; logits stay close and predictions agree
    chained = freeze_int(fused)
    n_chained = sum(
        1
        for _, m in nnx.iter_modules(chained)
        if isinstance(m, IntConv2d) and m.chained
    )
    # all 9 convs chain: 8 into the next conv, the classifier into the
    # final quantizing avg-pool (receive-only)
    assert n_chained == 9
    y_c = chained(x)
    assert np.mean(
        np.argmax(np.asarray(y_c), -1) == np.argmax(np.asarray(y_fused), -1)
    ) == 1.0
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_fused), atol=0.05)


def test_int_engine_asymmetric_activations():
    """q_type=1 (asymmetric/unsigned) engine: the shifted-int8 storage +
    folded zero-point correction reproduces the fused fake-quant model."""
    cfg = QuantConfig(a_bits=8, w_bits=8, q_type=1, bn_fuse=True)
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, cfg, method="iao")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3))
    y_fused = fused(x)

    engine = freeze_int(fused)  # chaining requires symmetric -> unchained
    assert not any(
        m.chained for _, m in nnx.iter_modules(engine) if isinstance(m, IntConv2d)
    )
    y_int = engine(x)
    np.testing.assert_allclose(
        np.asarray(y_int), np.asarray(y_fused), atol=5e-3, rtol=1e-3
    )
