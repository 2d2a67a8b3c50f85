"""BN-fusion export + train≡inference equivalence — the reference's
correctness oracle, automated (SURVEY.md §4.2).

- IAO: fused QuantConv2d (scale/zp carried, weights pre-quantized) must
  reproduce the eval-mode QuantBNFuseConv2d model EXACTLY.
- wbwtab (A=2): BN->bias fusion is order-preserving under sign, so fused
  logits must match the eval-mode train model to float tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.infer import fuse_bn_iao, fuse_bn_wbwtab, pre_quantize_weights
from micronet_tpu.models import nin
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare, qat_iao, qat_wbwtab
from micronet_tpu.quant.config import QuantConfig


def _trained_iao_model(cfg):
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, cfg, method="iao")
    M.train_mode(q)
    # a few steps to move BN stats + observers off init
    for i in range(3):
        x = jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3))
        q(x)
    return q


def test_iao_fuse_equivalence():
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    q = _trained_iao_model(cfg)
    M.eval_mode(q)
    x = jax.random.normal(jax.random.PRNGKey(99), (4, 32, 32, 3))
    y_train = q(x)

    fused = fuse_bn_iao(q, cfg)
    n_bnf = sum(
        1 for _, m in nnx.iter_modules(fused) if isinstance(m, qat_iao.QuantBNFuseConv2d)
    )
    n_q = sum(
        1 for _, m in nnx.iter_modules(fused) if type(m) is qat_iao.QuantConv2d
    )
    assert n_bnf == 0 and n_q == 9
    M.eval_mode(fused)
    y_fused = fused(x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_train), atol=1e-4)
    # original untouched
    assert any(
        isinstance(m, qat_iao.QuantBNFuseConv2d) for _, m in nnx.iter_modules(q)
    )


def test_wbwtab_fuse_equivalence():
    # train-architecture wbwtab model (quantized convs 2..8, BNs intact)
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    cfg = QuantConfig(W=2, A=2)
    q = prepare(model, cfg, method="wbwtab")
    M.train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    M.eval_mode(q)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3))
    y_train = q(x)

    fused = fuse_bn_wbwtab(q, cfg)
    # all BNs gone; convs 2..8 quant-inference, conv 1 and 9 plain
    assert not any(
        type(m) is M.BatchNorm2d for _, m in nnx.iter_modules(fused)
    )
    n_qi = sum(
        1
        for _, m in nnx.iter_modules(fused)
        if isinstance(m, qat_wbwtab.QuantConv2d) and m.quant_inference
    )
    assert n_qi == 7
    M.eval_mode(fused)
    y_fused = fused(x)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_train), atol=5e-4, rtol=1e-4
    )


def test_pre_quantize_idempotent():
    # fake-quant is a projection: applying it twice == once
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    cfg = QuantConfig(a_bits=8, w_bits=8)
    q = prepare(model, cfg, method="iao")
    M.train_mode(q)
    q(jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3)))
    import copy

    pre_quantize_weights(q)
    w1 = [
        np.asarray(m.weight[...])
        for _, m in nnx.iter_modules(q)
        if isinstance(m, qat_iao.QuantConv2d)
    ]
    pre_quantize_weights(q)
    w2 = [
        np.asarray(m.weight[...])
        for _, m in nnx.iter_modules(q)
        if isinstance(m, qat_iao.QuantConv2d)
    ]
    for a, b in zip(w1, w2):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_wbwtab_ternary_engine():
    """freeze_wbwtab: integer execution of the binary/ternary net matches
    the pre-quantized-float fused model."""
    from micronet_tpu.infer import freeze_wbwtab, fuse_bn_wbwtab, TernaryConv2d

    for W in (2, 3):
        model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
        cfg = QuantConfig(W=W, A=2)
        q = prepare(model, cfg, method="wbwtab")
        M.train_mode(q)
        for i in range(2):
            q(jax.random.normal(jax.random.PRNGKey(i), (2, 32, 32, 3)))
        M.eval_mode(q)
        fused = fuse_bn_wbwtab(q, cfg)
        M.eval_mode(fused)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
        y_fused = fused(x)

        engine = freeze_wbwtab(fused)
        n_t = sum(
            1 for _, m in nnx.iter_modules(engine) if isinstance(m, TernaryConv2d)
        )
        assert n_t == 7  # binary-range convs 2..8
        y_int = engine(x)
        np.testing.assert_allclose(
            np.asarray(y_int), np.asarray(y_fused), atol=2e-3, rtol=1e-3,
            err_msg=f"W={W}",
        )


def test_bf16_eval_mode():
    """to_bf16 (the TRT fp16-flag analog): halves float storage, output
    tracks f32 within bf16 tolerance on a fused export."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from micronet_tpu.infer import bf16_runner, to_bf16
    from micronet_tpu.models import nin
    from micronet_tpu.nn import eval_mode, train_mode

    m = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    train_mode(m)
    for i in range(2):
        m(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    eval_mode(m)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3))
    y_f32 = np.asarray(m(x))
    f32_bytes = sum(
        l.size * l.dtype.itemsize
        for l in jax.tree.leaves(nnx.state(m))
        if hasattr(l, "dtype")
    )
    mb = to_bf16(m)
    bf_bytes = sum(
        l.size * l.dtype.itemsize
        for l in jax.tree.leaves(nnx.state(mb))
        if hasattr(l, "dtype")
    )
    assert bf_bytes < 0.6 * f32_bytes
    run = bf16_runner(mb)
    y_bf = np.asarray(jax.jit(run)(x))
    assert y_bf.dtype == np.float32
    rel = np.linalg.norm(y_bf - y_f32) / np.linalg.norm(y_f32)
    assert rel < 0.05, rel
