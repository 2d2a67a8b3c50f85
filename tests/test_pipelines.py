"""Cross-stage pipeline handoffs, mirroring the reference README
workflows (SURVEY.md §3.2-3.4): float -> PTQ calibration -> QAFT
finetune -> BN-fuse -> int engine; and sparse-train -> prune -> finetune
-> quantize."""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from micronet_tpu.infer import freeze_int, fuse_bn_iao
from micronet_tpu.models import nin
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare, qat_iao
from micronet_tpu.prune import bn_l1_grad_update, compute_prune_masks, prune_model
from micronet_tpu.quant.config import QuantConfig
from micronet_tpu.train import checkpoint


def _steps(model, n, lr=1e-3, bn_hook=None):
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    for i in range(n):
        x = jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3))
        y = jax.random.randint(jax.random.PRNGKey(100 + i), (4,), 0, 10)

        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        if bn_hook:
            grads = bn_hook(model, grads)
        opt.update(model, grads)
    return float(loss)


@pytest.mark.slow
def test_ptq_then_qaft_then_engine(tmp_path):
    # 1) float training
    fp = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    M.train_mode(fp)
    _steps(fp, 2)
    ckpt = str(tmp_path / "float.npz")
    checkpoint.save_state(ckpt, fp)

    # 2) PTQ: histogram observers, forward-only calibration
    ptq_cfg = QuantConfig(
        a_bits=8, w_bits=8, bn_fuse=True, pretrained_model=True, ptq=True,
        percentile=0.999,
    )
    fp2 = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    checkpoint.load_state(ckpt, fp2)
    q = prepare(fp2, ptq_cfg, method="iao")
    M.train_mode(q)
    for i in range(5):  # calibration stream, no backward
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    # observers saw data
    fq = next(
        m.activation_quantizer
        for _, m in nnx.iter_modules(q)
        if isinstance(m, qat_iao.QuantBNFuseConv2d)
    )
    assert bool(fq.initialized[...])
    assert fq.observer == "histogram"
    qat_ckpt = str(tmp_path / "ptq.npz")
    checkpoint.save_state(qat_ckpt, q)

    # 3) QAFT: frozen observers/BN, small-lr finetune
    qaft_cfg = dataclasses.replace(ptq_cfg, ptq=False, qaft=True)
    q2 = prepare(nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0)), qaft_cfg, method="iao")
    # histogram vs ema observer choice changes no state shapes: same tree
    checkpoint.load_state(qat_ckpt, q2)
    M.train_mode(q2)
    scale_before = np.asarray(fq.scale[...]).copy()
    _steps(q2, 2, lr=1e-5)
    fq2 = next(
        m.activation_quantizer
        for _, m in nnx.iter_modules(q2)
        if isinstance(m, qat_iao.QuantBNFuseConv2d)
    )
    # QAFT froze quant params
    np.testing.assert_array_equal(np.asarray(fq2.scale[...]), scale_before)

    # 4) fuse + engine
    fused = fuse_bn_iao(q2, qaft_cfg)
    engine = freeze_int(fused)
    M.eval_mode(fused), M.eval_mode(engine)
    x = jax.random.normal(jax.random.PRNGKey(42), (4, 32, 32, 3))
    assert np.array_equal(
        np.argmax(np.asarray(engine(x)), -1), np.argmax(np.asarray(fused(x)), -1)
    )


@pytest.mark.slow
def test_sparse_prune_finetune_quantize(tmp_path):
    # sparse train with BN-L1
    fp = nin.Net(cfg=[12] * 8, rngs=nnx.Rngs(0))
    M.train_mode(fp)
    _steps(fp, 3, bn_hook=lambda m, g: bn_l1_grad_update(m, g, 1e-2))

    # prune at 30%
    M.eval_mode(fp)
    cfg_list, masks, ratio = compute_prune_masks(fp, 0.3, layers=9)
    new = nin.Net(cfg=cfg_list, rngs=nnx.Rngs(1))
    new = prune_model(fp, new, masks, layers=9)
    ckpt = str(tmp_path / "pruned.npz")
    checkpoint.save_state(ckpt, new, extra={"cfg": cfg_list})

    # rebuild from checkpoint cfg (the {cfg, state} contract)
    _, _, extra = checkpoint.load_state(
        ckpt, nin.Net(cfg=cfg_list, rngs=nnx.Rngs(2))
    )
    assert extra["cfg"] == cfg_list

    # finetune then quantize the pruned net
    M.train_mode(new)
    _steps(new, 2)
    q = prepare(new, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    M.train_mode(q)
    _steps(q, 2)
    M.eval_mode(q)
    out = q(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)))
    assert out.shape == (2, 10) and bool(jnp.isfinite(out).all())
