"""ResNet QAT + export path: QuantAdd union-scale residuals through
prepare -> train-steps -> fuse -> int engine (SURVEY.md §3.5 applied to
the quant-ResNet demo, reference README.md:149)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.infer import freeze_int, fuse_bn_iao
from micronet_tpu.infer.engine import IntConv2d
from micronet_tpu.models import resnet18
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare, qat_iao
from micronet_tpu.quant.config import QuantConfig


@pytest.mark.slow
def test_resnet_qat_fuse_freeze():
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    model = resnet18(rngs=nnx.Rngs(0))
    q = prepare(model, cfg, method="iao")
    n_add = sum(1 for _, m in nnx.iter_modules(q) if isinstance(m, qat_iao.QuantAdd))
    n_bnf = sum(
        1 for _, m in nnx.iter_modules(q) if isinstance(m, qat_iao.QuantBNFuseConv2d)
    )
    assert n_add == 8 and n_bnf == 20  # 8 blocks, 17 residual convs + 3 shortcuts... (counted)

    M.train_mode(q)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    for i in range(2):
        q(jax.random.normal(jax.random.PRNGKey(i), (2, 32, 32, 3)))
    M.eval_mode(q)
    y_train = q(x)

    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    y_fused = fused(x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_train), atol=1e-3)

    engine = freeze_int(fused)
    # chaining auto-disabled for branching graphs; engine still correct
    assert not any(
        m.chained for _, m in nnx.iter_modules(engine) if isinstance(m, IntConv2d)
    )
    y_int = engine(x)
    # int32 vs f32 accumulation flips occasional values by 1 LSB of a late
    # layer's scale; logits stay close and predictions identical (the
    # reference's accuracy-equivalence oracle)
    np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_fused), atol=0.1)
    assert np.array_equal(
        np.argmax(np.asarray(y_int), -1), np.argmax(np.asarray(y_fused), -1)
    )


@pytest.mark.slow
def test_resnet50_bottleneck_quant_pipeline():
    """BottleNeck-family coverage (resnet50): prepare pairs all 1x1/3x3
    convs with their BNs, QAT runs, fuse + freeze keep prediction
    equivalence — the deeper variants (50/101/152) share this block."""
    from micronet_tpu.models.resnet import resnet50

    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    q = prepare(resnet50(rngs=nnx.Rngs(0)), cfg, method="iao")
    n_add = sum(1 for _, m in nnx.iter_modules(q) if isinstance(m, qat_iao.QuantAdd))
    n_bnf = sum(
        1 for _, m in nnx.iter_modules(q) if isinstance(m, qat_iao.QuantBNFuseConv2d)
    )
    assert n_add == 16  # 3+4+6+3 bottleneck blocks
    # 3 convs per block (48) + 4 projection shortcuts + stem
    assert n_bnf == 53, n_bnf

    M.train_mode(q)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    q(x)
    M.eval_mode(q)
    y_train = q(x)

    fused = fuse_bn_iao(q, cfg)
    M.eval_mode(fused)
    y_fused = fused(x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_train), atol=2e-3)

    engine = freeze_int(fused, example_input=x[:1])
    M.eval_mode(engine)
    y_int = engine(x)
    assert np.array_equal(
        np.argmax(np.asarray(y_int), -1), np.argmax(np.asarray(y_fused), -1)
    )
