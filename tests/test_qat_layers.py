"""Torch-parity tests for the QAT layers: our nnx quant layers vs the
reference implementations imported from /root/reference (read-only oracle).

Covers the reference's de-facto correctness contract (SURVEY.md §4): same
weights + same input => same fake-quant output, across IAO (plain conv,
BN-fused conv both calib modes, linear, add), DoReFa, and wbwtab.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

sys.path.insert(0, "/root/reference")

from micronet_tpu.nn import modules as M
from micronet_tpu.nn import qat_dorefa, qat_iao, qat_wbwtab, transform
from micronet_tpu.quant.config import QuantConfig

torch = pytest.importorskip("torch")
from micronet.compression.quantization.wqaq.dorefa import quantize as ref_dorefa  # noqa: E402
from micronet.compression.quantization.wqaq.iao import quantize as ref_iao  # noqa: E402
from micronet.compression.quantization.wbwtab import quantize as ref_wbwtab  # noqa: E402


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _hwio(w_oihw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


def _from_nchw(y_torch) -> np.ndarray:
    return y_torch.detach().permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize(
    "q_type,q_level,weight_observer",
    [(0, 0, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1), (1, 1, 1)],
)
def test_quant_conv2d_parity(q_type, q_level, weight_observer):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    w = rng.randn(5, 4, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)

    ref = ref_iao.QuantConv2d(
        4, 5, 3, padding=1, bias=True,
        a_bits=8, w_bits=8, q_type=q_type, q_level=q_level,
        weight_observer=weight_observer,
    )
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))
        ref.bias.copy_(torch.tensor(b))
    ref.train()

    cfg = QuantConfig(
        a_bits=8, w_bits=8, q_type=q_type, q_level=q_level,
        weight_observer=weight_observer,
    )
    ours = qat_iao.QuantConv2d(4, 5, 3, padding=1, bias=True, cfg=cfg, rngs=nnx.Rngs(0))
    ours.weight[...] = _hwio(w)
    ours.bias[...] = jnp.asarray(b)

    # two training steps so EMA/first-batch logic both exercise
    x2 = rng.randn(2, 4, 8, 8).astype(np.float32)
    for xi in (x, x2):
        y_ref = ref(torch.tensor(xi))
        y_ours = ours(_nhwc(xi))
    np.testing.assert_allclose(np.asarray(y_ours), _from_nchw(y_ref), atol=2e-4)

    # eval parity (frozen stats)
    ref.eval()
    M.eval_mode(ours)
    xe = rng.randn(2, 4, 8, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours(_nhwc(xe))), _from_nchw(ref(torch.tensor(xe))), atol=2e-4
    )


@pytest.mark.parametrize("bn_fuse_calib", [False, True])
@pytest.mark.parametrize("pretrained_model", [False, True])
def test_quant_bn_fuse_conv2d_parity(bn_fuse_calib, pretrained_model):
    rng = np.random.RandomState(1)
    w = rng.randn(6, 3, 3, 3).astype(np.float32)
    gamma = rng.rand(6).astype(np.float32) + 0.5
    beta = rng.randn(6).astype(np.float32)
    r_mean = rng.randn(6).astype(np.float32)
    r_var = rng.rand(6).astype(np.float32) + 0.5

    ref = ref_iao.QuantBNFuseConv2d(
        3, 6, 3, padding=1, bias=False,
        a_bits=8, w_bits=8, q_type=0, q_level=0, weight_observer=0,
        pretrained_model=pretrained_model, bn_fuse_calib=bn_fuse_calib,
    )
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))
        ref.gamma.copy_(torch.tensor(gamma))
        ref.beta.copy_(torch.tensor(beta))
        ref.running_mean.copy_(torch.tensor(r_mean))
        ref.running_var.copy_(torch.tensor(r_var))
    ref.train()

    cfg = QuantConfig(
        a_bits=8, w_bits=8, bn_fuse=True, bn_fuse_calib=bn_fuse_calib,
        pretrained_model=pretrained_model,
    )
    ours = qat_iao.QuantBNFuseConv2d(
        3, 6, 3, padding=1, bias=False, cfg=cfg, rngs=nnx.Rngs(0)
    )
    ours.weight[...] = _hwio(w)
    ours.gamma[...] = jnp.asarray(gamma)
    ours.beta[...] = jnp.asarray(beta)
    ours.running_mean[...] = jnp.asarray(r_mean)
    ours.running_var[...] = jnp.asarray(r_var)

    for step in range(3):
        xi = rng.randn(4, 3, 8, 8).astype(np.float32)
        y_ref = ref(torch.tensor(xi))
        y_ours = ours(_nhwc(xi))
        np.testing.assert_allclose(
            np.asarray(y_ours), _from_nchw(y_ref), atol=5e-4,
            err_msg=f"train step {step}",
        )
    # running stats trajectories must match (first-batch seeding + EMA)
    np.testing.assert_allclose(
        np.asarray(ours.running_mean[...]),
        ref.running_mean.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.running_var[...]),
        ref.running_var.numpy(), atol=1e-5,
    )

    ref.eval()
    M.eval_mode(ours)
    xe = rng.randn(4, 3, 8, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours(_nhwc(xe))), _from_nchw(ref(torch.tensor(xe))), atol=5e-4
    )


def test_quant_linear_parity():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 7).astype(np.float32)
    w = rng.randn(3, 7).astype(np.float32)  # torch (out, in)
    b = rng.randn(3).astype(np.float32)

    ref = ref_iao.QuantLinear(7, 3, bias=True, a_bits=8, w_bits=8, q_type=0, q_level=0)
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))
        ref.bias.copy_(torch.tensor(b))
    ref.train()

    ours = qat_iao.QuantLinear(7, 3, bias=True, cfg=QuantConfig(), rngs=nnx.Rngs(0))
    ours.weight[...] = jnp.asarray(w.T)  # ours (in, out)
    ours.bias[...] = jnp.asarray(b)

    y_ref = ref(torch.tensor(x))
    y_ours = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.detach().numpy(), atol=2e-4)


def test_quant_add_parity():
    rng = np.random.RandomState(3)
    ref = ref_iao.QuantAdd(a_bits=8, q_type=0)
    ref.train()
    ours = qat_iao.QuantAdd(cfg=QuantConfig())
    for _ in range(2):
        a = rng.randn(2, 4, 4, 3).astype(np.float32)
        c = rng.randn(2, 4, 4, 3).astype(np.float32)
        y_ref = ref(torch.tensor(a).permute(0, 3, 1, 2), torch.tensor(c).permute(0, 3, 1, 2))
        y_ours = ours(jnp.asarray(a), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(y_ours), _from_nchw(y_ref), atol=2e-4)


def test_dorefa_conv_parity():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    w = rng.randn(5, 4, 3, 3).astype(np.float32)

    ref = ref_dorefa.QuantConv2d(4, 5, 3, padding=1, bias=False, a_bits=4, w_bits=4)
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))

    cfg = QuantConfig(a_bits=4, w_bits=4)
    ours = qat_dorefa.QuantConv2d(4, 5, 3, padding=1, bias=False, cfg=cfg, rngs=nnx.Rngs(0))
    ours.weight[...] = _hwio(w)

    y_ref = ref(torch.tensor(x))
    y_ours = ours(_nhwc(x))
    np.testing.assert_allclose(np.asarray(y_ours), _from_nchw(y_ref), atol=2e-4)


@pytest.mark.parametrize("W", [2, 3])
def test_wbwtab_conv_parity(W):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    w = rng.randn(5, 4, 3, 3).astype(np.float32)

    ref = ref_wbwtab.QuantConv2d(4, 5, 3, padding=1, bias=False, W=W)
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))

    cfg = QuantConfig(W=W)
    ours = qat_wbwtab.QuantConv2d(4, 5, 3, padding=1, bias=False, cfg=cfg, rngs=nnx.Rngs(0))
    ours.weight[...] = _hwio(w)

    y_ref = ref(torch.tensor(x))
    y_ours = ours(_nhwc(x))
    np.testing.assert_allclose(np.asarray(y_ours), _from_nchw(y_ref), atol=2e-4)


def test_wbwtab_activation_parity():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 3, 4, 4).astype(np.float32)
    for A in (2, 32):
        ref = ref_wbwtab.ActivationQuantizer(A=A)
        ours = qat_wbwtab.ActivationQuantizer(A=A)
        y_ref = ref(torch.tensor(x))
        y_ours = ours(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_ours), y_ref.detach().numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# transform structure (no torch needed, but cheap here)
# ---------------------------------------------------------------------------


def test_prepare_structure_rules():
    from micronet_tpu.models import nin

    m = nin.Net(rngs=nnx.Rngs(0))  # 9 convs

    qd = transform.prepare(m, method="dorefa")
    n = sum(1 for _, c in nnx.iter_modules(qd) if isinstance(c, qat_dorefa.QuantConv2d))
    assert n == 8  # first conv skipped (dorefa/quantize.py:205-206)

    qw = transform.prepare(m, method="wbwtab")
    n = sum(1 for _, c in nnx.iter_modules(qw) if isinstance(c, qat_wbwtab.QuantConv2d))
    assert n == 7  # first and last skipped (wbwtab/quantize.py:251)
    n = sum(
        1 for _, c in nnx.iter_modules(qw) if isinstance(c, qat_wbwtab.ActivationQuantizer)
    )
    assert n == 8  # relus strictly between first and last conv

    qi = transform.prepare(m, QuantConfig(bn_fuse=True), method="iao")
    n = sum(1 for _, c in nnx.iter_modules(qi) if isinstance(c, qat_iao.QuantBNFuseConv2d))
    assert n == 9  # every Conv+BN pair fused
    n = sum(1 for _, c in nnx.iter_modules(qi) if type(c) is M.BatchNorm2d)
    assert n == 0  # all BNs replaced by Identity

    # original model untouched (prepare copies)
    n = sum(1 for _, c in nnx.iter_modules(m) if type(c) is M.Conv2d)
    assert n == 9
