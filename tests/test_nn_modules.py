"""Base NN ops/modules: torch-parity checks for conv/pool/BN semantics and
model-zoo forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from micronet_tpu.nn import functional as F
from micronet_tpu.nn import modules as M
from micronet_tpu.models import LeNet, nin, nin_gc, resnet18


def _torch():
    return pytest.importorskip("torch")


def test_conv2d_matches_torch_grouped():
    torch = _torch()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 6).astype(np.float32)  # NHWC
    w = rng.randn(3, 3, 3, 4).astype(np.float32)  # HWIO, groups=2: in/g=3, out=4
    b = rng.randn(4).astype(np.float32)
    y = np.asarray(
        F.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1, groups=2)
    )
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    wt = torch.tensor(w).permute(3, 2, 0, 1)  # OIHW
    yt = torch.nn.functional.conv2d(xt, wt, torch.tensor(b), stride=2, padding=1, groups=2)
    np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_conv_transpose2d_matches_torch():
    torch = _torch()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 5, 3).astype(np.float32)
    # ours: (kh, kw, in, out//groups); torch: (in, out//groups, kh, kw)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    y = np.asarray(
        F.conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w), stride=2, padding=1, output_padding=1
        )
    )
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    wt = torch.tensor(w).permute(2, 3, 0, 1)
    yt = torch.nn.functional.conv_transpose2d(xt, wt, stride=2, padding=1, output_padding=1)
    np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_pools_match_torch():
    torch = _torch()
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    y = np.asarray(F.max_pool2d(jnp.asarray(x), 3, 2, 1))
    yt = torch.nn.functional.max_pool2d(xt, 3, 2, 1)
    np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(), atol=1e-6)
    y = np.asarray(F.avg_pool2d(jnp.asarray(x), 3, 2, 1))
    yt = torch.nn.functional.avg_pool2d(xt, 3, 2, 1)
    np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(), atol=1e-6)
    y = np.asarray(F.adaptive_avg_pool2d(jnp.asarray(x), (3, 3)))
    yt = torch.nn.functional.adaptive_avg_pool2d(xt, (3, 3))
    np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_channel_shuffle_matches_torch_reference():
    # reference nin_gc.py:4-15
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 6).astype(np.float32)
    y = np.asarray(F.channel_shuffle(jnp.asarray(x), 3))
    xn = x.transpose(0, 3, 1, 2)  # NCHW
    b, c, h, w = xn.shape
    ref = xn.reshape(b, 3, c // 3, h, w).transpose(0, 2, 1, 3, 4).reshape(b, c, h, w)
    np.testing.assert_allclose(y, ref.transpose(0, 2, 3, 1), atol=1e-6)


def test_batchnorm_train_eval_matches_torch():
    torch = _torch()
    rng = np.random.RandomState(4)
    x = rng.randn(4, 5, 5, 3).astype(np.float32)
    bn = M.BatchNorm2d(3)
    bnt = torch.nn.BatchNorm2d(3)
    y = np.asarray(bn(jnp.asarray(x)))
    yt = bnt(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(y, yt.detach().permute(0, 2, 3, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bn.running_mean[...]), bnt.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bn.running_var[...]), bnt.running_var.numpy(), atol=1e-5
    )
    # eval mode
    M.eval_mode(bn)
    bnt.eval()
    x2 = rng.randn(4, 5, 5, 3).astype(np.float32)
    y = np.asarray(bn(jnp.asarray(x2)))
    yt = bnt(torch.tensor(x2).permute(0, 3, 1, 2))
    np.testing.assert_allclose(y, yt.detach().permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize(
    "build,params",
    [
        # exact counts for the reference architectures (conv w/b + BN gamma/beta);
        # nin_gc matches README.md:1068's 0.58M
        (lambda r: nin.Net(rngs=r), 969822),
        (lambda r: nin_gc.Net(rngs=r), 591390),
    ],
)
def test_nin_shapes_and_param_counts(build, params):
    model = build(nnx.Rngs(0))
    x = jnp.zeros((2, 32, 32, 3))
    y = model(x)
    assert y.shape == (2, 10)
    n = sum(
        int(np.prod(v.shape)) for v in jax.tree.leaves(nnx.state(model, nnx.Param))
    )
    assert n == params, n


@pytest.mark.slow
def test_resnet18_and_lenet_forward():
    model = resnet18(rngs=nnx.Rngs(0))
    # eval-mode first: BN must not mutate running stats inside a raw jax
    # trace; eval_shape then traces without the (slow on 1-CPU) compile
    M.eval_mode(model)
    y = jax.eval_shape(model, jnp.zeros((2, 32, 32, 3)))
    assert y.shape == (2, 10)
    y = LeNet(rngs=nnx.Rngs(0))(jnp.zeros((2, 32, 32, 3)))
    assert y.shape == (2, 10)
