"""Additional torch-parity oracles: ConvTranspose2d, activation/pool quant
wrappers, PTQ histogram trajectories, QAFT freezing."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

sys.path.insert(0, "/root/reference")

from micronet_tpu.nn import modules as M
from micronet_tpu.nn import qat_iao
from micronet_tpu.quant.config import QuantConfig

torch = pytest.importorskip("torch")
from micronet.compression.quantization.wqaq.iao import quantize as ref_iao  # noqa: E402


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _from_nchw(y):
    return y.detach().permute(0, 2, 3, 1).numpy()


def _hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


def test_quant_conv_transpose2d_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    w = rng.randn(4, 5, 3, 3).astype(np.float32)  # torch convT: (in, out, kh, kw)

    ref = ref_iao.QuantConvTranspose2d(
        4, 5, 3, stride=2, padding=1, output_padding=1, bias=False,
        a_bits=8, w_bits=8, q_type=0,
    )
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))
    ref.train()

    ours = qat_iao.QuantConvTranspose2d(
        4, 5, 3, stride=2, padding=1, output_padding=1, bias=False,
        cfg=QuantConfig(a_bits=8, w_bits=8), rngs=nnx.Rngs(0),
    )
    # ours HWIO-ish transpose kernel: (kh, kw, in, out//groups)
    ours.weight[...] = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))

    for xi in (x, rng.randn(2, 4, 8, 8).astype(np.float32)):
        y_ref = ref(torch.tensor(xi))
        y_ours = ours(_nhwc(xi))
    np.testing.assert_allclose(np.asarray(y_ours), _from_nchw(y_ref), atol=3e-4)


@pytest.mark.parametrize(
    "ref_cls,our_cls,kwargs",
    [
        (ref_iao.QuantMaxPool2d, qat_iao.QuantMaxPool2d, dict(kernel_size=2, stride=2)),
        (ref_iao.QuantAvgPool2d, qat_iao.QuantAvgPool2d, dict(kernel_size=2, stride=2)),
    ],
)
def test_quant_pool_parity(ref_cls, our_cls, kwargs):
    rng = np.random.RandomState(1)
    ref = ref_cls(a_bits=8, q_type=0, **kwargs)
    ref.train()
    ours = our_cls(cfg=QuantConfig(a_bits=8), **kwargs)
    for i in range(2):
        xi = rng.randn(2, 3, 8, 8).astype(np.float32)
        y_ref = ref(torch.tensor(xi))
        y_ours = ours(_nhwc(xi))
    np.testing.assert_allclose(np.asarray(y_ours), _from_nchw(y_ref), atol=2e-4)


def test_quant_leaky_relu_sigmoid_parity():
    rng = np.random.RandomState(2)
    ref_l = ref_iao.QuantLeakyReLU(negative_slope=0.1, a_bits=8, q_type=0)
    ref_l.train()
    our_l = qat_iao.QuantLeakyReLU(0.1, cfg=QuantConfig(a_bits=8))
    ref_s = ref_iao.QuantSigmoid(a_bits=8, q_type=0)
    ref_s.train()
    our_s = qat_iao.QuantSigmoid(QuantConfig(a_bits=8))
    for i in range(2):
        xi = rng.randn(2, 3, 4, 4).astype(np.float32)
        yl_ref = ref_l(torch.tensor(xi))
        yl_ours = our_l(_nhwc(xi))
        ys_ref = ref_s(torch.tensor(xi))
        ys_ours = our_s(_nhwc(xi))
    np.testing.assert_allclose(np.asarray(yl_ours), _from_nchw(yl_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ys_ours), _from_nchw(ys_ref), atol=2e-4)


def test_histogram_observer_trajectory_parity():
    """PTQ calibration: our percentile-EMA must track the reference
    HistogramObserver batch by batch."""
    rng = np.random.RandomState(3)
    ref_obs = ref_iao.HistogramObserver(q_level="L", percentile=0.99)
    from micronet_tpu.quant.observers import HistogramState, histogram_update

    state = HistogramState(
        jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((), jnp.bool_)
    )
    for i in range(4):
        xi = rng.randn(2, 3, 6, 6).astype(np.float32) * (1 + i)
        ref_obs(torch.tensor(xi))
        state = histogram_update(state, jnp.asarray(xi), percentile=0.99)
        np.testing.assert_allclose(
            float(state.max_val[0]), float(ref_obs.max_val), rtol=1e-5,
            err_msg=f"batch {i}",
        )


def test_qaft_freezes_everything():
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, qaft=True)
    conv = qat_iao.QuantBNFuseConv2d(3, 4, 3, padding=1, cfg=cfg, rngs=nnx.Rngs(0))
    conv.running_mean[...] = jnp.asarray(np.random.RandomState(0).randn(4).astype(np.float32))
    before = {
        "scale": np.asarray(conv.weight_quantizer.scale[...]).copy(),
        "rm": np.asarray(conv.running_mean[...]).copy(),
    }
    conv.training = True
    conv.activation_quantizer.training = True
    conv.weight_quantizer.training = True
    for i in range(3):
        conv(jax.random.normal(jax.random.PRNGKey(i), (2, 8, 8, 3)))
    np.testing.assert_array_equal(
        np.asarray(conv.weight_quantizer.scale[...]), before["scale"]
    )
    np.testing.assert_array_equal(np.asarray(conv.running_mean[...]), before["rm"])


def test_quant_concat_union_scale():
    """QuantConcat (the op the reference left commented out): both inputs
    share one scale; output halves are consistent on the shared grid."""
    from micronet_tpu.nn import prepare, transform
    from micronet_tpu.nn.qat_iao import QuantConcat

    class Net(M.OrderedModule):
        def __init__(self, *, rngs):
            self.conv = M.Conv2d(3, 4, 1, rngs=rngs)
            self.cat = M.Concat()

        def __call__(self, x):
            y = self.conv(x)
            return self.cat(y, x)

    m = Net(rngs=nnx.Rngs(0))
    q = prepare(m, QuantConfig(a_bits=8, w_bits=8), method="iao")
    assert any(isinstance(c, QuantConcat) for _, c in nnx.iter_modules(q))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    out = q(x)
    assert out.shape == (2, 4, 4, 7)
    # union scale: the second half (x fake-quantized) uses the SAME scale
    # as the first half; values land on one shared grid
    cat = next(c for _, c in nnx.iter_modules(q) if isinstance(c, QuantConcat))
    s = float(cat.activation_quantizer.scale[...][0])
    grid = np.asarray(out) / s
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-3)


@pytest.mark.slow
def test_quant_conv2d_parity_randomized_sweep():
    """Property-style sweep: random (bits, q_type, q_level, observer,
    shape, seed) configs, 3 train steps + eval vs the torch reference —
    broadens the fixed parametrized parity cases with randomized corners
    (deterministic seed)."""
    rng = np.random.RandomState(2024)
    for trial in range(8):
        a_bits, w_bits = int(rng.choice([4, 6, 8, 16])), int(rng.choice([4, 8]))
        q_type = int(rng.randint(2))
        q_level = int(rng.randint(2))
        weight_observer = int(rng.randint(2))
        cin, cout, k = int(rng.choice([3, 4])), int(rng.choice([5, 6])), 3
        scale_in = float(rng.choice([0.5, 1.0, 4.0]))

        x = (rng.randn(2, cin, 7, 7) * scale_in).astype(np.float32)
        w = rng.randn(cout, cin, k, k).astype(np.float32)
        b = rng.randn(cout).astype(np.float32)

        ref = ref_iao.QuantConv2d(
            cin, cout, k, padding=1, bias=True,
            a_bits=a_bits, w_bits=w_bits, q_type=q_type, q_level=q_level,
            weight_observer=weight_observer,
        )
        with torch.no_grad():
            ref.weight.copy_(torch.tensor(w))
            ref.bias.copy_(torch.tensor(b))
        ref.train()

        cfg = QuantConfig(
            a_bits=a_bits, w_bits=w_bits, q_type=q_type, q_level=q_level,
            weight_observer=weight_observer,
        )
        ours = qat_iao.QuantConv2d(
            cin, cout, k, padding=1, bias=True, cfg=cfg, rngs=nnx.Rngs(0)
        )
        ours.weight[...] = _hwio(w)
        ours.bias[...] = jnp.asarray(b)

        tol = 2e-4 * max(scale_in, 1.0)
        for step in range(3):
            xi = (rng.randn(2, cin, 7, 7) * scale_in).astype(np.float32) if step else x
            y_ref = ref(torch.tensor(xi))
            y_ours = ours(_nhwc(xi))
        np.testing.assert_allclose(
            np.asarray(y_ours), _from_nchw(y_ref), atol=tol,
            err_msg=f"trial {trial}: a{a_bits} w{w_bits} t{q_type} "
                    f"l{q_level} o{weight_observer} s{scale_in}",
        )
        ref.eval()
        M.eval_mode(ours)
        xe = (rng.randn(2, cin, 7, 7) * scale_in).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(ours(_nhwc(xe))), _from_nchw(ref(torch.tensor(xe))),
            atol=tol,
        )
