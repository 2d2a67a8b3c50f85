"""Whole-model training-trajectory parity vs the torch reference.

The strongest accuracy-parity evidence obtainable without real CIFAR-10
(SURVEY.md §4, §6): train the SAME small QAT model — identical init,
identical seed-fed batches, identical plain-SGD updates — through the
reference implementation (/root/reference, torch, live oracle) and ours,
and assert the loss / weight trajectories track step for step. Layer
parity (test_qat_layers.py) checks one forward; this checks that N full
optimizer steps of forward + STE backward + observer-state evolution
stay on the reference's training trajectory.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

sys.path.insert(0, "/root/reference")

from micronet_tpu.nn import modules as M
from micronet_tpu.nn import qat_iao
from micronet_tpu.quant.config import QuantConfig

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from micronet.compression.quantization.wqaq.iao import quantize as ref_iao  # noqa: E402

STEPS = 12
LR = 0.1
B, H, W = 8, 8, 8
SEED = 7


def _hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


def _fc_from_torch(w_out_in, c, h, w):
    """torch Linear weight (out, C*H*W) -> ours (H*W*C, out).

    torch flattens NCHW (C-major); our nets flatten NHWC (H-major), so the
    input-feature axis must be permuted CHW->HWC, not just transposed.
    """
    out = w_out_in.shape[0]
    return jnp.asarray(
        w_out_in.reshape(out, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out)
    )


def _make_data():
    rng = np.random.RandomState(SEED)
    # cycle two fixed batches so the nets can memorize within STEPS steps
    # (the trajectory must move for the parity assertion to mean anything);
    # labels are a fixed linear function of the input
    base = [rng.randn(B, 3, H, W).astype(np.float32) for _ in range(2)]
    proj = rng.randn(3 * H * W, 10).astype(np.float32)
    xs = [base[i % 2] for i in range(STEPS)]
    ys = np.stack([np.argmax(x.reshape(B, -1) @ proj, axis=1) for x in xs])
    return xs, ys


class _TorchNet(tnn.Module):
    def __init__(self, q_type):
        super().__init__()
        kw = dict(a_bits=8, w_bits=8, q_type=q_type, q_level=0, weight_observer=0)
        self.c1 = ref_iao.QuantConv2d(3, 8, 3, padding=1, bias=True, **kw)
        self.c2 = ref_iao.QuantConv2d(8, 8, 3, padding=1, bias=True, **kw)
        self.fc = ref_iao.QuantLinear(8 * H * W, 10, bias=True, **kw)

    def forward(self, x):
        x = tF.relu(self.c1(x))
        x = tF.relu(self.c2(x))
        return self.fc(x.flatten(1))


class _OurNet(M.OrderedModule):
    def __init__(self, cfg, *, rngs):
        self.c1 = qat_iao.QuantConv2d(3, 8, 3, padding=1, bias=True, cfg=cfg, rngs=rngs)
        self.r1 = M.ReLU()
        self.c2 = qat_iao.QuantConv2d(8, 8, 3, padding=1, bias=True, cfg=cfg, rngs=rngs)
        self.r2 = M.ReLU()
        self.flat = M.Flatten()
        self.fc = qat_iao.QuantLinear(8 * H * W, 10, bias=True, cfg=cfg, rngs=rngs)

    def __call__(self, x):
        x = self.r1(self.c1(x))
        x = self.r2(self.c2(x))
        return self.fc(self.flat(x))


def _sync_init(tm, om):
    """Copy the torch module's init into ours (HWIO / (in,out) layouts)."""
    with torch.no_grad():
        om.c1.weight.value = _hwio(tm.c1.weight.numpy())
        om.c1.bias.value = jnp.asarray(tm.c1.bias.numpy())
        om.c2.weight.value = _hwio(tm.c2.weight.numpy())
        om.c2.bias.value = jnp.asarray(tm.c2.bias.numpy())
        om.fc.weight.value = _fc_from_torch(tm.fc.weight.numpy(), 8, H, W)
        om.fc.bias.value = jnp.asarray(tm.fc.bias.numpy())


@pytest.mark.parametrize("q_type", [0, 1])
def test_training_trajectory_parity(q_type):
    torch.manual_seed(0)
    tm = _TorchNet(q_type)
    tm.train()
    topt = torch.optim.SGD(tm.parameters(), lr=LR)

    om = _OurNet(QuantConfig(a_bits=8, w_bits=8, q_type=q_type), rngs=nnx.Rngs(0))
    _sync_init(tm, om)
    M.train_mode(om)
    oopt = nnx.Optimizer(om, optax.sgd(LR), wrt=nnx.Param)

    xs, ys = _make_data()

    @nnx.jit
    def ostep(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    t_losses, o_losses = [], []
    for i in range(STEPS):
        xt = torch.tensor(xs[i])
        yt = torch.tensor(ys[i], dtype=torch.long)
        topt.zero_grad()
        loss_t = tF.cross_entropy(tm(xt), yt)
        loss_t.backward()
        topt.step()
        t_losses.append(float(loss_t))

        xj = jnp.asarray(np.transpose(xs[i], (0, 2, 3, 1)))
        o_losses.append(float(ostep(om, oopt, xj, jnp.asarray(ys[i]))))

    # loss trajectories track step for step (both start from the same
    # init, so step 0 is forward-parity; later steps compound grads +
    # observer EMA state — tolerance covers f32 accumulation-order drift)
    np.testing.assert_allclose(o_losses, t_losses, rtol=2e-2, atol=2e-2)
    # the trajectory must actually have gone somewhere for this to mean
    # anything
    assert t_losses[-1] < t_losses[0] - 0.05

    # final weights stay in the same basin. Bit-exact weight parity is not
    # achievable: elements whose pre-round value lands near a rounding/clip
    # boundary get different STE grad masks from f32 accumulation-order
    # differences, and that flips compound ~lr*|grad| per step. Bounded
    # drift + matching loss curve + matching observer scales IS trajectory
    # parity.
    for ours, ref in [
        (om.c1.weight.value, _hwio(tm.c1.weight.detach().numpy())),
        (om.fc.weight.value, _fc_from_torch(tm.fc.weight.detach().numpy(), 8, H, W)),
    ]:
        diff = np.abs(np.asarray(ours) - np.asarray(ref))
        assert diff.max() < 0.03, f"weight drift {diff.max()} exceeds bound"
        assert np.median(diff) < 5e-3, f"median weight drift {np.median(diff)}"
    # observer state evolved identically (scales are the quant-critical
    # state that rides the trajectory)
    np.testing.assert_allclose(
        float(om.c1.activation_quantizer.scale.value.reshape(())),
        float(tm.c1.activation_quantizer.scale.detach().reshape(())),
        rtol=1e-4,
    )


def test_training_trajectory_parity_bn_fuse():
    """Same, with a BN-fused quant conv in the net (running-stat evolution
    compounds into the weight trajectory through the fold)."""
    torch.manual_seed(0)
    kw = dict(a_bits=8, w_bits=8, q_type=0, q_level=0, weight_observer=0)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = ref_iao.QuantBNFuseConv2d(
                3, 8, 3, padding=1, bias=False,
                pretrained_model=False, bn_fuse_calib=False, **kw,
            )
            self.fc = ref_iao.QuantLinear(8 * H * W, 10, bias=True, **kw)

        def forward(self, x):
            return self.fc(tF.relu(self.c1(x)).flatten(1))

    class ONet(M.OrderedModule):
        def __init__(self, cfg, *, rngs):
            self.c1 = qat_iao.QuantBNFuseConv2d(
                3, 8, 3, padding=1, bias=False, cfg=cfg, rngs=rngs
            )
            self.r1 = M.ReLU()
            self.flat = M.Flatten()
            self.fc = qat_iao.QuantLinear(8 * H * W, 10, bias=True, cfg=cfg, rngs=rngs)

        def __call__(self, x):
            return self.fc(self.flat(self.r1(self.c1(x))))

    tm = TNet()
    tm.train()
    topt = torch.optim.SGD(tm.parameters(), lr=LR)

    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, bn_fuse_calib=False)
    om = ONet(cfg, rngs=nnx.Rngs(0))
    with torch.no_grad():
        om.c1.weight.value = _hwio(tm.c1.weight.numpy())
        om.c1.gamma.value = jnp.asarray(tm.c1.gamma.numpy())
        om.c1.beta.value = jnp.asarray(tm.c1.beta.numpy())
        om.fc.weight.value = _fc_from_torch(tm.fc.weight.numpy(), 8, H, W)
        om.fc.bias.value = jnp.asarray(tm.fc.bias.numpy())
    M.train_mode(om)
    oopt = nnx.Optimizer(om, optax.sgd(LR), wrt=nnx.Param)

    xs, ys = _make_data()

    @nnx.jit
    def ostep(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    t_losses, o_losses = [], []
    for i in range(STEPS):
        xt = torch.tensor(xs[i])
        yt = torch.tensor(ys[i], dtype=torch.long)
        topt.zero_grad()
        loss_t = tF.cross_entropy(tm(xt), yt)
        loss_t.backward()
        topt.step()
        t_losses.append(float(loss_t))
        xj = jnp.asarray(np.transpose(xs[i], (0, 2, 3, 1)))
        o_losses.append(float(ostep(om, oopt, xj, jnp.asarray(ys[i]))))

    np.testing.assert_allclose(o_losses, t_losses, rtol=2e-2, atol=2e-2)
    assert t_losses[-1] < t_losses[0] - 0.05
    # running BN stats rode the same trajectory
    np.testing.assert_allclose(
        np.asarray(om.c1.running_mean.value),
        tm.c1.running_mean.detach().numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(om.c1.running_var.value),
        tm.c1.running_var.detach().numpy(),
        atol=5e-4,
    )
