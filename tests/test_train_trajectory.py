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


def _jcopy(a):
    """jnp.asarray with a forced host copy.

    On the CPU backend ``jnp.asarray`` zero-copies a contiguous numpy
    buffer — and ``torch.Tensor.numpy()`` shares memory with the tensor —
    so without the copy, torch's in-place optimizer updates would silently
    mutate the "synced" jax weights mid-trajectory."""
    return jnp.asarray(np.array(a, copy=True))


def _hwio(w_oihw):
    return _jcopy(np.transpose(w_oihw, (2, 3, 1, 0)))


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
        om.c1.weight[...] = _hwio(tm.c1.weight.numpy())
        om.c1.bias[...] = _jcopy(tm.c1.bias.numpy())
        om.c2.weight[...] = _hwio(tm.c2.weight.numpy())
        om.c2.bias[...] = _jcopy(tm.c2.bias.numpy())
        om.fc.weight[...] = _fc_from_torch(tm.fc.weight.numpy(), 8, H, W)
        om.fc.bias[...] = _jcopy(tm.fc.bias.numpy())


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
        (om.c1.weight[...], _hwio(tm.c1.weight.detach().numpy())),
        (om.fc.weight[...], _fc_from_torch(tm.fc.weight.detach().numpy(), 8, H, W)),
    ]:
        diff = np.abs(np.asarray(ours) - np.asarray(ref))
        assert diff.max() < 0.03, f"weight drift {diff.max()} exceeds bound"
        assert np.median(diff) < 5e-3, f"median weight drift {np.median(diff)}"
    # observer state evolved identically (scales are the quant-critical
    # state that rides the trajectory)
    np.testing.assert_allclose(
        float(om.c1.activation_quantizer.scale[...].reshape(())),
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
        om.c1.weight[...] = _hwio(tm.c1.weight.numpy())
        om.c1.gamma[...] = _jcopy(tm.c1.gamma.numpy())
        om.c1.beta[...] = _jcopy(tm.c1.beta.numpy())
        om.fc.weight[...] = _fc_from_torch(tm.fc.weight.numpy(), 8, H, W)
        om.fc.bias[...] = _jcopy(tm.fc.bias.numpy())
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
        np.asarray(om.c1.running_mean[...]),
        tm.c1.running_mean.detach().numpy(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(om.c1.running_var[...]),
        tm.c1.running_var.detach().numpy(),
        atol=5e-4,
    )


# ---------------------------------------------------------------------------
# round 3: trajectory parity for every flavor the reference publishes
# accuracy for (VERDICT r2 item 4) — DoReFa W8A8 (README.md:1074), wbwtab
# binary/ternary weights + binary activations (README.md:1070-1073).
# ---------------------------------------------------------------------------

from micronet_tpu.nn import qat_dorefa, qat_wbwtab  # noqa: E402

from micronet.compression.quantization.wqaq.dorefa import (  # noqa: E402
    quantize as ref_dorefa,
)
from micronet.compression.quantization.wbwtab import (  # noqa: E402
    quantize as ref_wbwtab,
)

LONG_STEPS = 50


def _run_torch(tm, xs, ys, steps, post_step=None):
    topt = torch.optim.SGD(tm.parameters(), lr=LR)
    losses = []
    for i in range(steps):
        xt = torch.tensor(xs[i % len(xs)])
        yt = torch.tensor(ys[i], dtype=torch.long)
        topt.zero_grad()
        loss = tF.cross_entropy(tm(xt), yt)
        loss.backward()
        topt.step()
        losses.append(float(loss))
        if post_step is not None:
            post_step()
    return losses


def _run_ours(om, xs, ys, steps, pre_step=None):
    oopt = nnx.Optimizer(om, optax.sgd(LR), wrt=nnx.Param)

    @nnx.jit
    def ostep(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y
            ).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    losses = []
    for i in range(steps):
        if pre_step is not None:
            pre_step()
        xj = jnp.asarray(np.transpose(xs[i % len(xs)], (0, 2, 3, 1)))
        losses.append(float(ostep(om, oopt, xj, jnp.asarray(ys[i]))))
    return losses


def _make_data_n(steps):
    rng = np.random.RandomState(SEED)
    base = [rng.randn(B, 3, H, W).astype(np.float32) for _ in range(2)]
    proj = rng.randn(3 * H * W, 10).astype(np.float32)
    ys = np.stack(
        [np.argmax(base[i % 2].reshape(B, -1) @ proj, axis=1) for i in range(steps)]
    )
    return base, ys


def _assert_trajectory(o_losses, t_losses):
    """Loss curves track step for step. Quantized nets compound rounding-
    boundary flips (f32 accumulation-order differences flip isolated STE
    masks), so the tolerance widens with horizon; the curve still has to
    ride the reference's trajectory, not merely end low."""
    o, t = np.asarray(o_losses), np.asarray(t_losses)
    np.testing.assert_allclose(o[:12], t[:12], rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(o, t, rtol=0.1, atol=0.08)
    assert t[-1] < t[0] - 0.05, "reference trajectory went nowhere"


def test_training_trajectory_parity_dorefa():
    """DoReFa W8A8 whole-model trajectory over 50 steps (reference row
    README.md:1074; oracle dorefa/quantize.py). Stateless quantizers:
    closed-form tanh-normalized weights + x0.1-prescaled activations."""
    torch.manual_seed(0)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            kw = dict(a_bits=8, w_bits=8)
            self.c1 = ref_dorefa.QuantConv2d(3, 8, 3, padding=1, bias=True, **kw)
            self.c2 = ref_dorefa.QuantConv2d(8, 8, 3, padding=1, bias=True, **kw)
            self.fc = ref_dorefa.QuantLinear(8 * H * W, 10, bias=True, **kw)

        def forward(self, x):
            x = tF.relu(self.c1(x))
            x = tF.relu(self.c2(x))
            return self.fc(x.flatten(1))

    class ONet(M.OrderedModule):
        def __init__(self, cfg, *, rngs):
            self.c1 = qat_dorefa.QuantConv2d(
                3, 8, 3, padding=1, bias=True, cfg=cfg, rngs=rngs
            )
            self.r1 = M.ReLU()
            self.c2 = qat_dorefa.QuantConv2d(
                8, 8, 3, padding=1, bias=True, cfg=cfg, rngs=rngs
            )
            self.r2 = M.ReLU()
            self.flat = M.Flatten()
            self.fc = qat_dorefa.QuantLinear(
                8 * H * W, 10, bias=True, cfg=cfg, rngs=rngs
            )

        def __call__(self, x):
            x = self.r1(self.c1(x))
            x = self.r2(self.c2(x))
            return self.fc(self.flat(x))

    tm = TNet()
    tm.train()
    om = ONet(QuantConfig(a_bits=8, w_bits=8), rngs=nnx.Rngs(0))
    _sync_init(tm, om)
    M.train_mode(om)

    xs, ys = _make_data_n(LONG_STEPS)
    t_losses = _run_torch(tm, xs, ys, LONG_STEPS)
    o_losses = _run_ours(om, xs, ys, LONG_STEPS)
    _assert_trajectory(o_losses, t_losses)
    # final weights in the same basin
    diff = np.abs(
        np.asarray(om.c1.weight[...]) - _hwio(tm.c1.weight.detach().numpy())
    )
    assert diff.max() < 0.05, f"weight drift {diff.max()}"
    assert np.median(diff) < 1e-2


@pytest.mark.parametrize("w_cfg", [2, 3])
def test_training_trajectory_parity_wbwtab(w_cfg):
    """wbwtab whole-model trajectory over 50 steps: binary (W=2) / ternary
    (W=3) weights with binary activations (reference rows
    README.md:1070-1073; oracle wbwtab/quantize.py).

    The reference's W==2 path projects the master weights in place
    (meancenter+clamp on ``w.data`` at the START of each forward,
    wbwtab/quantize.py:98-102); ours keeps the master raw and projects
    differentiably, exposing :func:`qat_wbwtab.project_params` for the
    write-back. Calling it before each of our steps reproduces torch's
    mutate-then-update order exactly."""
    torch.manual_seed(0)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            # skip-first/last rule (wbwtab/quantize.py:338-343): first and
            # last layers stay float, middle conv is quantized, ReLUs in
            # the quantized range become binary activations
            self.c1 = tnn.Conv2d(3, 8, 3, padding=1, bias=True)
            self.a1 = ref_wbwtab.ActivationQuantizer(A=2)
            self.c2 = ref_wbwtab.QuantConv2d(8, 8, 3, padding=1, bias=True, W=w_cfg)
            self.a2 = ref_wbwtab.ActivationQuantizer(A=2)
            self.fc = tnn.Linear(8 * H * W, 10, bias=True)

        def forward(self, x):
            x = self.a1(self.c1(x))
            x = self.a2(self.c2(x))
            return self.fc(x.flatten(1))

    class ONet(M.OrderedModule):
        def __init__(self, cfg, *, rngs):
            self.c1 = M.Conv2d(3, 8, 3, padding=1, bias=True, rngs=rngs)
            self.a1 = qat_wbwtab.ActivationQuantizer(A=2)
            self.c2 = qat_wbwtab.QuantConv2d(
                8, 8, 3, padding=1, bias=True, cfg=cfg, rngs=rngs
            )
            self.a2 = qat_wbwtab.ActivationQuantizer(A=2)
            self.flat = M.Flatten()
            self.fc = M.Linear(8 * H * W, 10, bias=True, rngs=rngs)

        def __call__(self, x):
            x = self.a1(self.c1(x))
            x = self.a2(self.c2(x))
            return self.fc(self.flat(x))

    tm = TNet()
    tm.train()
    om = ONet(QuantConfig(W=w_cfg, A=2), rngs=nnx.Rngs(0))
    _sync_init(tm, om)
    M.train_mode(om)

    xs, ys = _make_data_n(LONG_STEPS)
    t_losses = _run_torch(tm, xs, ys, LONG_STEPS)
    pre = (lambda: qat_wbwtab.project_params(om)) if w_cfg == 2 else None
    o_losses = _run_ours(om, xs, ys, LONG_STEPS, pre_step=pre)
    _assert_trajectory(o_losses, t_losses)
    # the quantized conv's discrete structure agrees at the end: the
    # {-1,0,+1} code planes match almost everywhere (master drift can flip
    # elements near the ternary threshold), and the per-channel alpha
    # magnitudes track (alpha = mean|w| moves ~lr-sized with the masters,
    # so compare values, not exactness)
    tw = np.asarray(_hwio(tm.c2.weight_quantizer(tm.c2.weight).detach().numpy()))
    ow = np.asarray(
        __import__("micronet_tpu.quant.wbwtab", fromlist=["x"]).quantize_weight(
            om.c2.weight[...], w_cfg
        )[0]
    )
    code_mismatch = np.mean(np.sign(ow) != np.sign(tw))
    assert code_mismatch < 0.05, f"{code_mismatch:.3f} of codes diverged"
    agree = np.sign(ow) == np.sign(tw)
    np.testing.assert_allclose(ow[agree], tw[agree], atol=0.05)


@pytest.mark.slow
def test_training_trajectory_parity_prune_quant_handoff():
    """The cross-script pipeline of SURVEY §3.4 as one trajectory test:

    1. sparse-train the SAME nin (ours vs the reference's torch
       models/nin.py) with the L1 BN-gamma subgradient (updateBN,
       pruning/main.py:65-69) — loss parity;
    2. compute prune masks both ways — ours via compute_prune_masks,
       torch via the reference's global-quantile formula
       (normal_regular_prune.py:61-124) — cfg and masks must be EQUAL;
    3. materialize the pruned net, hand it to IAO QAT (the --prune_quant
       branch, iao/main.py:346-372), and track the quantized training
       trajectory vs torch for 10 more steps.
    """
    from micronet.models import nin as ref_nin

    from micronet_tpu.models import nin as our_nin
    from micronet_tpu.nn import prepare as _prepare
    from micronet_tpu.prune import (
        bn_l1_grad_update,
        compute_prune_masks,
        prune_model,
    )

    torch.manual_seed(0)
    cfg0 = [8] * 8
    tm = ref_nin.Net(cfg=list(cfg0))
    tm.train()
    om = our_nin.Net(cfg=list(cfg0), rngs=nnx.Rngs(0))

    conv_idx = [0, 1, 2, 4, 5, 6, 8, 9, 10]  # ConvBNReLU slots in Sequential

    def sync(tmod, omod):
        with torch.no_grad():
            for ti, blk in zip(conv_idx, range(9)):
                tb = tmod.model[ti]
                ob = omod.model.layers[ti]
                ob.conv.weight[...] = _hwio(tb.conv.weight.numpy())
                ob.conv.bias[...] = _jcopy(tb.conv.bias.numpy())
                ob.bn.weight[...] = _jcopy(tb.bn.weight.numpy())
                ob.bn.bias[...] = _jcopy(tb.bn.bias.numpy())

    # distinctive gammas so the global threshold has structure
    rng0 = np.random.RandomState(3)
    with torch.no_grad():
        for ti in conv_idx:
            bn = tm.model[ti].bn
            bn.weight.copy_(torch.tensor(
                0.05 + rng0.rand(bn.num_features).astype(np.float32)))
    sync(tm, om)
    M.train_mode(om)

    B_, S_ = 4, 32
    rng = np.random.RandomState(11)
    xs = [rng.randn(B_, 3, S_, S_).astype(np.float32) for _ in range(2)]
    proj = rng.randn(3 * S_ * S_, 10).astype(np.float32)
    ys = np.stack(
        [np.argmax(xs[i % 2].reshape(B_, -1) @ proj, axis=1) for i in range(20)]
    )

    # --- phase 1: sparse training (updateBN both sides), 8 steps ---
    s_l1 = 1e-2
    topt = torch.optim.SGD(tm.parameters(), lr=0.05)
    oopt = nnx.Optimizer(om, optax.sgd(0.05), wrt=nnx.Param)

    @nnx.jit
    def ostep(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y
            ).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        grads = bn_l1_grad_update(model, grads, s_l1)
        opt.update(model, grads)
        return loss

    t_losses, o_losses = [], []
    for i in range(8):
        xt = torch.tensor(xs[i % 2])
        yt = torch.tensor(ys[i], dtype=torch.long)
        topt.zero_grad()
        loss_t = tF.cross_entropy(tm(xt), yt)
        loss_t.backward()
        for mmod in tm.modules():  # updateBN (pruning/main.py:65-69)
            if isinstance(mmod, tnn.BatchNorm2d):
                mmod.weight.grad.data.add_(s_l1 * torch.sign(mmod.weight.data))
        topt.step()
        t_losses.append(float(loss_t))
        xj = jnp.asarray(np.transpose(xs[i % 2], (0, 2, 3, 1)))
        o_losses.append(float(ostep(om, oopt, xj, jnp.asarray(ys[i]))))
    np.testing.assert_allclose(o_losses, t_losses, rtol=2e-2, atol=2e-2)

    # --- phase 2: masks. Torch side = the reference's formula: global
    # quantile threshold over the first 8 BNs' |gamma|, per-layer mask
    # |gamma| > thr with a >=1-channel floor ---
    percent = 0.4
    gammas_t = torch.cat(
        [tm.model[ti].bn.weight.data.abs().clone() for ti in conv_idx[:8]]
    )
    thr = torch.sort(gammas_t)[0][int(gammas_t.shape[0] * percent)]
    masks_t = []
    for ti in conv_idx[:8]:
        g = tm.model[ti].bn.weight.data.abs()
        mask = (g > thr).float()
        if int(mask.sum()) == 0:  # >=1 floor (normal_regular_prune.py:101)
            mask[int(g.argmax())] = 1.0
        masks_t.append(np.asarray(mask.numpy(), bool))

    cfg_o, masks_o, _ = compute_prune_masks(om, percent, layers=9)
    assert cfg_o == [int(m.sum()) for m in masks_t], "pruned cfg diverged"
    for a, b in zip(masks_o, masks_t):
        np.testing.assert_array_equal(np.asarray(a, bool), b)

    # --- phase 3: materialize ours, sync torch's pruned net FROM ours
    # (slice mechanics are covered by test_prune_equivalence_nin), then
    # IAO-QAT both pruned nets and track the trajectory ---
    new_o = our_nin.Net(cfg=cfg_o, rngs=nnx.Rngs(1))
    new_o = prune_model(om, new_o, masks_o, layers=9)
    new_t = ref_nin.Net(cfg=list(cfg_o))
    with torch.no_grad():
        for ti in conv_idx:
            ob = new_o.model.layers[ti]
            tb = new_t.model[ti]
            tb.conv.weight.copy_(torch.tensor(
                np.transpose(np.asarray(ob.conv.weight[...]), (3, 2, 0, 1))))
            tb.conv.bias.copy_(torch.tensor(np.asarray(ob.conv.bias[...])))
            tb.bn.weight.copy_(torch.tensor(np.asarray(ob.bn.weight[...])))
            tb.bn.bias.copy_(torch.tensor(np.asarray(ob.bn.bias[...])))
            tb.bn.running_mean.copy_(
                torch.tensor(np.asarray(ob.bn.running_mean[...])))
            tb.bn.running_var.copy_(
                torch.tensor(np.asarray(ob.bn.running_var[...])))

    q_o = _prepare(new_o, QuantConfig(a_bits=8, w_bits=8), method="iao",
                   inplace=True)
    M.train_mode(q_o)
    q_t = ref_iao.prepare(new_t, inplace=True, a_bits=8, w_bits=8,
                          q_type=0, q_level=0, weight_observer=0)
    q_t.train()

    topt2 = torch.optim.SGD(q_t.parameters(), lr=0.05)
    oopt2 = nnx.Optimizer(q_o, optax.sgd(0.05), wrt=nnx.Param)

    @nnx.jit
    def qstep(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y
            ).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    tq, oq = [], []
    for i in range(8, 18):
        xt = torch.tensor(xs[i % 2])
        yt = torch.tensor(ys[i], dtype=torch.long)
        topt2.zero_grad()
        lt = tF.cross_entropy(q_t(xt), yt)
        lt.backward()
        topt2.step()
        tq.append(float(lt))
        xj = jnp.asarray(np.transpose(xs[i % 2], (0, 2, 3, 1)))
        oq.append(float(qstep(q_o, oopt2, xj, jnp.asarray(ys[i]))))
    np.testing.assert_allclose(oq, tq, rtol=3e-2, atol=3e-2)
    assert tq[-1] < t_losses[0], "pipeline trajectory went nowhere"
