"""Train subsystem: device-side augmentation stats, LR schedule golden
values, checkpoint round-trip, one tiny end-to-end fit."""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.models import nin
from micronet_tpu.nn import modules as M
from micronet_tpu.nn import prepare
from micronet_tpu.quant.config import QuantConfig
from micronet_tpu.train import (
    TrainConfig,
    Trainer,
    augment_batch,
    data,
    load_state,
    lr_at_epoch,
    normalize_batch,
    save_state,
)


def test_lr_schedule_golden():
    # x0.1 at [80,130,180,230,280] (iao/main.py:101-106)
    assert lr_at_epoch(0.1, 0) == 0.1
    assert lr_at_epoch(0.1, 79) == 0.1
    np.testing.assert_allclose(lr_at_epoch(0.1, 80), 0.01)
    np.testing.assert_allclose(lr_at_epoch(0.1, 130), 0.001)
    np.testing.assert_allclose(lr_at_epoch(0.1, 300), 0.1 * 0.1**5)


def test_augment_shapes_and_range():
    imgs = (np.random.RandomState(0).rand(16, 32, 32, 3) * 255).astype(np.uint8)
    out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs))
    assert out.shape == (16, 32, 32, 3)
    # normalize((0..1)-0.5)/0.5 -> [-1, 1]
    assert float(out.min()) >= -1.0 - 1e-6 and float(out.max()) <= 1.0 + 1e-6
    # flip/crop are random: two keys differ
    out2 = augment_batch(jax.random.PRNGKey(1), jnp.asarray(imgs))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # normalize_batch is deterministic
    n1 = normalize_batch(jnp.asarray(imgs))
    np.testing.assert_allclose(
        np.asarray(n1), (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5, atol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    M.train_mode(q)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    q(x)  # populate observer state
    M.eval_mode(q)
    y_before = q(x)

    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, q, step=3, best_acc=0.5, extra={"cfg": [8] * 8})

    q2 = prepare(
        nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(42)),
        QuantConfig(a_bits=8, w_bits=8, bn_fuse=True),
        method="iao",
    )
    step, best_acc, extra = load_state(path, q2)
    assert step == 3 and best_acc == 0.5 and extra["cfg"] == [8] * 8
    M.eval_mode(q2)
    y_after = q2(x)
    np.testing.assert_allclose(np.asarray(y_after), np.asarray(y_before), atol=1e-6)


def test_tiny_fit_synthetic():
    # deliberately tiny: CPU jit of the fused augment+train step dominates
    ds = data.load_cifar10(synthetic_size=128)
    model = nin.Net(cfg=[4] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, QuantConfig(a_bits=8, w_bits=8), method="dorefa")
    M.train_mode(q)
    tr = Trainer(q, TrainConfig(lr=3e-3, batch_size=32, epochs=1, log_every=1000), ds)
    loss0 = tr.train_epoch(0, log=lambda s: None)
    loss1 = tr.train_epoch(1, log=lambda s: None)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0  # synthetic set is learnable
    _, acc = tr.evaluate()
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_metrics_jsonl_sink(tmp_path):
    """TrainConfig.metrics_path appends machine-readable epoch/eval rows
    alongside the reference-style stdout lines (SURVEY.md §5 observability,
    done better)."""
    import json

    ds = data.load_cifar10(synthetic_size=64)
    model = nin.Net(cfg=[4] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, QuantConfig(a_bits=8, w_bits=8), method="dorefa")
    M.train_mode(q)
    mpath = str(tmp_path / "metrics.jsonl")
    tr = Trainer(
        q,
        TrainConfig(batch_size=32, epochs=1, log_every=1000, metrics_path=mpath),
        ds,
    )
    tr.fit(epochs=1, log=lambda s: None)
    rows = [json.loads(l) for l in open(mpath)]
    events = [r["event"] for r in rows]
    assert "epoch" in events and "eval" in events
    ep = next(r for r in rows if r["event"] == "epoch")
    assert {"epoch", "loss", "lr", "img_per_s", "seconds"} <= set(ep)
    ev = next(r for r in rows if r["event"] == "eval")
    assert 0.0 <= ev["acc"] <= 1.0


def test_async_checkpoint_and_auto_resume(tmp_path):
    """async_checkpoint: best-acc saves happen off-thread, the artifact is
    complete after fit() (wait_for_saves joins), and a second run resumes
    from it — the preemption-safe restart flow."""
    from micronet_tpu.train import checkpoint as ckpt_mod

    ds = data.load_cifar10(synthetic_size=64)
    q = prepare(
        nin.Net(cfg=[4] * 8, rngs=nnx.Rngs(0)),
        QuantConfig(a_bits=8, w_bits=8),
        method="dorefa",
    )
    M.train_mode(q)
    path = str(tmp_path / "async.npz")
    tr = Trainer(
        q,
        TrainConfig(batch_size=32, epochs=1, log_every=1000, async_checkpoint=True),
        ds,
    )
    best = tr.fit(epochs=1, checkpoint_path=path, log=lambda s: None)
    assert not ckpt_mod._PENDING_SAVES  # fit joined the writers
    assert np.isfinite(best)
    # resume contract: header round-trips
    q2 = prepare(
        nin.Net(cfg=[4] * 8, rngs=nnx.Rngs(0)),
        QuantConfig(a_bits=8, w_bits=8),
        method="dorefa",
    )
    tr2 = Trainer(q2, TrainConfig(batch_size=32, epochs=1), ds)
    step, best2, _ = load_state(path, q2, optimizer=tr2.optimizer)
    assert step == 0 and abs(best2 - best) < 1e-9


@pytest.mark.slow
def test_grad_accum_matches_full_batch_gradients():
    """grad_accum=4: the averaged microbatch gradient step tracks the
    full-batch step (identical loss gradient; observer updates differ only
    by per-microbatch granularity), and training still learns."""
    ds = data.load_cifar10(synthetic_size=64)

    def run(accum):
        q = prepare(
            nin.Net(cfg=[4] * 8, rngs=nnx.Rngs(0)),
            QuantConfig(a_bits=8, w_bits=8),
            method="dorefa",  # stateless quantizers: grads match exactly
        )
        M.train_mode(q)
        tr = Trainer(
            q,
            TrainConfig(batch_size=32, epochs=1, log_every=1000, grad_accum=accum),
            ds,
        )
        loss = tr.train_epoch(0, log=lambda s: None)
        return loss, q

    l1, q1 = run(1)
    l4, q4 = run(4)
    assert np.isfinite(l1) and np.isfinite(l4)
    # DoReFa has no observer state: parameter trajectories match closely
    for a, b in zip(
        jax.tree.leaves(nnx.state(q1, nnx.Param)),
        jax.tree.leaves(nnx.state(q4, nnx.Param)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_fit_restore_best(tmp_path):
    """restore_best hands back the state the returned best_acc describes:
    after fit, an immediate evaluate() reproduces best_acc even when the
    final epoch had drifted below it."""
    import numpy as np

    from micronet_tpu.models import lenet
    from micronet_tpu.train import TrainConfig, Trainer
    from micronet_tpu.train.data import load_cifar10

    data = load_cifar10(synthetic_size=128)
    model = lenet.LeNet(rngs=nnx.Rngs(0))
    M.train_mode(model)
    cfg = TrainConfig(lr=5e-2, batch_size=32, epochs=4, seed=0, log_every=10_000)
    tr = Trainer(model, cfg, dataset=data)
    best = tr.fit(log=lambda s: None, restore_best=True)
    _, acc_now = tr.evaluate()
    np.testing.assert_allclose(acc_now, best, atol=1e-6)


def test_scaled_milestones():
    from micronet_tpu.train import scaled_milestones

    # budgets >= the reference keep the reference schedule verbatim
    assert scaled_milestones(300) == (80, 130, 180, 230, 280)
    assert scaled_milestones(400) == (80, 130, 180, 230, 280)
    # short budgets: two decays at 60%/85% (most of training at base LR)
    assert scaled_milestones(20) == (12, 17)
    assert scaled_milestones(40) == (24, 34)
    # degenerate budgets stay valid (sorted, >= 1)
    ms = scaled_milestones(2)
    assert ms == tuple(sorted(ms)) and ms[0] >= 1
