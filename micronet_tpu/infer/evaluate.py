"""Paired train/inference equivalence evaluation — the reference's
de-facto correctness oracle (SURVEY.md §4.2): load one checkpoint into a
train-mode architecture and an inference architecture, and require equal
accuracy with the inference model faster (quant_model_test.py:24-116,
bn_fused_model_test.py:24-117)."""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..nn.modules import eval_mode
from ..train import data as data_lib

__all__ = ["evaluate_model", "paired_equivalence_eval"]


def evaluate_model(
    model: nnx.Module,
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int = 256,
) -> Tuple[float, float]:
    """Eval accuracy + throughput (img/s) over a test set.

    The model runs jitted via split/merge (pure eval graph); timing covers
    steady-state batches only (first batch pays compile).
    """
    eval_mode(model)
    gdef, state = nnx.split(model)

    @jax.jit
    def step(state, xb):
        m = nnx.merge(gdef, state)
        return jnp.argmax(m(data_lib.normalize_batch(xb)), -1)

    correct, n = 0, 0
    t0 = None
    for xb, yb in data_lib.epoch_batches(
        jax.random.PRNGKey(0), images, labels, batch_size,
        shuffle=False, drop_remainder=False,
    ):
        pred = step(state, jnp.asarray(xb))
        pred.block_until_ready()
        if t0 is None:  # exclude compile of the first batch
            t0 = time.time()
            n_timed = 0
        else:
            n_timed += len(yb)
        correct += int(jnp.sum(pred == jnp.asarray(yb)))
        n += len(yb)
    dt = max(time.time() - t0, 1e-9)
    fps = n_timed / dt if n_timed else float("nan")
    return correct / max(n, 1), fps


def paired_equivalence_eval(
    train_model: nnx.Module,
    inference_model: nnx.Module,
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int = 256,
    log: Callable[[str], None] = print,
) -> Tuple[float, float, float, float]:
    """Accuracy+FPS for both models; returns
    ``(train_acc, inference_acc, train_fps, inference_fps)``.

    The reference prints both and eyeballs equality
    (quant_model_test.py:193-202 prints accuracy AND FPS for each model);
    callers/tests should assert ``abs(acc_t - acc_i)`` small.
    """
    acc_t, fps_t = evaluate_model(train_model, images, labels, batch_size)
    acc_i, fps_i = evaluate_model(inference_model, images, labels, batch_size)
    log(f"train-model:     acc {acc_t * 100:.2f}%  {fps_t:.1f} img/s")
    log(f"inference-model: acc {acc_i * 100:.2f}%  {fps_i:.1f} img/s")
    return acc_t, acc_i, fps_t, fps_i
