"""Honest on-device throughput measurement.

Three environment hazards make naive `time.time()` loops lie here
(SURVEY.md §5 requires first-class measurement):

1. dispatch/RPC launch overhead (this build's TPU sits behind a tunnel
   with ~50ms+ per-execution round trip);
2. execution-result caching: repeated launches of the same executable on
   identical inputs can be served from a cache in ~0 time;
3. loop-invariant hoisting: iterating a model on inputs that XLA can
   prove equivalent collapses the loop to one execution.

The harness defeats all three: a single jitted ``lax.scan`` chains each
step's scalar output back into the next step's input (a true data
dependency — nothing can be hoisted, elided, or cached across steps), a
fresh ``seed`` argument makes every *launch* unique, and the per-step
time is the SLOPE between a short and a long run, cancelling the fixed
launch overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["per_step_seconds", "throughput", "train_step_seconds"]


def _make_runner(step_fn: Callable, k: int):
    def run(state, x, seed):
        def body(carry, i):
            if jnp.issubdtype(x.dtype, jnp.integer):
                # integer inputs: add a data-dependent scalar that is
                # numerically zero but not provably so at compile time
                xi = x + (carry * 1e-12 + seed * 1e-6).astype(x.dtype)
            else:
                # scale the input by (1 + 1e-12*carry): numerically a
                # no-op, but a true data dependency on the previous step
                xi = x * (1.0 + 1e-12 * carry.astype(x.dtype)) + seed.astype(
                    x.dtype
                ) * jnp.asarray(1e-6, x.dtype)
            y = step_fn(state, xi)
            return jnp.float32(jnp.sum(y.astype(jnp.float32))), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
        return total

    return jax.jit(run)


def per_step_seconds(
    step_fn: Callable,
    state,
    x: jax.Array,
    *,
    iters: int = 128,
    short_frac: float = 0.25,
    trials: int = 5,
) -> float:
    """Median-of-``trials`` slope estimate of one ``step_fn(state, x)``
    execution. For µs-scale steps pick ``iters`` so that
    ``iters * (1 - short_frac) * step_time`` dwarfs the ~10 ms RPC jitter
    of the tunneled chip — otherwise the slope is noise (the round-3
    bench uses iters=1024 for kernel-scale steps)."""
    k_short = max(2, int(iters * short_frac))
    k_long = iters
    runners = {k: _make_runner(step_fn, k) for k in (k_short, k_long)}
    for k, r in runners.items():
        np.asarray(r(state, x, jnp.int32(0)))  # compile + first exec

    def timed(k, seed):
        t0 = time.perf_counter()
        np.asarray(runners[k](state, x, jnp.int32(seed)))  # fetch = hard sync
        return time.perf_counter() - t0

    slopes = []
    for trial in range(trials):
        ts = timed(k_short, 1000 + trial)
        tl = timed(k_long, 2000 + trial)
        slopes.append((tl - ts) / (k_long - k_short))
    slopes.sort()
    return max(slopes[len(slopes) // 2], 1e-9)


def throughput(
    step_fn: Callable,
    state,
    x: jax.Array,
    *,
    iters: int = 128,
) -> Tuple[float, float]:
    """(items_per_second, seconds_per_step) for a batched step; the item
    count is ``x.shape[0]``."""
    s = per_step_seconds(step_fn, state, x, iters=iters)
    return x.shape[0] / s, s


def train_step_seconds(
    step_fn: Callable,
    state,
    x: jax.Array,
    y: jax.Array,
    *,
    iters: int = 64,
) -> float:
    """Per-step seconds of a state-mutating train step.

    ``step_fn(state, x, y) -> (new_state, loss)``. Unlike
    :func:`per_step_seconds`, the *state* is threaded through the scan
    carry — so the optimizer update and the backward pass feed the next
    step and nothing can be dead-code-eliminated (returning only the loss
    would let XLA drop the whole gradient/update computation). The loss
    is additionally chained into the next input for the usual
    anti-hoisting data dependency.
    """

    def make(k):
        @jax.jit
        def run(state, x, y, seed):
            def body(carry, i):
                st, prev = carry
                xi = x * (1.0 + 1e-12 * prev) + seed.astype(jnp.float32) * 1e-6
                st2, loss = step_fn(st, xi, y)
                return (st2, jnp.float32(loss)), None

            (_, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), jnp.arange(k)
            )
            return loss

        return run

    ks = (max(2, iters // 4), iters)
    runners = {k: make(k) for k in ks}
    for k in ks:
        np.asarray(runners[k](state, x, y, jnp.int32(0)))

    def timed(k, seed):
        t0 = time.perf_counter()
        np.asarray(runners[k](state, x, y, jnp.int32(seed)))
        return time.perf_counter() - t0

    slopes = []
    for trial in range(5):
        ts = timed(ks[0], 100 + trial)
        tl = timed(ks[1], 200 + trial)
        slopes.append((tl - ts) / (ks[1] - ks[0]))
    slopes.sort()
    return max(slopes[len(slopes) // 2], 1e-9)
