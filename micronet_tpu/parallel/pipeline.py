"""Pipeline parallelism (GPipe-style) over a ``stage`` mesh axis.

Net-new vs the reference (SURVEY.md §2.9: no PP anywhere) and the last
of the classic parallelism modes next to dp/tp. TPU-first design:

- The model is S sequential STAGES; each device along the ``stage`` mesh
  axis holds only its stage's parameters (stacked pytree, leading stage
  dim sharded on the axis).
- Inside ``shard_map``, a ``lax.scan`` over ``n_micro + S - 1`` ticks
  drives the classic pipeline schedule: every tick each device applies
  its stage to the activation received on the previous tick and passes
  the result to the next device with ``lax.ppermute`` (ICI
  neighbor-exchange; no all-to-all).
- Backward needs NO hand scheduling: ``ppermute`` has a transpose rule,
  so ``jax.grad`` through the scan yields the reverse pipeline
  automatically (cotangents flow stage S-1 -> 0 with reversed permutes).

The bubble fraction is the usual (S-1)/(n_micro+S-1); choose
``n_micro >> S``. Microbatches are the leading dim of ``x``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_apply", "pipeline_apply_stateful", "stack_stage_params"]


def stack_stage_params(params_list):
    """Stack S per-stage parameter pytrees into one pytree with a leading
    stage dim (shard it on the ``stage`` axis). All stages must share a
    parameter structure — the usual equal-blocks pipeline regime."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,  # (n_micro, micro_batch, ...) microbatched input
    mesh: Mesh,
    axis: str = "stage",
):
    """Run ``stage_fn`` as an S-stage pipeline over the mesh axis.

    ``stage_fn(stage_params, h) -> h`` must keep the activation shape
    (equal-blocks pipeline). Returns the final-stage outputs with the
    same leading (n_micro, micro_batch) dims as ``x``.

    Semantics match ``fold(stage_fn, stages)(x)`` exactly; only the
    schedule is parallel. Differentiable end to end (GPipe backward via
    AD through ppermute).
    """
    s = mesh.shape[axis]
    n_micro = x.shape[0]
    perm = [(i, (i + 1) % s) for i in range(s)]

    def shard_fn(params, xs):
        # params: this device's stage params (leading stage dim of size 1)
        params = jax.tree.map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis)
        n_ticks = n_micro + s - 1
        zero = jnp.zeros_like(xs[0])

        def tick(carry, t):
            recv = carry
            # stage 0 ingests microbatch t (while available), others take
            # the neighbor's activation from the previous tick
            x_in = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, n_micro - 1), keepdims=False
            )
            x0 = jnp.where(t < n_micro, 1.0, 0.0).astype(x_in.dtype) * x_in
            h_in = jnp.where(idx == 0, x0, recv)
            h_out = stage_fn(params, h_in)
            nxt = jax.lax.ppermute(h_out, axis, perm)
            # last stage emits microbatch t-(s-1) at tick t
            return nxt, h_out

        _, outs = jax.lax.scan(tick, zero, jnp.arange(n_ticks))
        # outs: (n_ticks, micro, ...) per device; the LAST stage's outputs
        # for ticks [s-1, s-1+n_micro) are the pipeline result. Every
        # device returns its own slice, sharded over the stage axis; the
        # caller-side [s-1] slice reads only the last stage's shard —
        # O(|out|) transfer instead of the O(S*|out|) psum broadcast a
        # where+psum gather would cost.
        return outs[s - 1 : s - 1 + n_micro][None]

    from jax import shard_map

    stage_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(stage_spec, P()),
        out_specs=P(axis),
        check_vma=False,
    )(stacked_params, x)
    return out[s - 1]


def pipeline_apply_stateful(
    stage_fn: Callable[[Any, Any, jax.Array], tuple],
    stacked_params: Any,
    stacked_state: Any,
    x: jax.Array,  # (n_micro, micro_batch, ...) microbatched input
    mesh: Mesh,
    axis: str = "stage",
):
    """Pipeline with per-stage MUTABLE state riding the scan carry — the
    composition of pipeline parallelism with the QAT framework (VERDICT r2
    item 5): a stage can be a quantized nnx block whose observers, BN
    running stats, and qparams update per microbatch.

    ``stage_fn(stage_params, stage_state, h) -> (h_out, stage_state')``.
    State updates are GATED to real microbatches: during warmup/drain
    ticks a stage processes pipeline-bubble zeros, and its state update is
    discarded (``where``-merge), so observers never ingest bubble garbage
    — the semantic difference between pipelining a quantized model and a
    pure function.

    Returns ``(outputs, new_stacked_state)`` with outputs matching the
    sequential fold ``for mb: for stage: h, st = stage_fn(p, st, h)``
    exactly (per-stage microbatch order is preserved, so observer
    trajectories match too). Differentiable in ``stacked_params``.
    """
    s = mesh.shape[axis]
    n_micro = x.shape[0]
    perm = [(i, (i + 1) % s) for i in range(s)]

    def shard_fn(params, state, xs):
        params = jax.tree.map(lambda a: a[0], params)
        state_local = jax.tree.map(lambda a: a[0], state)
        idx = jax.lax.axis_index(axis)
        n_ticks = n_micro + s - 1
        zero = jnp.zeros_like(xs[0])

        def tick(carry, t):
            recv, st = carry
            x_in = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, n_micro - 1), keepdims=False
            )
            x0 = jnp.where(t < n_micro, 1.0, 0.0).astype(x_in.dtype) * x_in
            h_in = jnp.where(idx == 0, x0, recv)
            # Snapshot the pre-forward state: an nnx-backed stage_fn
            # (merge → forward → split) mutates the *same* VariableState
            # objects the input tree holds, so without a rebuilt tree the
            # "old" branch of the where-merge below would already contain
            # the bubble-tick update and the gating would be a no-op.
            st_pre = jax.tree.map(lambda a: a, st)
            h_out, st_new = stage_fn(params, st, h_in)
            # device idx holds microbatch (t - idx): valid while in range
            mb = t - idx
            valid = jnp.logical_and(mb >= 0, mb < n_micro)
            st = jax.tree.map(
                lambda new, old: jnp.where(valid, new, old), st_new, st_pre
            )
            nxt = jax.lax.ppermute(h_out, axis, perm)
            return (nxt, st), h_out

        (_, st_final), outs = jax.lax.scan(
            tick, (zero, state_local), jnp.arange(n_ticks)
        )
        # outputs stay sharded over the stage axis; the caller-side [s-1]
        # slice reads only the last stage's shard (see pipeline_apply)
        out = outs[s - 1 : s - 1 + n_micro][None]
        st_out = jax.tree.map(lambda a: a[None], st_final)  # re-stack dim
        return out, st_out

    from jax import shard_map

    param_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    state_spec = jax.tree.map(lambda _: P(axis), stacked_state)
    out, st = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(param_spec, state_spec, P()),
        out_specs=(P(axis), state_spec),
        check_vma=False,
    )(stacked_params, stacked_state, x)
    return out[s - 1], st
