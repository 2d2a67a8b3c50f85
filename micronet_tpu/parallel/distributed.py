"""Multi-host / explicit-collective training utilities.

Two ways to scale QAT (SURVEY.md §2.9 TPU-native column):

1. **GSPMD (default)**: shard the batch on the ``data`` mesh axis and jit
   — observers/BN stats are written as global reductions, so XLA inserts
   psum/pmin/pmax over ICI automatically (`parallel.sharding`).
2. **shard_map (explicit)**: for cases where you want manual control of
   the collectives (or to verify what GSPMD does), wrap a per-shard step
   with :func:`dp_shard_map_step`; quantizer statistics are reduced with
   the observers' ``axis_name`` path (`quant.observers` pmin/pmax/pmean),
   gradients with ``psum-mean``.

``initialize()`` wraps ``jax.distributed.initialize`` for multi-host
(DCN) runs; on a single host it is a no-op, so driver scripts can call it
unconditionally.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["initialize", "dp_shard_map_step"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op on a single process).

    With no args, reads the standard cluster env (JAX_COORDINATOR_ADDRESS
    etc.); single-host runs return immediately.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        import os

        if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def dp_shard_map_step(
    graphdef,
    mesh: Mesh,
    loss_of_logits: Callable,
    *,
    axis: str = "data",
):
    """Build an explicit-collective data-parallel train step.

    Returns ``step(state, opt_state_free_params..., x, y) -> (loss, new_state)``
    over shard_map: each shard runs the model on its local batch; gradients
    are ``psum``-averaged; the quantizer/BN statistics produced inside the
    shard are cross-replica-reduced before being written back — min/max
    stats with pmin/pmax, everything else (EMA stats, BN running stats,
    scales) with pmean. Because per-shard observer updates are computed
    from per-shard batch stats, pmean of the updated stats equals the
    update computed from pooled stats only approximately; this is the
    explicit-collective contract (the reference's DataParallel had no
    sync at all — SURVEY.md §2.9).
    """
    from jax import shard_map

    def _names(path):
        return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]

    def reduce_state(state):
        # entropy histograms need their sibling grid range: collect each
        # quantizer's local ent_absmax keyed by the owning-module prefix
        absmax_by_prefix = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
            names = _names(path)
            if len(names) >= 2 and names[-2] == "ent_absmax":
                absmax_by_prefix[tuple(names[:-2])] = leaf

        def visit(path, leaf):
            # leaf paths end in the VariableState's own 'value' attribute;
            # the stat's name is the innermost non-'value' key
            names = _names(path)
            name = next((n for n in reversed(names) if n != "value"), None)
            if name in ("min_val",):
                return jax.lax.pmin(leaf, axis)
            if name in ("max_val", "ent_absmax"):
                # ent_absmax is the entropy histogram's grid range: pmean
                # would shrink it below some replicas' data and corrupt
                # the grid; pmax keeps every replica's mass in range
                return jax.lax.pmax(leaf, axis)
            if name == "ent_counts":
                # each replica binned over [0, local_absmax]: rescale onto
                # the merged (pmax) grid BEFORE averaging, else a narrow
                # replica's mass is reinterpreted at ~global/local times
                # its true position (count scale itself is irrelevant to
                # the KL search; the grid is not)
                from ..quant.observers import _rescale_counts

                local_max = absmax_by_prefix[tuple(names[:-2])]
                global_max = jax.lax.pmax(local_max, axis)
                ratio = jnp.where(
                    global_max > 0,
                    local_max / jnp.maximum(global_max, 1e-30),
                    1.0,
                )
                rescaled = jnp.where(
                    ratio >= 1.0 - 1e-12, leaf, _rescale_counts(leaf, ratio)
                )
                return jax.lax.pmean(rescaled, axis)
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                return jax.lax.pmean(leaf, axis)
            return leaf

        return jax.tree_util.tree_map_with_path(visit, state)

    @jax.jit
    def step(state, x, y):
        def shard_fn(state, x, y):
            model = nnx.merge(graphdef, state)

            def loss_fn(m):
                return loss_of_logits(m(x), y)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            loss = jax.lax.pmean(loss, axis)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
            _, new_state = nnx.split(model)
            new_state = reduce_state(new_state)
            return loss, grads, new_state

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(state, x, y)

    return step
