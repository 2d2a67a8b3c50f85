"""Device-mesh parallelism for quantized training + inference.

Net-new capability vs the reference (SURVEY.md §2.9: torch DataParallel
only, observers see the master shard): here parallelism is GSPMD over a
``jax.sharding.Mesh``:

- **Data parallel QAT**: shard the batch on the ``data`` axis and
  replicate parameters. Because observers and BN batch stats are written
  as *global* reductions (``jnp.mean/min/max`` over the batch axis), XLA
  partitions them and inserts the cross-replica ``psum``/``pmin``/
  ``pmax`` automatically — every replica sees identical quant state,
  which the reference's DataParallel never achieved.
- **Tensor parallel (channel) inference/training**: conv kernels are
  HWIO, per-channel quant state is ``(1, 1, 1, O)`` — both shard on the
  out-channel axis with one rule; activations follow layout; ICI
  collectives are inserted where grouped convs / channel shuffles mix
  channels.

``shard_model_and_optimizer`` applies NamedShardings leaf-by-leaf via
``device_put`` — jit then propagates. Multi-host: the same mesh spans
hosts via ``jax.distributed.initialize`` (DCN axis outermost).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "channel_sharding_for",
    "shard_state",
    "shard_model_and_optimizer",
    "shard_batch",
]


def make_mesh(
    data: int = 1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, model) mesh. ``data`` rides the outer (DCN-friendly) axis,
    ``model`` the inner (ICI) axis, per the scaling-book layout rules."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def channel_sharding_for(
    leaf: jax.Array, mesh: Mesh, axis: str = "model"
) -> NamedSharding:
    """Out-channel sharding rule: arrays whose LAST dim is divisible by the
    mesh axis size shard there ((..., O) covers HWIO kernels, bias/BN/
    gamma vectors, and per-channel quant stats alike); everything else
    replicates. Scalars and tiny stats replicate."""
    size = mesh.shape[axis]
    if size > 1 and leaf.ndim >= 1 and leaf.shape[-1] % size == 0 and leaf.shape[-1] >= size:
        spec = P(*([None] * (leaf.ndim - 1) + [axis]))
    else:
        spec = P()
    return NamedSharding(mesh, spec)


def shard_state(state, mesh: Mesh, axis: str = "model"):
    """device_put every leaf of an nnx State with the channel rule."""
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, channel_sharding_for(leaf, mesh, axis)),
        state,
    )


def shard_model_and_optimizer(
    model: nnx.Module,
    optimizer: Optional[nnx.Optimizer],
    mesh: Mesh,
    axis: str = "model",
) -> None:
    """In-place: move model (and optimizer) state onto the mesh with
    channel sharding (replicated when model axis is 1 — pure DP)."""
    nnx.update(model, shard_state(nnx.state(model), mesh, axis))
    if optimizer is not None:
        nnx.update(optimizer, shard_state(nnx.state(optimizer), mesh, axis))


def shard_batch(batch: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Shard the leading (batch) dim over the data axis.

    A ragged batch (size not divisible by the axis — e.g. the final eval
    batch with drop_remainder=False) is replicated instead: correct, just
    not parallel for that one batch."""
    if batch.shape[0] % mesh.shape[axis] != 0:
        return jax.device_put(batch, NamedSharding(mesh, P()))
    spec = P(axis, *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))
