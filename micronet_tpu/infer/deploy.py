"""Deployment: AOT-compiled engines (batch buckets) + serialized programs.

TPU-native replacement for the reference's TensorRT deploy utilities
(deploy/tensorrt/util_trt.py):

- ``get_engine``'s fixed-shape path (util_trt.py:56-70) →
  :func:`build_engine` with one bucket: the int engine is lowered and
  compiled ahead of time, so first inference pays no trace/compile.
- the dynamic-shape path with an optimization profile min/opt/max
  (util_trt.py:71-98) → a set of batch BUCKETS, each AOT-compiled;
  :class:`CompiledEngine` dispatches a request to the smallest covering
  bucket (padding the tail) and chunks batches beyond the largest bucket.
  XLA requires static shapes — bucketing is the idiomatic dynamic-shape
  answer on TPU, trading a bounded amount of padding for zero recompiles.
- engine serialization (``engine.serialize()``/``deserialize_cuda_engine``,
  util_trt.py:60-67,99-116) → :func:`serialize_engine` /
  :func:`deserialize_engine` on ``jax.export`` StableHLO artifacts with the
  weights embedded as constants, exactly a serialized TRT engine's
  weights-baked program. Artifacts record their lowering platform(s) and
  refuse to run elsewhere, like TRT engines pinned to a GPU arch.
- ``allocate_buffers``/``do_inference``'s pagelocked-buffer and stream
  management (util_trt.py:119-222) has no analog to write: XLA owns
  transfers, and dispatch is async by default.

The int-sim engine itself comes from :mod:`micronet_tpu.infer.engine`
(freeze_int); entropy calibration from :mod:`micronet_tpu.quant.calibrate`
fills the TRT-calibrator role at build time.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..nn.modules import eval_mode

__all__ = [
    "CompiledEngine",
    "build_engine",
    "serialize_engine",
    "deserialize_engine",
]


def profile_buckets(min_batch: int, max_batch: int) -> Tuple[int, ...]:
    """Geometric (×2) bucket ladder covering [min_batch, max_batch] — the
    optimization-profile analog: every request in range wastes < 50%
    padding, and each bucket is one compiled program."""
    buckets = []
    b = max(int(min_batch), 1)
    while b < max_batch:
        buckets.append(b)
        b *= 2
    buckets.append(int(max_batch))
    return tuple(dict.fromkeys(buckets))


class CompiledEngine:
    """AOT-compiled inference engine over fixed batch buckets.

    ``model`` is any eval-mode module (typically a frozen int engine);
    every bucket's program is compiled at construction (TRT builds at
    ``get_engine`` time, not first-inference time). Calls pick the
    smallest covering bucket; oversized batches run in largest-bucket
    chunks; the padded tail rows are sliced away.

    ``mesh`` turns on sharded serving (net-new vs both the reference and
    TRT, which are single-device): the batch shards over the mesh's
    ``data`` axis and the engine's weights/scales channel-shard over the
    ``model`` axis (:func:`micronet_tpu.parallel.channel_sharding_for`),
    so one bucketed program scales across chips with XLA inserting the
    ICI collectives. Buckets are rounded up to multiples of the data-axis
    size so every shard stays equal.
    """

    def __init__(
        self,
        model: nnx.Module,
        buckets: Sequence[int],
        example_shape: Tuple[int, ...],
        dtype=jnp.float32,
        mesh=None,
        data_axis: str = "data",
        model_axis: str = "model",
    ):
        if not buckets:
            raise ValueError("need at least one batch bucket")
        eval_mode(model)
        gdef, state = nnx.split(model)
        self.mesh = mesh
        self._data_axis = data_axis
        if mesh is not None:
            from ..parallel.sharding import shard_state

            state = shard_state(state, mesh, model_axis)
            dsize = mesh.shape[data_axis]
            buckets = [-(-int(b) // dsize) * dsize for b in buckets]
        self._state = state
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.example_shape = tuple(example_shape)
        self.dtype = dtype

        def forward(st, x):
            return nnx.merge(gdef, st)(x)

        fn = jax.jit(forward)
        self._compiled = {}
        for b in self.buckets:
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                xsh = NamedSharding(
                    mesh, P(data_axis, *([None] * len(self.example_shape)))
                )
                x_sds = jax.ShapeDtypeStruct(
                    (b, *self.example_shape), dtype, sharding=xsh
                )
            else:
                x_sds = jax.ShapeDtypeStruct((b, *self.example_shape), dtype)
            self._compiled[b] = fn.lower(state, x_sds).compile()

    def _run_bucket(self, b: int, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        if n < b:
            pad = jnp.zeros((b - n, *self.example_shape), self.dtype)
            x = jnp.concatenate([x, pad], axis=0)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batch

            x = shard_batch(x, self.mesh, self._data_axis)
        return self._compiled[b](self._state, x)[:n]

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, self.dtype)
        n = x.shape[0]
        covering = [b for b in self.buckets if b >= n]
        if covering:
            return self._run_bucket(covering[0], x)
        # beyond the profile max: chunk through the largest bucket
        big = self.buckets[-1]
        outs = [
            self._run_bucket(big, x[i : i + big]) for i in range(0, n, big)
        ]
        return jnp.concatenate(outs, axis=0)

    @property
    def flops(self) -> dict:
        """Per-bucket compiled-program FLOP estimates (cost analysis)."""
        out = {}
        for b, c in self._compiled.items():
            try:
                out[b] = float(c.cost_analysis()["flops"])
            except Exception:
                out[b] = float("nan")
        return out


def build_engine(
    model: nnx.Module,
    profile: Tuple[int, int, int] = (1, 32, 256),
    example_shape: Tuple[int, ...] = (32, 32, 3),
    dtype=jnp.float32,
    mesh=None,
) -> CompiledEngine:
    """TRT ``get_engine`` analog: profile = (min, opt, max) batch. ``opt``
    is guaranteed its own exact bucket; min/max bound the ladder. ``mesh``
    enables sharded serving (see :class:`CompiledEngine`)."""
    lo, opt, hi = profile
    buckets = sorted(set(profile_buckets(lo, hi)) | {int(opt)})
    return CompiledEngine(model, buckets, example_shape, dtype, mesh=mesh)


def serialize_engine(
    model: nnx.Module,
    batch: int,
    example_shape: Tuple[int, ...] = (32, 32, 3),
    dtype=jnp.float32,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the engine to a StableHLO artifact with weights embedded —
    the ``engine.serialize()`` + ``open(...,"wb").write`` flow of
    util_trt.py:60-67. ``platforms`` defaults to the current backend;
    pass e.g. ``("tpu",)`` to cross-build an artifact for TPU serving."""
    from jax import export as jexport

    eval_mode(model)
    gdef, state = nnx.split(model)
    # close over the state: weights/scales bake into the program as
    # constants, like a TRT engine's embedded weights
    fn = jax.jit(lambda x: nnx.merge(gdef, state)(x))
    x_sds = jax.ShapeDtypeStruct((batch, *example_shape), dtype)
    if platforms is not None:
        exp = jexport.export(fn, platforms=tuple(platforms))(x_sds)
    else:
        exp = jexport.export(fn)(x_sds)
    data = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


def deserialize_engine(data_or_path) -> Callable[[jax.Array], jax.Array]:
    """Load a serialized engine back into a callable
    (``runtime.deserialize_cuda_engine``, util_trt.py:99-116)."""
    from jax import export as jexport

    if isinstance(data_or_path, str):
        with open(data_or_path, "rb") as f:
            data = f.read()
    else:
        data = data_or_path
    exp = jexport.deserialize(bytearray(data))
    return exp.call
