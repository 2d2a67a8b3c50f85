"""Weight-only quantization for large models (LLM decode path).

Applies the per-row/per-column observer machinery to weight-only
compression: every large 2-D weight in a parameter pytree becomes
``{packed int4 (or int8), scale}``; matmuls run W4A16 via the Pallas
``int4_matmul`` kernel (activations stay bf16/f32). This is the stretch
capability of BASELINE.json configs[4] — net-new vs the reference, built
on the same shape-polymorphic quantizer axes (SURVEY.md §5
"long-context": "L"/"C"/"FC" generalize to per-tensor/channel/row).

Two surfaces:

- :class:`WOLinear` — nnx module drop-in; :func:`wo_quantize_linear`
  converts an existing ``nn.Linear``.
- :func:`quantize_pytree` / :func:`dequantize_leaf` — framework-agnostic:
  compress any pytree of arrays (e.g. flax linen params of a transformer)
  by replacing eligible 2-D leaves with :class:`WOTensor` records.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx, struct

from ..ops.int4_matmul import (
    pack_int4_hl8,
    quantize_int4_weight,
    quantize_int4_weight_grouped,
    unpack_int4_hl8,
    wo_linear_grouped_hl8,
)

from ..nn.modules import OrderedModule as _OrderedModule

__all__ = [
    "WOTensor",
    "quantize_int8_weight",
    "quantize_int8_weight_grouped",
    "WOLinear",
    "wo_quantize_linear",
    "quantize_pytree",
    "dequantize_leaf",
    "pytree_bytes",
]


@struct.dataclass
class WOTensor:
    """A weight-only-quantized 2-D tensor: int4 (packed) or int8 codes
    + scale.

    ``group == 0``: per-column scale (1, N). ``group > 0``: GPTQ/AWQ-style
    block scales (K/group, N) — one step size per (group rows x column),
    so a single outlier row cannot widen a whole column's step.
    ``bits == 4``: nibble-packed (K/2, N) storage in the hl8 byte layout
    (ops/int4_matmul.pack_int4_hl8), Pallas decode kernel; per-column
    scales broadcast to 128-row groups so both cases ride one kernel.
    ``bits == 8``: plain int8 (K, N) codes — dequantize-and-matmul in XLA
    (the convert fuses into the dot prologue; weights move 1 byte).
    """

    packed: jax.Array  # (K/2, N) int8 nibbles (bits=4) or (K, N) int8
    scale: jax.Array  # (1, N) or (K/group, N) f32
    # static shape info (padding restores odd K)
    k: int = struct.field(pytree_node=False, default=0)
    group: int = struct.field(pytree_node=False, default=0)
    bits: int = struct.field(pytree_node=False, default=4)

    def _codes(self) -> jax.Array:
        if self.bits == 8:
            return self.packed.astype(jnp.float32)
        return unpack_int4_hl8(self.packed)[: self.k].astype(jnp.float32)

    def dequantize(self) -> jax.Array:
        w = self._codes()
        if self.group:
            from ..ops.int4_matmul import _expand_gscale

            return w * _expand_gscale(self.scale, self.group)[: self.k]
        return w * self.scale

    def matmul(self, x: jax.Array) -> jax.Array:
        if self.bits == 8:
            # bf16 dequant + dot: XLA fuses convert+scale into the matmul
            # prologue, so int8 storage halves the weight HBM reads vs bf16
            w = self.dequantize().astype(jnp.bfloat16)
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                w,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        full = self.packed.shape[0] * 2 == self.k
        if self.group and full and self.packed.shape[0] % self.group == 0:
            return wo_linear_grouped_hl8(x, self.packed, self.scale)
        if not self.group and full and self.packed.shape[0] % 128 == 0:
            # per-column scales ride the grouped kernel as broadcast
            # 128-row groups (~6% extra scale-row reads, one kernel)
            g = self.k // 128
            gs = jnp.broadcast_to(self.scale.reshape(1, -1), (g, self.scale.size))
            return wo_linear_grouped_hl8(x, self.packed, gs)
        return x @ self.dequantize()  # odd-K / ragged-group fallback


def quantize_int8_weight(w: jax.Array, axis: int = 0):
    """Symmetric per-column int8 (shared RTN core, qmax=127)."""
    from ..ops.int4_matmul import symmetric_rtn

    return symmetric_rtn(w, 127.0, axis)


def quantize_int8_weight_grouped(w: jax.Array, group: int):
    """Symmetric group-wise int8 (shared RTN core, qmax=127)."""
    from ..ops.int4_matmul import symmetric_rtn_grouped

    return symmetric_rtn_grouped(w, 127.0, group)


def _quantize_2d(w: jax.Array, group: int = 0, bits: int = 4) -> WOTensor:
    assert bits in (4, 8), bits
    k = w.shape[0]
    if bits == 8:
        if group and k % group == 0:
            w_q, scale = quantize_int8_weight_grouped(w, group)
        else:
            group = 0
            w_q, scale = quantize_int8_weight(w, axis=0)
        return WOTensor(packed=w_q, scale=scale, k=k, group=group, bits=8)
    if group and k % group == 0:
        w_q, scale = quantize_int4_weight_grouped(w, group)
    else:
        group = 0
        w_q, scale = quantize_int4_weight(w, axis=0)
    if k % 2:
        w_q = jnp.pad(w_q, ((0, 1), (0, 0)))
    return WOTensor(packed=pack_int4_hl8(w_q), scale=scale, k=k, group=group)


class WOLinear(_OrderedModule):
    """Weight-only int4 linear (bias in f32)."""

    def __init__(self, wo: WOTensor, bias: Optional[jax.Array]):
        self.packed = nnx.Variable(wo.packed)
        self.scale = nnx.Variable(wo.scale)
        self.k = wo.k
        self.group = wo.group
        self.bits = wo.bits
        self.bias = nnx.Variable(bias) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        wo = WOTensor(
            self.packed[...], self.scale[...], self.k, self.group, self.bits
        )
        out = wo.matmul(x)
        if self.bias is not None:
            out = out + self.bias[...]
        return out


def wo_quantize_linear(linear, group: int = 0, bits: int = 4) -> WOLinear:
    """Convert a ``micronet_tpu.nn.Linear`` ((in, out) kernel) to int4 or
    int8 weight-only; ``group > 0`` uses block scales."""
    w = linear.weight[...]
    b = None if linear.bias is None else linear.bias[...]
    return WOLinear(_quantize_2d(w, group, bits), b)


def quantize_pytree(
    params: Any,
    *,
    min_size: int = 1 << 16,
    predicate: Optional[Callable[[Tuple, jax.Array], bool]] = None,
    group: int = 0,
    bits: int = 4,
) -> Any:
    """Replace large 2-D float leaves of ``params`` with WOTensor records.

    ``predicate(path, leaf)`` can veto individual leaves (e.g. embeddings
    or layernorm scales); default: every float 2-D leaf with
    ``size >= min_size`` is quantized along axis 0 (the contraction axis
    of ``x @ w`` convention). ``group > 0`` (e.g. 128) selects block
    scales; leaves whose K is not divisible fall back to per-column.
    ``bits`` selects int4 (packed, Pallas decode) or int8 (plain codes,
    XLA fused dequant-matmul) storage.
    """

    def visit(path, leaf):
        if (
            isinstance(leaf, jax.Array)
            and leaf.ndim == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.size >= min_size
            and (predicate is None or predicate(path, leaf))
        ):
            return _quantize_2d(leaf, group, bits)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def dequantize_leaf(leaf: Any) -> Any:
    """Inverse map for :func:`quantize_pytree` results."""
    if isinstance(leaf, WOTensor):
        return leaf.dequantize()
    return leaf


def pytree_bytes(params: Any) -> int:
    """Total storage bytes of a (possibly WO-quantized) pytree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array):
            total += leaf.size * leaf.dtype.itemsize
    return total
