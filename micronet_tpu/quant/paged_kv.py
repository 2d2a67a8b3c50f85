"""Paged int8 KV cache — the vLLM-style layout for ragged serving fleets.

Motivation (VERDICT r3 item 8, serving realism): the dense per-slot cache
(:mod:`.kv_cache`) reserves ``max_seq`` rows for EVERY slot, so a batch
mixing a 200-token chat with an 8k-token document wastes
``(max_seq - len)`` rows of HBM per short slot. Paged allocation stores
KV in fixed-size PAGES drawn from one shared pool; a slot holds only the
pages it has filled, so HBM scales with the sum of actual lengths, not
``slots * max_seq``.

Layout (TPU-first):

- ``k_codes``/``v_codes``: ``(P, H, page, D)`` int8 page pool — the
  page axis leads so one page is a contiguous DMA-able block, and the
  TRAILING ``(page, D)`` dims satisfy the TPU block rule (last two block
  dims must be 8/128-multiples), so the paged-attention kernel's
  BlockSpec can address ``(1, 1, page, D)`` blocks per (page, head).
- ``k_scale``/``v_scale``: ``(P, H, 1, page)`` f32 per-(position, head)
  scales (the singleton keeps the trailing block dims legal), same
  per-vector rule as the dense cache.
- ``page_table``: ``(slots, max_pages)`` int32 — slot s's i-th logical
  page lives at pool index ``page_table[s, i]`` (unallocated entries
  point at the reserved ZERO page 0, which stays all-zero, so gathers
  are always in-bounds without masking).
- ``lengths``: ``(slots,)`` fill pointers; ``free_top``/``free_stack``:
  an explicit LIFO free list (arrays, so alloc/free are jit-able).

Everything is a ``struct.dataclass`` pytree; append and attend are pure
functions like the dense cache. Two attention paths:

- :func:`paged_gather_dense` materializes a slot's contiguous
  ``(H, S, D)`` view (one ``jnp.take`` per buffer) for the existing
  dense kernels;
- :func:`micronet_tpu.ops.paged_attention.paged_decode_attend` reads
  pages IN PLACE from the pool — the page table rides as a
  scalar-prefetch argument whose values drive each grid step's
  BlockSpec index_map (no gather, no dense copy; hardware-validated).

Reference anchor: net-new vs the reference (its TensorRT deploy leg is
fixed-shape, deploy/tensorrt/util_trt.py:71-98); the per-(head, position)
scale rule is the same observer idea as kv_cache.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .kv_cache import quantize_kv_rows

__all__ = [
    "PagedKVCache",
    "init_paged_kv",
    "paged_alloc_slot",
    "paged_free_slot",
    "paged_append",
    "paged_gather_dense",
    "paged_hbm_bytes",
]


@struct.dataclass
class PagedKVCache:
    k_codes: jax.Array  # (P, H, page, D) int8
    k_scale: jax.Array  # (P, H, 1, page) f32
    v_codes: jax.Array  # (P, H, page, D) int8
    v_scale: jax.Array  # (P, H, 1, page) f32
    page_table: jax.Array  # (slots, max_pages) int32 (0 = the zero page)
    lengths: jax.Array  # (slots,) int32
    free_stack: jax.Array  # (P,) int32 LIFO of free pool indices
    free_top: jax.Array  # scalar int32: #free pages on the stack

    @property
    def page_size(self) -> int:
        return self.k_codes.shape[2]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]


def init_paged_kv(
    num_pages: int,
    page_size: int,
    num_heads: int,
    head_dim: int,
    slots: int,
    max_pages_per_slot: int,
) -> PagedKVCache:
    """Pool of ``num_pages`` pages. Page 0 is RESERVED as the all-zero
    page every unallocated page-table entry points at; the free list
    hands out pages 1..P-1."""
    p = num_pages
    return PagedKVCache(
        k_codes=jnp.zeros((p, num_heads, page_size, head_dim), jnp.int8),
        k_scale=jnp.zeros((p, num_heads, 1, page_size), jnp.float32),
        v_codes=jnp.zeros((p, num_heads, page_size, head_dim), jnp.int8),
        v_scale=jnp.zeros((p, num_heads, 1, page_size), jnp.float32),
        page_table=jnp.zeros((slots, max_pages_per_slot), jnp.int32),
        lengths=jnp.zeros((slots,), jnp.int32),
        # LIFO: top of stack at index free_top-1; page 0 never enters
        free_stack=jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.arange(p - 1, 0, -1, jnp.int32)]
        ),
        free_top=jnp.asarray(p - 1, jnp.int32),
    )


def paged_alloc_slot(cache: PagedKVCache, slot: int | jax.Array) -> PagedKVCache:
    """Reset ``slot``: return its pages to the free list and zero its
    table/length. (Pages are returned lazily-zeroed: the append path
    overwrites them, and gathers past ``lengths`` are masked by the
    attention bound.)"""
    n_used = _pages_used(cache.lengths[slot], cache.page_size)
    mp = cache.max_pages
    idx = jnp.arange(mp)
    row = cache.page_table[slot]

    def push(i, carry):
        stack, top = carry
        page = row[i]
        do = i < n_used
        stack = jnp.where(do, stack.at[top].set(page), stack)
        return stack, top + do.astype(jnp.int32)

    stack, top = jax.lax.fori_loop(
        0, mp, push, (cache.free_stack, cache.free_top)
    )
    return cache.replace(
        page_table=cache.page_table.at[slot].set(jnp.zeros((mp,), jnp.int32)),
        lengths=cache.lengths.at[slot].set(0),
        free_stack=stack,
        free_top=top,
    )


def paged_free_slot(cache: PagedKVCache, slot: int | jax.Array) -> PagedKVCache:
    """Alias of :func:`paged_alloc_slot` (eviction == reset)."""
    return paged_alloc_slot(cache, slot)


def _pages_used(length: jax.Array, page_size: int) -> jax.Array:
    return (length + page_size - 1) // page_size


def paged_append(
    cache: PagedKVCache,
    slot: int | jax.Array,
    k: jax.Array,  # (H, D) one token's K
    v: jax.Array,  # (H, D)
) -> PagedKVCache:
    """Quantize-and-append one token to ``slot``, allocating a fresh page
    from the free list when the current page is full. Static shapes +
    scatters — jit/scan friendly; OOM (empty free list) clamps to the
    zero page (callers guard capacity like ServeLoop guards max_seq)."""
    ps = cache.page_size
    i = cache.lengths[slot]
    page_idx = i // ps
    offset = i % ps
    need_new = offset == 0
    # pop a page when starting a new one (stack top; clamp at empty)
    top = cache.free_top
    new_page = cache.free_stack[jnp.maximum(top - 1, 0)]
    top = jnp.where(need_new & (top > 0), top - 1, top)
    page = jnp.where(
        need_new, jnp.where(cache.free_top > 0, new_page, 0),
        cache.page_table[slot, page_idx],
    ).astype(jnp.int32)
    table = cache.page_table.at[slot, page_idx].set(page)

    kq, ks = quantize_kv_rows(k)  # (H, D) int8, (H, 1)
    vq, vs = quantize_kv_rows(v)
    return cache.replace(
        k_codes=cache.k_codes.at[page, :, offset, :].set(kq),
        k_scale=cache.k_scale.at[page, :, 0, offset].set(ks[:, 0]),
        v_codes=cache.v_codes.at[page, :, offset, :].set(vq),
        v_scale=cache.v_scale.at[page, :, 0, offset].set(vs[:, 0]),
        page_table=table,
        lengths=cache.lengths.at[slot].set(i + 1),
        free_top=top,
    )


def paged_gather_dense(
    cache: PagedKVCache, slot: int | jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Materialize ``slot``'s logical (H, S, D) cache view + length,
    S = max_pages * page_size. One ``jnp.take`` per buffer along the
    page axis (XLA: dynamic-slice DMAs per page); unallocated tail pages
    read the zero page and are masked by the returned length bound.
    Feed straight into ``decode_attend_q8kv`` / the S-blocked kernel."""
    pages = cache.page_table[slot]  # (max_pages,)

    def dense(codes, scale):
        c = jnp.take(codes, pages, axis=0)  # (mp, H, page, D)
        s = jnp.take(scale, pages, axis=0)  # (mp, H, 1, page)
        mp, h, ps, d = c.shape
        return (
            c.transpose(1, 0, 2, 3).reshape(h, mp * ps, d),  # (H, S, D)
            s[:, :, 0, :].transpose(1, 0, 2).reshape(h, mp * ps),  # (H, S)
        )

    kc, ks = dense(cache.k_codes, cache.k_scale)
    vc, vs = dense(cache.v_codes, cache.v_scale)
    return kc, ks, vc, vs, cache.lengths[slot]


def paged_hbm_bytes(cache: PagedKVCache) -> int:
    """Pool storage bytes — the capacity-planning number: pages * page
    bytes, independent of slot count (the dense cache's
    ``slots * max_seq`` becomes ``sum(lengths)`` rounded up to pages)."""
    total = 0
    for leaf in (cache.k_codes, cache.k_scale, cache.v_codes, cache.v_scale):
        total += leaf.size * leaf.dtype.itemsize
    return total
