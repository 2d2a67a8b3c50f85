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
    "paged_append_batch",
    "paged_insert_from_dense",
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
        # LIFO: top of stack at index free_top-1, so the p-1 usable
        # pages occupy indices 0..p-2 (pop order 1, 2, ..., p-1); the
        # zero-pad at index p-1 is never read — page 0 never enters.
        # (The previous layout prepended the pad, shifting every page up
        # one index: the LAST pop handed out the reserved zero page and
        # page 1 could never be allocated — caught by the r5 OOM test.)
        free_stack=jnp.concatenate(
            [jnp.arange(p - 1, 0, -1, jnp.int32), jnp.zeros((1,), jnp.int32)]
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
        # page > 0 guard: the reserved zero page must never enter the
        # free list (defense in depth — a corrupted table entry would
        # otherwise alias page 0 into normal allocation forever)
        do = (i < n_used) & (page > 0)
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
    scatters — jit/scan friendly.

    Saturation (ADVICE r4): the append is SKIPPED — no write, no length
    increment, no pop — when (a) the slot is at capacity
    (``max_pages * page_size`` rows) or (b) a fresh page is needed but
    the free list is empty. The zero page and the slot's table are never
    corrupted; callers guard capacity up front (ServeLoop checks free
    pages at admission and force-finishes slots at max_seq)."""
    ps = cache.page_size
    mp = cache.max_pages
    p = cache.k_codes.shape[0]
    i = cache.lengths[slot]
    cap = mp * ps
    page_idx = jnp.minimum(i // ps, mp - 1)
    offset = i % ps
    need_new = (offset == 0) & (i < cap)
    top = cache.free_top
    new_page = cache.free_stack[jnp.maximum(top - 1, 0)]
    # the write proceeds iff below capacity AND (continuing a page, or a
    # fresh page is actually available)
    ok = (i < cap) & (~need_new | (top > 0))
    top = jnp.where(need_new & ok, top - 1, top)
    page = jnp.where(
        need_new, new_page, cache.page_table[slot, page_idx]
    ).astype(jnp.int32)
    # skipped writes route to an out-of-bounds index and are DROPPED
    # (mode="drop"), leaving every buffer untouched
    tbl_col = jnp.where(ok & need_new, page_idx, mp)
    table = cache.page_table.at[slot, tbl_col].set(page, mode="drop")
    tgt = jnp.where(ok, page, p)

    kq, ks = quantize_kv_rows(k)  # (H, D) int8, (H, 1)
    vq, vs = quantize_kv_rows(v)
    return cache.replace(
        k_codes=cache.k_codes.at[tgt, :, offset, :].set(kq, mode="drop"),
        k_scale=cache.k_scale.at[tgt, :, 0, offset].set(ks[:, 0], mode="drop"),
        v_codes=cache.v_codes.at[tgt, :, offset, :].set(vq, mode="drop"),
        v_scale=cache.v_scale.at[tgt, :, 0, offset].set(vs[:, 0], mode="drop"),
        page_table=table,
        lengths=cache.lengths.at[slot].set(i + ok.astype(jnp.int32)),
        free_top=top,
    )


def paged_append_batch(
    cache: PagedKVCache,
    k_codes: jax.Array,  # (B, H, D) int8 — pre-quantized current rows
    k_scale: jax.Array,  # (B, H) f32
    v_codes: jax.Array,  # (B, H, D) int8
    v_scale: jax.Array,  # (B, H) f32
    active: jax.Array,  # (B,) bool — inactive slots append nothing
) -> PagedKVCache:
    """One-token append for EVERY active slot at once — the paged serving
    fast path's deferred append (same pattern as
    :func:`..quant.kv_cache.append_kv_batch_quantized`: the attention
    kernel reads the pre-append pool + the current rows as operands, and
    this scatter's output only feeds the NEXT step).

    Allocation is vectorized: slots starting a fresh page take
    consecutive positions off the LIFO stack (exclusive cumsum ranks);
    a slot at capacity, or needing a page when the stack has run out,
    skips its append entirely (write dropped, length unchanged) — the
    same saturation contract as :func:`paged_append`. Inactive lanes
    (``active == False``) never pop pages — that is the point of the
    mask: the dense batched cache lets idle lanes scatter masked garbage
    for free, but in a SHARED pool an idle append would leak pages."""
    ps = cache.page_size
    mp = cache.max_pages
    p = cache.k_codes.shape[0]
    b = k_codes.shape[0]
    rows = jnp.arange(b)
    i = cache.lengths  # (B,)
    cap = mp * ps
    page_idx = jnp.minimum(i // ps, mp - 1)
    offset = i % ps
    need_new = active & (offset == 0) & (i < cap)
    # rank r among the page-needing slots pops free_stack[top - 1 - r]
    nn32 = need_new.astype(jnp.int32)
    rank = jnp.cumsum(nn32) - nn32  # exclusive cumsum
    can_alloc = rank < cache.free_top
    pop_pos = cache.free_top - 1 - rank
    new_page = cache.free_stack[jnp.maximum(pop_pos, 0)]
    ok = active & (i < cap) & (~need_new | can_alloc)
    n_popped = jnp.sum((need_new & can_alloc).astype(jnp.int32))
    cur_page = cache.page_table[rows, page_idx]
    page = jnp.where(need_new, new_page, cur_page).astype(jnp.int32)
    tbl_col = jnp.where(ok & need_new, page_idx, mp)  # OOB -> dropped
    table = cache.page_table.at[rows, tbl_col].set(page, mode="drop")
    tgt = jnp.where(ok, page, p)  # OOB -> dropped
    return cache.replace(
        k_codes=cache.k_codes.at[tgt, :, offset, :].set(k_codes, mode="drop"),
        k_scale=cache.k_scale.at[tgt, :, 0, offset].set(k_scale, mode="drop"),
        v_codes=cache.v_codes.at[tgt, :, offset, :].set(v_codes, mode="drop"),
        v_scale=cache.v_scale.at[tgt, :, 0, offset].set(v_scale, mode="drop"),
        page_table=table,
        lengths=i + ok.astype(jnp.int32),
        free_top=cache.free_top - n_popped,
    )


def paged_insert_from_dense(
    cache: PagedKVCache,
    slot: int | jax.Array,
    k_codes: jax.Array,  # (H, S, D) int8 — a slot's dense rows (prefill)
    k_scale: jax.Array,  # (H, S) f32
    v_codes: jax.Array,  # (H, S, D) int8
    v_scale: jax.Array,  # (H, S) f32
    length: jax.Array,  # scalar int32: #valid rows (<= S)
) -> PagedKVCache:
    """Splice a freshly prefilled DENSE cache view into ``slot`` of the
    pool — the paged ServeLoop's admission step. ``S`` must equal
    ``max_pages * page_size`` (the slot's logical capacity; ServeLoop
    asserts this at construction). The slot must be empty (admission
    frees it first); ``ceil(length / page_size)`` pages come off the
    stack in ONE vectorized pop + one scatter per buffer. Callers check
    capacity up front (``int(cache.free_top)``) — if the pool cannot
    hold the prompt, pages past the stack run out are dropped and
    ``lengths`` records only the stored rows."""
    ps = cache.page_size
    mp = cache.max_pages
    p = cache.k_codes.shape[0]
    h, s, d = k_codes.shape
    assert s == mp * ps, (s, mp, ps)
    n_pages = _pages_used(length, ps)  # dynamic scalar
    j = jnp.arange(mp)
    want = j < n_pages
    can = j < cache.free_top
    do = want & can
    pages = cache.free_stack[jnp.maximum(cache.free_top - 1 - j, 0)]
    pages = jnp.where(do, pages, 0).astype(jnp.int32)
    n_alloc = jnp.sum(do.astype(jnp.int32))
    table = cache.page_table.at[slot].set(pages)
    tgt = jnp.where(do, pages, p)  # OOB -> dropped
    # chunk the dense views into per-page blocks: (mp, H, ps, D)
    kc = k_codes.reshape(h, mp, ps, d).transpose(1, 0, 2, 3)
    vc = v_codes.reshape(h, mp, ps, d).transpose(1, 0, 2, 3)
    ks = k_scale.reshape(h, mp, ps).transpose(1, 0, 2)[:, :, None, :]
    vs = v_scale.reshape(h, mp, ps).transpose(1, 0, 2)[:, :, None, :]
    return cache.replace(
        k_codes=cache.k_codes.at[tgt].set(kc, mode="drop"),
        k_scale=cache.k_scale.at[tgt].set(ks, mode="drop"),
        v_codes=cache.v_codes.at[tgt].set(vc, mode="drop"),
        v_scale=cache.v_scale.at[tgt].set(vs, mode="drop"),
        page_table=table,
        lengths=cache.lengths.at[slot].set(
            jnp.minimum(length, n_alloc * ps)
        ),
        free_top=cache.free_top - n_alloc,
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
