"""Pallas TPU kernel: paged int8-KV decode attention.

The serving-fleet endgame of the paged cache layout
(:mod:`micronet_tpu.quant.paged_kv`): attention reads each slot's KV
pages STRAIGHT OUT OF THE SHARED POOL — no gather, no dense
materialization. The page table rides as a SCALAR-PREFETCH argument so
each grid step's BlockSpec ``index_map`` looks up which pool page to DMA
next (``pltpu.PrefetchScalarGridSpec``): logical page ``j`` of slot
``s`` streams pool block ``page_table[s, j]`` through VMEM, and the
flash-style online softmax (same math as
``decode_attention._kernel_blocked``) accumulates across a slot's pages.

HBM traffic equals the sum of ACTUAL page counts — ragged batches pay
for what they use, which is the entire point of paging. Unallocated
logical pages point at the reserved zero page (paged_kv layout rule);
their positions sit past the slot's length bound, so they are masked —
and their compute is skipped with a ``pl.when`` guard (the DMA of a
zero page still streams; a production variant would shrink the grid per
slot, which static grids cannot express — documented trade).

GQA: R query heads per KV head ride the same (8, D) query block as the
dense kernels — one pool read serves all R rows.

Reference anchor: net-new serving capability (SURVEY.md §5 stretch);
the layout/kernel split mirrors vLLM's paged attention redesigned for
the TPU grid + scalar-prefetch model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _dispatch

__all__ = [
    "paged_decode_attend",
    "paged_decode_attend_xla",
    "paged_decode_attend_cur",
    "paged_decode_attend_cur_xla",
]

_QROWS = 8
_NEG_INF = -1e30  # finite mask: -inf nans the online-softmax rescale


def _tail_clamped_page(tbl, lens, slot, j, page):
    """Pool page for grid step (slot, j): logical page ``j`` — CLAMPED
    to the slot's last used page for steps past its fill bound. Tail
    steps therefore map to the SAME block index as the last real step,
    and the Pallas pipeline elides the copy (equal consecutive block
    indices are not re-fetched) — a short slot in a ragged batch pays
    DMA only for its ACTUAL pages (VERDICT r4 item 8's zero-page DMA
    waste, fixed inside the static grid)."""
    last_used = jnp.maximum((lens[slot] + page - 1) // page - 1, 0)
    return tbl[slot, jnp.minimum(j, last_used)]


def _paged_kernel(
    table_ref,  # (slots, MP) int32 scalar-prefetch
    lengths_ref,  # (slots,) int32 scalar-prefetch
    q_ref,  # (1, H, 8, D)
    kc_ref,  # (1, H, page, D) int8 — pool block chosen by index_map
    ks_ref,  # (1, H, 1, page) f32
    vc_ref,  # (1, H, page, D) int8
    vs_ref,  # (1, H, 1, page) f32
    out_ref,  # (1, H, 8, D)
    acc_ref, m_ref, l_ref,  # VMEM scratch (H, 8, D) / (H, 8, 1)
    *,
    heads: int,
):
    """One grid step per (slot, page) with ALL heads in the block — the
    pool's (H, page, D) layout makes a whole page contiguous, so this is
    an 8x bigger DMA and 8x fewer grid steps than the per-(slot, head)
    grid (measured: per-step fixed costs dominated the per-head variant
    at ~0.36 us x slots*H*MP steps). Heads unroll statically inside."""
    i = pl.program_id(0)  # slot
    j = pl.program_id(1)  # logical page index
    nb = pl.num_programs(1)
    page = kc_ref.shape[2]
    bound = lengths_ref[i]
    d = q_ref.shape[-1]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # skip pages entirely past the fill bound (their table entries are
    # the zero page): scratch carries through untouched
    @pl.when(j * page < bound)
    def _block():
        pos = j * page + jax.lax.broadcasted_iota(
            jnp.int32, (_QROWS, page), 1
        )
        valid = pos < bound
        for hh in range(heads):
            q = q_ref[0, hh].astype(jnp.bfloat16)  # (8, D)
            kc = kc_ref[0, hh]  # (page, D) int8
            logits = jax.lax.dot_general(
                q, kc.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (8, page)
            logits = logits * ks_ref[0, hh, 0][None, :] * (1.0 / (d**0.5))
            logits = jnp.where(valid, logits, _NEG_INF)
            m_new = jnp.maximum(
                m_ref[hh], jnp.max(logits, axis=-1, keepdims=True)
            )
            corr = jnp.exp(m_ref[hh] - m_new)
            p = jnp.exp(logits - m_new)
            p = jnp.where(valid, p, 0.0)
            l_ref[hh] = l_ref[hh] * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = (p * vs_ref[0, hh, 0][None, :]).astype(jnp.bfloat16)
            acc_ref[hh] = acc_ref[hh] * corr + jax.lax.dot_general(
                pv, vc_ref[0, hh].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            m_ref[hh] = m_new

    @pl.when(j == nb - 1)
    def _finalize():
        out_ref[0] = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)


def paged_decode_attend(
    k_codes: jax.Array,  # (P, H, page, D) int8 — the page POOL
    k_scale: jax.Array,  # (P, H, 1, page) f32
    v_codes: jax.Array,  # (P, H, page, D) int8
    v_scale: jax.Array,  # (P, H, 1, page) f32
    page_table: jax.Array,  # (slots, MP) int32
    lengths: jax.Array,  # (slots,) int32
    q: jax.Array,  # (slots, H, R, D) f32, R <= 8 (GQA rows)
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention for every slot against its paged int8 KV, pages
    read in place from the pool via the scalar-prefetched table.
    Returns (slots, H, R, D). Off TPU the default is the gather-dense
    XLA oracle (fast, and the dense loop's exact math); pass
    ``interpret=True`` to run the real kernel body interpreted
    (kernel-numerics tests)."""
    p, h, page, d = k_codes.shape
    slots, mp = page_table.shape
    _, _, r, _ = q.shape
    assert r <= _QROWS and d % 128 == 0 and page % 8 == 0, (r, d, page)
    if interpret is not True and not _dispatch.on_tpu():
        return paged_decode_attend_xla(
            k_codes, k_scale, v_codes, v_scale, page_table, lengths, q
        )
    if interpret is None:
        interpret = not _dispatch.on_tpu()
    q8 = (
        jnp.zeros((slots, h, _QROWS, d), jnp.float32)
        .at[:, :, :r, :]
        .set(q)
    )

    def kv_map(i, j, tbl, lens):
        return (_tail_clamped_page(tbl, lens, i, j, page), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(slots, mp),
        in_specs=[
            pl.BlockSpec((1, h, _QROWS, d), lambda i, j, tbl, lens: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, page, d), kv_map),
            pl.BlockSpec((1, h, 1, page), kv_map),
            pl.BlockSpec((1, h, page, d), kv_map),
            pl.BlockSpec((1, h, 1, page), kv_map),
        ],
        out_specs=pl.BlockSpec(
            (1, h, _QROWS, d), lambda i, j, tbl, lens: (i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((h, _QROWS, d), jnp.float32),
            pltpu.VMEM((h, _QROWS, 1), jnp.float32),
            pltpu.VMEM((h, _QROWS, 1), jnp.float32),
        ],
    )
    import functools

    out = pl.pallas_call(
        functools.partial(_paged_kernel, heads=h),
        out_shape=jax.ShapeDtypeStruct((slots, h, _QROWS, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * slots * h * mp * page * d * 2,
            bytes_accessed=2 * slots * h * mp * page * d
            + 2 * slots * h * mp * page * 4,
            transcendentals=slots * h * mp * page,
        ),
        # slots are independent; page steps carry scratch
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        q8, k_codes, k_scale, v_codes, v_scale,
    )
    return out[:, :, :r, :]


def _paged_kernel_cur(
    table_ref,  # (slots, MP) int32 scalar-prefetch
    lengths_ref,  # (slots,) int32 scalar-prefetch
    q_ref,  # (1, H, 8, D)
    kc_ref,  # (1, H, page, D) int8 — pool block chosen by index_map
    ks_ref,  # (1, H, 1, page) f32
    vc_ref,  # (1, H, page, D) int8
    vs_ref,  # (1, H, 1, page) f32
    kcur_ref,  # (1, H, 1, D) int8 — current token's K codes
    kscur_ref,  # (slots*H,) f32 SMEM
    vcur_ref,  # (1, H, 1, D) int8
    vscur_ref,  # (slots*H,) f32 SMEM
    out_ref,  # (1, H, 8, D)
    acc_ref, m_ref, l_ref,  # VMEM scratch (H, 8, D) / (H, 8, 1)
    *,
    heads: int,
):
    """:func:`_paged_kernel`'s all-heads-per-step online softmax, plus
    the current token's quantized K/V row folded in at the LAST grid
    step — the deferred-append serving path (``decode_batch`` over the
    paged pool; see ``decode_attention._kernel_cur`` for why the append
    stays outside the kernel's dataflow and for the exact precision
    contract of the current column)."""
    i = pl.program_id(0)  # slot (all heads per step — see _paged_kernel)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    page = kc_ref.shape[2]
    bound = lengths_ref[i]
    d = q_ref.shape[-1]
    inv = 1.0 / (d**0.5)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(j * page < bound)
    def _block():
        pos = j * page + jax.lax.broadcasted_iota(
            jnp.int32, (_QROWS, page), 1
        )
        valid = pos < bound
        for hh in range(heads):
            q = q_ref[0, hh].astype(jnp.bfloat16)  # (8, D)
            kc = kc_ref[0, hh]  # (page, D) int8
            logits = jax.lax.dot_general(
                q, kc.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (8, page)
            logits = logits * ks_ref[0, hh, 0][None, :] * inv
            logits = jnp.where(valid, logits, _NEG_INF)
            m_new = jnp.maximum(
                m_ref[hh], jnp.max(logits, axis=-1, keepdims=True)
            )
            corr = jnp.exp(m_ref[hh] - m_new)
            p = jnp.exp(logits - m_new)
            p = jnp.where(valid, p, 0.0)
            l_ref[hh] = l_ref[hh] * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = (p * vs_ref[0, hh, 0][None, :]).astype(jnp.bfloat16)
            acc_ref[hh] = acc_ref[hh] * corr + jax.lax.dot_general(
                pv, vc_ref[0, hh].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            m_ref[hh] = m_new

    @pl.when(j == nb - 1)
    def _finalize():
        # current row: elementwise, not an N=1 dot (Mosaic verifier);
        # bf16 values cast to f32 exactly, products exact in f32 — the
        # same precision class as the cached columns' MXU products
        for hh in range(heads):
            q = q_ref[0, hh].astype(jnp.bfloat16)
            lcur = jnp.sum(
                q.astype(jnp.float32)
                * kcur_ref[0, hh].astype(jnp.bfloat16).astype(jnp.float32),
                axis=1,
                keepdims=True,
            )  # (8, 1)
            lcur = lcur * kscur_ref[i * heads + hh] * inv
            m_fin = jnp.maximum(m_ref[hh], lcur)
            corr_f = jnp.exp(m_ref[hh] - m_fin)
            pcur = jnp.exp(lcur - m_fin)
            denom = l_ref[hh] * corr_f + pcur
            pvcur = (pcur * vscur_ref[i * heads + hh]).astype(jnp.bfloat16)
            acc = acc_ref[hh] * corr_f + (
                pvcur.astype(jnp.float32)
                * vcur_ref[0, hh].astype(jnp.float32)  # (1, D) broadcasts
            )
            out_ref[0, hh] = acc / jnp.maximum(denom, 1e-30)


def paged_decode_attend_cur(
    k_codes: jax.Array,  # (P, H, page, D) int8 — the page POOL
    k_scale: jax.Array,  # (P, H, 1, page) f32
    v_codes: jax.Array,  # (P, H, page, D) int8
    v_scale: jax.Array,  # (P, H, 1, page) f32
    page_table: jax.Array,  # (slots, MP) int32
    lengths: jax.Array,  # (slots,) int32 — cached rows visible (< lengths)
    q: jax.Array,  # (slots, H, R, D) f32, R <= 8 (GQA rows)
    k_cur: jax.Array,  # (slots, H, D) int8 — current token's K codes
    k_cur_scale: jax.Array,  # (slots, H) f32
    v_cur: jax.Array,  # (slots, H, D) int8
    v_cur_scale: jax.Array,  # (slots, H) f32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Paged decode attention over cache[<lengths] PLUS the current
    token's quantized K/V row (deferred-append: the caller scatters the
    SAME codes into the pool afterwards via ``paged_append_batch``).
    Returns (slots, H, R, D). Falls back to the gather-dense oracle for
    non-tile-aligned geometry (D % 128, page % 8) and — unless
    ``interpret=True`` explicitly asks for the interpreted kernel body —
    whenever not on a TPU, which makes the paged ServeLoop on CPU
    bit-identical to the dense one (same decode_attend_q8kv_cur_xla
    math) and fast (interpret mode is orders of magnitude slower)."""
    p, h, page, d = k_codes.shape
    slots, mp = page_table.shape
    _, _, r, _ = q.shape
    on_tpu = _dispatch.on_tpu()
    if (
        r > _QROWS
        or d % 128
        or page % 8
        or (not on_tpu and interpret is not True)
    ):
        return paged_decode_attend_cur_xla(
            k_codes, k_scale, v_codes, v_scale, page_table, lengths, q,
            k_cur, k_cur_scale, v_cur, v_cur_scale,
        )
    if interpret is None:
        interpret = not on_tpu
    q8 = (
        jnp.zeros((slots, h, _QROWS, d), jnp.float32)
        .at[:, :, :r, :]
        .set(q)
    )

    def kv_map(i, j, tbl, lens):
        return (_tail_clamped_page(tbl, lens, i, j, page), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(slots, mp),
        in_specs=[
            pl.BlockSpec((1, h, _QROWS, d), lambda i, j, tbl, lens: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, page, d), kv_map),
            pl.BlockSpec((1, h, 1, page), kv_map),
            pl.BlockSpec((1, h, page, d), kv_map),
            pl.BlockSpec((1, h, 1, page), kv_map),
            pl.BlockSpec((1, h, 1, d), lambda i, j, tbl, lens: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (slots*H,) k_cur_scale
            pl.BlockSpec((1, h, 1, d), lambda i, j, tbl, lens: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (slots*H,) v_cur_scale
        ],
        out_specs=pl.BlockSpec(
            (1, h, _QROWS, d), lambda i, j, tbl, lens: (i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((h, _QROWS, d), jnp.float32),
            pltpu.VMEM((h, _QROWS, 1), jnp.float32),
            pltpu.VMEM((h, _QROWS, 1), jnp.float32),
        ],
    )
    import functools

    out = pl.pallas_call(
        functools.partial(_paged_kernel_cur, heads=h),
        out_shape=jax.ShapeDtypeStruct((slots, h, _QROWS, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * slots * h * (mp * page + 1) * d * 2,
            bytes_accessed=2 * slots * h * mp * page * d
            + 2 * slots * h * mp * page * 4 + slots * h * d * 10,
            transcendentals=slots * h * (mp * page + 1),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        q8, k_codes, k_scale, v_codes, v_scale,
        k_cur.reshape(slots, h, 1, d),
        k_cur_scale.reshape(slots * h).astype(jnp.float32),
        v_cur.reshape(slots, h, 1, d),
        v_cur_scale.reshape(slots * h).astype(jnp.float32),
    )
    return out[:, :, :r, :]


def _gather_dense_batch(codes, scale, page_table):
    """Materialize every slot's logical dense view from the pool: codes
    (P, H, page, D) + scale (P, H, 1, page) gathered by the (slots, MP)
    table -> ((slots*H, S, D) codes, (slots*H, S) scales). The ONE
    pool-to-dense gather both XLA oracles share (a pool-layout change
    has a single place to follow)."""
    slots, mp = page_table.shape
    p, h, page, d = codes.shape
    s = mp * page
    c = jnp.take(codes, page_table, axis=0)  # (slots, mp, H, page, D)
    sc = jnp.take(scale, page_table, axis=0)  # (slots, mp, H, 1, page)
    return (
        c.transpose(0, 2, 1, 3, 4).reshape(slots * h, s, d),
        sc[:, :, :, 0, :].transpose(0, 2, 1, 3).reshape(slots * h, s),
    )


def paged_decode_attend_cur_xla(
    k_codes, k_scale, v_codes, v_scale, page_table, lengths, q,
    k_cur, k_cur_scale, v_cur, v_cur_scale,
) -> jax.Array:
    """Oracle / CPU fallback: gather each slot's dense view, then the
    dense deferred-append oracle — on CPU this makes paged serving
    bit-identical to the dense ServeLoop (same
    ``decode_attend_q8kv_cur_xla`` math on identical inputs)."""
    from .decode_attention import decode_attend_q8kv_cur_xla

    p, h, page, d = k_codes.shape
    slots, mp = page_table.shape
    r = q.shape[2]

    kc, ks = _gather_dense_batch(k_codes, k_scale, page_table)
    vc, vs = _gather_dense_batch(v_codes, v_scale, page_table)
    g = slots * h
    bound = jnp.broadcast_to(lengths[:, None], (slots, h)).reshape(g)
    out = decode_attend_q8kv_cur_xla(
        kc, ks, vc, vs,
        q.reshape(g, r, d).astype(jnp.float32), bound,
        k_cur.reshape(g, d), k_cur_scale.reshape(g).astype(jnp.float32),
        v_cur.reshape(g, d), v_cur_scale.reshape(g).astype(jnp.float32),
    )
    return out.reshape(slots, h, r, d)


def paged_decode_attend_xla(
    k_codes, k_scale, v_codes, v_scale, page_table, lengths, q
) -> jax.Array:
    """Oracle: gather every slot's dense view (shared
    :func:`_gather_dense_batch`), run the dense-oracle math (same
    precision class; the einsum batches rows independently, so per-slot
    results match the previous per-slot loop bit for bit)."""
    from .decode_attention import decode_attend_q8kv_xla

    p, h, page, d = k_codes.shape
    slots, mp = page_table.shape
    r = q.shape[2]
    kc, ks = _gather_dense_batch(k_codes, k_scale, page_table)
    vc, vs = _gather_dense_batch(v_codes, v_scale, page_table)
    g = slots * h
    bound = jnp.broadcast_to(lengths[:, None], (slots, h)).reshape(g)
    out = decode_attend_q8kv_xla(
        kc, ks, vc, vs,
        q.reshape(g, r, d).astype(jnp.float32), bound,
    )
    return out.reshape(slots, h, r, d)
