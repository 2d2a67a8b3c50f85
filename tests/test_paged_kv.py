"""Paged int8 KV cache: allocation, append-across-pages, dense-view
equivalence with the flat cache, free-list recycling, and attention
through the fused decode kernel (net-new serving layout, VERDICT r3
item 8)."""

import jax
import jax.numpy as jnp
import numpy as np

from micronet_tpu.ops.decode_attention import decode_attend_q8kv
from micronet_tpu.quant.kv_cache import append_kv, init_kv_cache
from micronet_tpu.quant.paged_kv import (
    init_paged_kv,
    paged_append,
    paged_free_slot,
    paged_gather_dense,
    paged_hbm_bytes,
)


def _rand(seed, shape):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def _fill(cache, slot, ks, vs):
    for t in range(ks.shape[1]):
        cache = paged_append(cache, slot, ks[:, t], vs[:, t])
    return cache


def test_paged_matches_dense_cache_codes():
    """Appending the same tokens to the paged and flat caches yields
    bit-identical codes/scales in the dense view (same quantize rule)."""
    h, d, n = 2, 16, 11  # 11 tokens across 3 pages of 4
    ks, vs = _rand(1, (h, n, d)), _rand(2, (h, n, d))
    flat = append_kv(init_kv_cache(h, 16, d), ks, vs)
    paged = init_paged_kv(
        num_pages=8, page_size=4, num_heads=h, head_dim=d,
        slots=2, max_pages_per_slot=4,
    )
    paged = _fill(paged, 0, ks, vs)
    kc, ksc, vc, vsc, length = paged_gather_dense(paged, 0)
    assert int(length) == n
    np.testing.assert_array_equal(
        np.asarray(kc[:, :n]), np.asarray(flat.k_codes[:, :n])
    )
    np.testing.assert_allclose(
        np.asarray(ksc[:, :n]), np.asarray(flat.k_scale[:, :n, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(vc[:, :n]), np.asarray(flat.v_codes[:, :n])
    )


def test_paged_attention_matches_flat():
    """decode attention over the paged dense view == over the flat cache
    (positions past the fill bound masked either way)."""
    h, d, n = 2, 16, 9
    ks, vs = _rand(3, (h, n, d)), _rand(4, (h, n, d))
    flat = append_kv(init_kv_cache(h, 16, d), ks, vs)
    paged = init_paged_kv(8, 4, h, d, slots=1, max_pages_per_slot=4)
    paged = _fill(paged, 0, ks, vs)
    q = _rand(5, (h, d))
    kc, ksc, vc, vsc, length = paged_gather_dense(paged, 0)
    bound = jnp.full((h,), length, jnp.int32)
    out_p = decode_attend_q8kv(kc, ksc, vc, vsc, q, bound)
    out_f = decode_attend_q8kv(
        flat.k_codes, flat.k_scale[..., 0], flat.v_codes,
        flat.v_scale[..., 0], q, bound,
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f), atol=1e-6)


def test_paged_free_list_recycles():
    """Freeing a slot returns its pages; a new slot reuses them and the
    zero page never enters the free list."""
    h, d = 1, 8
    paged = init_paged_kv(5, 2, h, d, slots=2, max_pages_per_slot=2)
    top0 = int(paged.free_top)
    paged = _fill(paged, 0, _rand(6, (h, 4, d)), _rand(7, (h, 4, d)))
    assert int(paged.free_top) == top0 - 2  # two pages consumed
    used = set(int(p) for p in np.asarray(paged.page_table[0]))
    assert 0 not in used
    paged = paged_free_slot(paged, 0)
    assert int(paged.free_top) == top0
    assert int(paged.lengths[0]) == 0
    # recycled pages get overwritten by the next tenant
    paged = _fill(paged, 1, _rand(8, (h, 3, d)), _rand(9, (h, 3, d)))
    kc, ksc, vc, vsc, length = paged_gather_dense(paged, 1)
    assert int(length) == 3
    assert np.asarray(ksc[0, :3]).min() > 0  # real scales, not zero page


def test_paged_hbm_accounting_beats_dense_for_ragged_batch():
    """The economics: 8 slots of max_seq 64 dense vs a pool sized for the
    ACTUAL ragged lengths — pool bytes land well under dense bytes."""
    h, d = 4, 32
    dense_bytes = 8 * (64 * h * d * 2 + 64 * h * 2 * 4)  # codes + scales
    paged = init_paged_kv(
        num_pages=1 + 8 * 2, page_size=8, num_heads=h, head_dim=d,
        slots=8, max_pages_per_slot=8,
    )  # capacity: 8 slots x 2 pages x 8 = 128 live tokens
    assert paged_hbm_bytes(paged) < dense_bytes / 2


def test_paged_attention_kernel_matches_oracle():
    """The REAL paged-attention kernel (page table as scalar prefetch in
    the index_map — no gather, no dense materialization) against the
    gather+dense oracle, ragged lengths across slots, GQA rows."""
    from micronet_tpu.ops.paged_attention import (
        paged_decode_attend,
        paged_decode_attend_xla,
    )

    h, d, r = 2, 128, 4
    page, slots, mp = 8, 3, 4
    paged = init_paged_kv(
        num_pages=1 + slots * mp, page_size=page, num_heads=h, head_dim=d,
        slots=slots, max_pages_per_slot=mp,
    )
    lengths = [29, 8, 17]  # ragged: mid-page, page-aligned, 3rd-page
    for s, n in enumerate(lengths):
        ks, vs = _rand(10 + s, (h, n, d)), _rand(20 + s, (h, n, d))
        paged = _fill(paged, s, ks, vs)
    q = _rand(30, (slots, h, r, d))
    out = paged_decode_attend(
        paged.k_codes, paged.k_scale, paged.v_codes, paged.v_scale,
        paged.page_table, paged.lengths, q, interpret=True,
    )
    ref = paged_decode_attend_xla(
        paged.k_codes, paged.k_scale, paged.v_codes, paged.v_scale,
        paged.page_table, paged.lengths, q,
    )
    assert out.shape == (slots, h, r, d)
    # tiny pages (8) mean one online-softmax rescale per 8 columns — the
    # bf16 probability rounding at block-local normalization accumulates
    # to a few e-3 abs vs the one-shot oracle (production pages are
    # 128+, where this shrinks to the e-4 class measured for the
    # S-blocked kernels)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=5e-3
    )


def test_paged_attention_empty_slot_is_finite():
    from micronet_tpu.ops.paged_attention import paged_decode_attend

    h, d = 1, 128
    paged = init_paged_kv(4, 8, h, d, slots=2, max_pages_per_slot=2)
    paged = _fill(paged, 0, _rand(1, (h, 5, d)), _rand(2, (h, 5, d)))
    q = _rand(3, (2, h, 1, d))
    out = paged_decode_attend(
        paged.k_codes, paged.k_scale, paged.v_codes, paged.v_scale,
        paged.page_table, paged.lengths, q, interpret=True,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-6)
