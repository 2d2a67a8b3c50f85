"""Fused int8-KV decode attention + hl8 W4 kernels (round-3 decode path).

On the CPU test backend the grouped hl8 matmul runs the REAL kernel in
Pallas interpret mode, and decode_attend_q8kv routes to its XLA oracle —
the TPU kernel is asserted against that same oracle on-device by
benchmarks/llm_decode.py and the driver bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micronet_tpu.ops.decode_attention import decode_attend_q8kv, decode_attend_q8kv_xla
from micronet_tpu.ops.int4_matmul import (
    int4_matmul_grouped_hl8,
    int4_matmul_grouped_hl8_xla,
    pack_int4_hl8,
    quantize_int4_weight_grouped,
    unpack_int4_hl8,
)
from micronet_tpu.quant.kv_cache import append_kv, attend, init_kv_cache


def _rand(seed, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * scale


def test_hl8_roundtrip_exhaustive():
    codes = jnp.arange(-8, 8, dtype=jnp.int8)
    # every (low, high) nibble combination appears in some byte
    low = jnp.tile(codes[:, None], (1, 16))
    high = jnp.tile(codes[None, :], (16, 1))
    w_q = jnp.concatenate([low, high], axis=0)  # (32, 16)
    assert (unpack_int4_hl8(pack_int4_hl8(w_q)) == w_q).all()


def test_hl8_byte_identity():
    # the stored byte's SIGNED value must be 16*q_high + (q_low + 8)
    w_q = jnp.array([[-8], [7]], jnp.int8)  # low=-8 (rows 0..K/2), high=7
    b = pack_int4_hl8(w_q)
    assert int(b[0, 0]) == 16 * 7 + (-8 + 8)


@pytest.mark.parametrize("m", [1, 3, 16])
@pytest.mark.parametrize("k,n,g", [(256, 128, 64), (512, 384, 128)])
def test_hl8_grouped_matmul_matches_oracle_and_f32(m, k, n, g):
    w = _rand(1, (k, n), 0.05)
    x = _rand(0, (m, k))
    w_q, gs = quantize_int4_weight_grouped(w, g)
    ph = pack_int4_hl8(w_q)
    out = int4_matmul_grouped_hl8(x, ph, gs)  # interpret-mode kernel on CPU
    orc = int4_matmul_grouped_hl8_xla(x, ph, gs)
    ref = x @ (w_q.astype(jnp.float32) * jnp.repeat(gs, g, 0))
    mag = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(out), np.asarray(orc), rtol=0, atol=1e-4 * mag)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2 * mag)


def test_hl8_negative_codes_cover_minus8():
    # force q = -8 codes (absmax at qmax=7 never emits -8; build manually)
    k, n, g = 128, 128, 64
    w_q = jnp.full((k, n), -8, jnp.int8).at[5:9].set(3)
    gs = jnp.full((k // g, n), 0.01, jnp.float32)
    x = _rand(2, (2, k))
    out = int4_matmul_grouped_hl8(x, pack_int4_hl8(w_q), gs)
    ref = x @ (w_q.astype(jnp.float32) * jnp.repeat(gs, g, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-3)


def test_decode_attend_oracle_matches_f32_reference():
    h, s, d = 4, 64, 32
    cache = append_kv(init_kv_cache(h, s, d), _rand(1, (h, 41, d)), _rand(2, (h, 41, d)))
    q = _rand(3, (h, d))
    bound = jnp.full((h,), 41, jnp.int32)
    out = decode_attend_q8kv(
        cache.k_codes, cache.k_scale.reshape(h, s), cache.v_codes,
        cache.v_scale.reshape(h, s), q, bound,
    )
    kf, vf = cache.dequant_k(), cache.dequant_v()
    logits = jnp.einsum("hd,hsd->hs", q, kf) / np.sqrt(d)
    logits = jnp.where(jnp.arange(s)[None] < 41, logits, -1e30)
    ref = jnp.einsum("hs,hsd->hd", jax.nn.softmax(logits, -1), vf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_decode_attend_respects_per_head_bounds():
    """Filled positions beyond each head's bound must not leak."""
    h, s, d = 2, 32, 16
    cache = append_kv(init_kv_cache(h, s, d), _rand(4, (h, s, d)), _rand(5, (h, s, d)))
    # poison positions >= 10 of head 0 with huge values
    kc = cache.k_codes.at[0, 10:].set(127)
    ks = cache.k_scale.at[0, 10:].set(1e6)
    q = _rand(6, (h, d))
    bound = jnp.array([10, s], jnp.int32)
    out = decode_attend_q8kv(
        kc, ks.reshape(h, s), cache.v_codes, cache.v_scale.reshape(h, s), q, bound
    )
    # the unpoisoned cache must give the identical head-0 answer: poisoned
    # positions sit beyond head 0's bound
    clean = decode_attend_q8kv(
        cache.k_codes, cache.k_scale.reshape(h, s), cache.v_codes,
        cache.v_scale.reshape(h, s), q, bound,
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(clean[0]), rtol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_attend_gqa_matches_f32_reference():
    """(G, R, D) grouped queries: every query row of a group attends the
    group's cache — matches the per-row f32 reference."""
    g, r, s, d = 2, 4, 32, 16
    cache = append_kv(init_kv_cache(g, s, d), _rand(1, (g, 21, d)), _rand(2, (g, 21, d)))
    q = _rand(3, (g, r, d))
    bound = jnp.full((g,), 21, jnp.int32)
    out = decode_attend_q8kv(
        cache.k_codes, cache.k_scale.reshape(g, s), cache.v_codes,
        cache.v_scale.reshape(g, s), q, bound,
    )
    assert out.shape == (g, r, d)
    kf, vf = cache.dequant_k(), cache.dequant_v()
    logits = jnp.einsum("grd,gsd->grs", q, kf) / np.sqrt(d)
    logits = jnp.where(jnp.arange(s)[None, None] < 21, logits, -1e30)
    ref = jnp.einsum("grs,gsd->grd", jax.nn.softmax(logits, -1), vf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_attend_gqa_matches_repeated_cache():
    """attend() with r*H query heads == attend() with the cache's KV
    explicitly repeated per query head — decode (fused path) and prefill
    (XLA path) both."""
    h, r, s, d = 2, 3, 16, 8
    k, v = _rand(7, (h, 6, d)), _rand(8, (h, 6, d))
    cache = append_kv(init_kv_cache(h, s, d), k, v)
    rep = append_kv(
        init_kv_cache(h * r, s, d), jnp.repeat(k, r, 0), jnp.repeat(v, r, 0)
    )
    for t, off in ((1, jnp.int32(5)), (2, jnp.int32(4))):
        q = _rand(9 + t, (h * r, t, d))
        np.testing.assert_allclose(
            np.asarray(attend(cache, q, causal_offset=off)),
            np.asarray(attend(rep, q, causal_offset=off)),
            rtol=2e-2, atol=1e-3,
        )


def test_attend_t1_dispatch_matches_prefill_row():
    """attend(T=1) (fused path) ~= the last row of a T=2 prefill attend
    (f32 path) at bf16-operand tolerance — the dispatch seam is sound."""
    h, s, d = 2, 16, 8
    k, v = _rand(7, (h, 5, d)), _rand(8, (h, 5, d))
    cache = append_kv(init_kv_cache(h, s, d), k, v)
    q = _rand(9, (h, 2, d))
    full = attend(cache, q, causal_offset=jnp.int32(3))
    one = attend(cache, q[:, 1:], causal_offset=jnp.int32(4))
    np.testing.assert_allclose(
        np.asarray(full[:, 1:]), np.asarray(one), rtol=2e-2, atol=1e-3
    )


def test_attend_t1_zero_length_is_finite():
    h, s, d = 1, 8, 4
    cache = init_kv_cache(h, s, d)
    out = attend(cache, _rand(1, (h, 1, d)))
    assert np.isfinite(np.asarray(out)).all()


def test_blocked_kernel_matches_oracle_s8192():
    """The S-blocked online-softmax kernel (long-context serving path,
    S=8k) against the XLA oracle — the REAL kernel body in interpret
    mode, ragged per-head fill levels crossing block boundaries."""
    import pytest

    from micronet_tpu.ops.decode_attention import decode_attend_q8kv_blocked

    g, s, d = 2, 8192, 128
    fill = 6000
    cache = append_kv(
        init_kv_cache(g, s, d), _rand(1, (g, fill, d)), _rand(2, (g, fill, d))
    )
    q = _rand(3, (g, d))
    # ragged bounds: one mid-block, one block-aligned
    bound = jnp.asarray([5555, 4096], jnp.int32)
    out = decode_attend_q8kv_blocked(
        cache.k_codes, cache.k_scale.reshape(g, s), cache.v_codes,
        cache.v_scale.reshape(g, s), q, bound, block_s=1024, interpret=True,
    )
    ref = decode_attend_q8kv_xla(
        cache.k_codes, cache.k_scale.reshape(g, s), cache.v_codes,
        cache.v_scale.reshape(g, s), q, bound,
    )
    # measured bound: the online-softmax rescale rounds (p * vs) to bf16
    # at block-local normalization, so blocked vs one-shot differ by
    # a few e-4 abs (well under the ~1% the int8 KV quantization itself
    # introduces vs f32 attention)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-3
    )


def test_blocked_kernel_gqa_and_empty_head():
    """GQA query rows + a zero-fill head (whole cache masked): the online
    softmax must stay finite and match the oracle."""
    from micronet_tpu.ops.decode_attention import decode_attend_q8kv_blocked

    g, r, s, d = 2, 4, 2048, 128
    cache = append_kv(
        init_kv_cache(g, s, d), _rand(4, (g, 1500, d)), _rand(5, (g, 1500, d))
    )
    q = _rand(6, (g, r, d))
    bound = jnp.asarray([1500, 0], jnp.int32)  # head 1: nothing visible
    out = decode_attend_q8kv_blocked(
        cache.k_codes, cache.k_scale.reshape(g, s), cache.v_codes,
        cache.v_scale.reshape(g, s), q, bound, block_s=512, interpret=True,
    )
    assert out.shape == (g, r, d)
    assert np.isfinite(np.asarray(out)).all()
    ref = decode_attend_q8kv_xla(
        cache.k_codes, cache.k_scale.reshape(g, s), cache.v_codes,
        cache.v_scale.reshape(g, s), q, bound,
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), rtol=0, atol=1e-3
    )
    # fully-masked head: oracle divides 0/denom-floor -> zeros; kernel same
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-6)


def test_blocked_cur_kernel_matches_cur_oracle():
    """The S-blocked deferred-append kernel (decode_batch at S=8k)
    against the whole-cache cur oracle."""
    from micronet_tpu.ops.decode_attention import (
        decode_attend_q8kv_blocked_cur,
        decode_attend_q8kv_cur_xla,
    )
    from micronet_tpu.quant.kv_cache import quantize_kv_rows

    g, s, d = 2, 4096, 128
    fill = 3000
    cache = append_kv(
        init_kv_cache(g, s, d), _rand(1, (g, fill, d)), _rand(2, (g, fill, d))
    )
    q = _rand(3, (g, 4, d))  # GQA rows
    kcur, kcs = quantize_kv_rows(_rand(7, (g, d)))
    vcur, vcs = quantize_kv_rows(_rand(8, (g, d)))
    bound = jnp.asarray([3000, 1537], jnp.int32)
    args = (
        cache.k_codes, cache.k_scale.reshape(g, s), cache.v_codes,
        cache.v_scale.reshape(g, s), q, bound,
        kcur, kcs[:, 0], vcur, vcs[:, 0],
    )
    out = decode_attend_q8kv_blocked_cur(*args, block_s=512, interpret=True)
    ref = decode_attend_q8kv_cur_xla(*args)
    # same measured bound as the blocked-vs-one-shot comparison above
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-3
    )
