"""Llama-3-8B-geometry PAGED continuous-batching decode vs the dense
batched cache — the serving-level proof of the paged path (round 5).

Reuses llm_e2e's W4 stack (32 layers, fused projections, hl8 group-128
weights) and measures one batched decode step at B=8 slots:

- DENSE: per-slot (B, H, S, D) caches + decode_attend_q8kv_cur — the
  round-4 serving fast path (slots * max_seq rows reserved per layer).
- PAGED: per-layer page pools (page=512) + paged_decode_attend_cur +
  active-masked paged_append_batch — HBM holds only the pages live
  requests actually filled.

Both are measured with the caches THREADED THROUGH a scan carry (XLA
aliases the append in place — the production serving loop's dataflow;
see llm_e2e.carried_decode_seconds). Ragged fill: slots at
2040/512/256/128*5 rows — the paged pool stores ~23% of the dense rows.

Prints JSON rows: paged tokens/s, dense tokens/s, ratio, KV HBM bytes.

Run:  python benchmarks/llm_paged_e2e.py   (TPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import llm_e2e as E
from micronet_tpu.ops.paged_attention import paged_decode_attend_cur
from micronet_tpu.quant.kv_cache import (
    init_kv_cache,
    kv_cache_bytes,
    quantize_kv_rows,
)
from micronet_tpu.quant.paged_kv import (
    init_paged_kv,
    paged_append_batch,
    paged_hbm_bytes,
    paged_insert_from_dense,
)

B = 8
PAGE = 512
MP = E.SEQ // PAGE
RAGGED = [E.SEQ - 8, 512, 256, 128, 128, 128, 128, 128]


def _layer_step_batch_paged(layer_params, x, cache, offsets, active):
    """llm_e2e._layer_step_batch with the KV read/append on the paged
    pool (mirrors models/llama.py step_batch_paged)."""
    b = x.shape[0]
    h = E._rms(x)
    qkv = E._lin(layer_params, "wqkv", h)
    q = qkv[:, : E.DIM].reshape(b, E.HEADS, E.HEAD_DIM)
    k = qkv[:, E.DIM : E.DIM + E.KV_DIM].reshape(b, E.KV_HEADS, E.HEAD_DIM)
    v = qkv[:, E.DIM + E.KV_DIM :].reshape(b, E.KV_HEADS, E.HEAD_DIM)
    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    r = E.HEADS // E.KV_HEADS
    bound = jnp.minimum(cache.lengths, offsets)
    att = paged_decode_attend_cur(
        cache.k_codes, cache.k_scale, cache.v_codes, cache.v_scale,
        cache.page_table, bound,
        q.reshape(b, E.KV_HEADS, r, E.HEAD_DIM).astype(jnp.float32),
        kq, ks[..., 0], vq, vs[..., 0],
    )
    cache = paged_append_batch(cache, kq, ks[..., 0], vq, vs[..., 0], active)
    x = x + E._lin(layer_params, "wo", att.reshape(b, E.DIM))
    h2 = E._rms(x)
    gu = E._lin(layer_params, "gateup", h2)
    gated = jax.nn.silu(gu[:, : E.MLP]) * gu[:, E.MLP :]
    return x + E._lin(layer_params, "down", gated), cache


def step_paged(params_list, caches_list, x, offsets, active):
    new_caches = []
    for lp, cache in zip(params_list, caches_list):
        x, cache = _layer_step_batch_paged(lp, x, cache, offsets, active)
        new_caches.append(cache)
    return E._rms(x), new_caches


def main():
    key = jax.random.PRNGKey(0)
    params = E.build_stacked_weights(key)
    params_list = [
        {n: (p[i], s[i]) for n, (p, s) in params.items()}
        for i in range(E.LAYERS)
    ]
    offsets = jnp.asarray(RAGGED, jnp.int32)
    active = jnp.ones((B,), bool)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, E.DIM), jnp.float32)

    # dense batched caches: (B, H, S, D) per layer, filled to RAGGED
    def fill_dense():
        one = init_kv_cache(E.KV_HEADS, E.SEQ, E.HEAD_DIM)
        batched = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (B,) + l.shape).copy(), one
        )
        fk = jax.random.normal(
            jax.random.PRNGKey(2), (B, E.KV_HEADS, E.SEQ, E.HEAD_DIM),
            jnp.bfloat16,
        ).astype(jnp.float32)
        kq, kscale = quantize_kv_rows(fk)
        return batched.replace(
            k_codes=kq, k_scale=kscale, v_codes=kq, v_scale=kscale,
            length=offsets,
        )

    dense0 = fill_dense()
    dense_list = [dense0 for _ in range(E.LAYERS)]

    # paged pools: pages for the RAGGED rows + decode growth headroom
    need = sum(-(-ln // PAGE) for ln in RAGGED)
    pool0 = init_paged_kv(
        1 + need + B, PAGE, E.KV_HEADS, E.HEAD_DIM, B, MP
    )
    dense_single = fill_dense()
    for slot in range(B):
        pool0 = paged_insert_from_dense(
            pool0, slot,
            dense_single.k_codes[slot],
            dense_single.k_scale[slot, :, :, 0],
            dense_single.v_codes[slot],
            dense_single.v_scale[slot, :, :, 0],
            jnp.int32(RAGGED[slot]),
        )
    paged_list = [pool0 for _ in range(E.LAYERS)]

    def dense_step(state, caches, xi):
        return E.step_fn_batch_unrolled(state, caches, xi, offsets)

    def paged_step(state, caches, xi):
        return step_paged(state, caches, xi, offsets, active)

    sec_dense = E.carried_decode_seconds(
        dense_step, params_list, dense_list, x, iters=16, trials=3
    )
    sec_paged = E.carried_decode_seconds(
        paged_step, params_list, paged_list, x, iters=16, trials=3
    )
    dense_bytes = E.LAYERS * kv_cache_bytes(dense0)
    pool_bytes = E.LAYERS * paged_hbm_bytes(pool0)
    for row in (
        {
            "metric": "llm8b_paged_decode_b8",
            "value": round(B / sec_paged, 1),
            "unit": "tokens/s/chip (B=8 ragged)",
            "ms_per_step": round(sec_paged * 1e3, 2),
            "kv_hbm_mb": round(pool_bytes / 2**20, 1),
            "round": 5,
        },
        {
            "metric": "llm8b_dense_decode_b8",
            "value": round(B / sec_dense, 1),
            "unit": "tokens/s/chip (B=8 ragged)",
            "ms_per_step": round(sec_dense * 1e3, 2),
            "kv_hbm_mb": round(dense_bytes / 2**20, 1),
            "round": 5,
        },
        {
            "metric": "llm8b_paged_vs_dense",
            "value": round(sec_dense / sec_paged, 3),
            "unit": "x (>=1: paged at least as fast)",
            "kv_hbm_ratio": round(pool_bytes / dense_bytes, 3),
            "round": 5,
        },
    ):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
