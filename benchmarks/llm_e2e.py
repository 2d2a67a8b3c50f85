"""End-to-end Llama-3-8B-SHAPED decode throughput on one chip.

The north star asks for "quantized tokens/s at 1 chip" — this measures a
full 32-layer stack at the real Llama-3-8B attention/MLP geometry
(4096 dim, 32 query heads, GQA with 8 KV heads — wk/wv project to 1024 —
14336 SwiGLU MLP with gate+up+down), every matmul hl8-packed W4 with
group-128 scales and the KV cache int8 with per-(head, position) scales,
S=2048. GQA decode rides the fused kernel's (8, D) query block: the 4
query heads of a KV group share ONE cache read
(ops/decode_attention.py).

Why W4 is the ENABLER and not just an optimization here: 7.0B
body+head params in bf16 is ~14 GB — it does not fit a 16 GB v5e next
to the KV cache and activations. hl8-packed W4 is ~3.3 GB + 160 MB
scales, leaving room for the 135 MB int8 GQA cache; the whole model
decodes on ONE chip.

Semantics are throughput-shaped, not a trained model: random weights,
RMSNorm + causal int8-KV attention (fused decode kernel) + SwiGLU; no
rotary (a per-head elementwise rotate adds nothing to the byte
accounting that dominates decode). Layers run under ``lax.scan`` over
stacked per-layer weights so the whole token step is ONE compiled
program.

Prints JSON rows: decode tokens/s (and per-token ms), prefill tokens/s
at T=128.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from micronet_tpu.ops.int4_matmul import (
    int4_matmul_grouped_hl8,
    int4_matmul_grouped_hl8_xla,
    pack_int4_hl8,
    quantize_int4_weight_grouped,
)
from micronet_tpu.quant.kv_cache import append_kv, attend, init_kv_cache

DIM, HEADS, KV_HEADS, HEAD_DIM = 4096, 32, 8, 128
MLP, LAYERS, SEQ = 14336, 32, 2048
GROUP = 128
KV_DIM = KV_HEADS * HEAD_DIM  # 1024: the GQA projection width

# fused projections — the standard serving layout: one (DIM, q+k+v)
# matmul instead of three, one (DIM, 2*MLP) instead of gate+up. Same
# bytes, 4 kernel launches per layer instead of 7 (launch overhead is
# ~25 us/call through the tunnel, so this is worth ~2-3 ms/token).
MATS = [
    ("wqkv", DIM, DIM + 2 * KV_DIM),
    ("wo", DIM, DIM),
    ("gateup", DIM, 2 * MLP),
    ("down", MLP, DIM),
]


def build_stacked_weights(key, layers=LAYERS):
    """Per-matrix stacked (L, K/2, N) hl8 packs + (L, K/g, N) scales.

    One random base layer quantized once, then broadcast with a cheap
    per-layer int8 perturbation — building 32 independent random layers
    would dominate setup time without changing the byte traffic."""
    params = {}
    for i, (name, k, n) in enumerate(MATS):
        w = jax.random.normal(jax.random.fold_in(key, i), (k, n), jnp.float32)
        w = w * (0.02 if n != MLP else 0.01)
        wq, gs = quantize_int4_weight_grouped(w, GROUP)
        packed = pack_int4_hl8(wq)
        lidx = jnp.arange(layers, dtype=jnp.int8).reshape(layers, 1, 1)
        packs = jnp.broadcast_to(packed, (layers,) + packed.shape) ^ (lidx & 1)
        scales = jnp.broadcast_to(gs, (layers,) + gs.shape)
        params[name] = (packs, scales)
    return params


def _lin(params, name, h):
    p, s = params[name]
    out = (
        int4_matmul_grouped_hl8(h, p, s)
        if jax.default_backend() == "tpu"
        else int4_matmul_grouped_hl8_xla(h, p, s)
    )
    return out


def _rms(x):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + 1e-6)


def _layer_step(layer_params, x, cache, offset, t):
    """One decoder layer over (t, DIM) activations with the int8 cache."""
    h = _rms(x)
    qkv = _lin(layer_params, "wqkv", h)
    q = qkv[:, :DIM].reshape(t, HEADS, HEAD_DIM).transpose(1, 0, 2)
    k = (
        qkv[:, DIM : DIM + KV_DIM]
        .reshape(t, KV_HEADS, HEAD_DIM)
        .transpose(1, 0, 2)
    )
    v = (
        qkv[:, DIM + KV_DIM :]
        .reshape(t, KV_HEADS, HEAD_DIM)
        .transpose(1, 0, 2)
    )
    cache = append_kv(cache, k, v)
    att = attend(cache, q, causal_offset=offset)  # (H, t, D)
    att = att.transpose(1, 0, 2).reshape(t, DIM)
    x = x + _lin(layer_params, "wo", att)
    h2 = _rms(x)
    gu = _lin(layer_params, "gateup", h2)
    gated = jax.nn.silu(gu[:, :MLP]) * gu[:, MLP:]
    return x + _lin(layer_params, "down", gated), cache


def step_fn(params, caches, x, offset):
    """One token (or prefill block) through all LAYERS via lax.scan."""
    t = x.shape[0]

    def body(carry, layer):
        xx = carry
        lp, cache = layer
        xx, cache = _layer_step(lp, xx, cache, offset, t)
        return xx, cache

    x, caches = jax.lax.scan(body, x, (params, caches))
    return _rms(x), caches


def step_fn_unrolled(params_list, caches_list, x, offset):
    """Python-loop variant over PER-LAYER arrays: no (L, ...) stacking,
    so pallas_call consumes each weight buffer directly instead of a
    materialized dynamic-slice copy (lax.scan over stacked weights was
    measured to re-copy every sliced block before the kernel could read
    it — 2x the weight HBM traffic)."""
    t = x.shape[0]
    new_caches = []
    for lp, cache in zip(params_list, caches_list):
        x, cache = _layer_step(lp, x, cache, offset, t)
        new_caches.append(cache)
    return _rms(x), new_caches


def _layer_step_batch(layer_params, x, cache, offsets):
    """One decoder layer over a (B, DIM) batch of SINGLE tokens — the
    continuous-batching decode shape. Projections run once at M=B (the
    weight read amortizes over the batch); attention folds B into the
    fused kernel's grid (G = B*KV_HEADS, per-slot bounds in SMEM)."""
    from micronet_tpu.ops.decode_attention import decode_attend_q8kv_cur
    from micronet_tpu.quant.kv_cache import (
        append_kv_batch_quantized,
        quantize_kv_rows,
    )

    b = x.shape[0]
    h = _rms(x)
    qkv = _lin(layer_params, "wqkv", h)
    q = qkv[:, :DIM].reshape(b, HEADS, HEAD_DIM)
    k = qkv[:, DIM : DIM + KV_DIM].reshape(b, KV_HEADS, HEAD_DIM)
    v = qkv[:, DIM + KV_DIM :].reshape(b, KV_HEADS, HEAD_DIM)
    # deferred append (models/llama.py step_batch): attend over the
    # pre-append cache + the current rows as a kernel operand; the
    # scatter-append only feeds the NEXT step, so it aliases the carry
    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    r = HEADS // KV_HEADS
    g = b * KV_HEADS
    bound = jnp.minimum(cache.length, offsets)
    att = decode_attend_q8kv_cur(
        cache.k_codes.reshape(g, SEQ, HEAD_DIM),
        cache.k_scale.reshape(g, SEQ),
        cache.v_codes.reshape(g, SEQ, HEAD_DIM),
        cache.v_scale.reshape(g, SEQ),
        q.reshape(b, KV_HEADS, r, HEAD_DIM).reshape(g, r, HEAD_DIM),
        jnp.broadcast_to(bound[:, None], (b, KV_HEADS)).reshape(g),
        kq.reshape(g, HEAD_DIM), ks.reshape(g),
        vq.reshape(g, HEAD_DIM), vs.reshape(g),
    )  # (B*KV, r, D)
    cache = append_kv_batch_quantized(cache, kq, ks[..., 0], vq, vs[..., 0])
    x = x + _lin(layer_params, "wo", att.reshape(b, DIM))
    h2 = _rms(x)
    gu = _lin(layer_params, "gateup", h2)
    gated = jax.nn.silu(gu[:, :MLP]) * gu[:, MLP:]
    return x + _lin(layer_params, "down", gated), cache


def step_fn_batch_unrolled(params_list, caches_list, x, offsets):
    """One batched token step through all LAYERS (per-layer weights,
    Python loop — the measured-fast layout, see step_fn_unrolled)."""
    new_caches = []
    for lp, cache in zip(params_list, caches_list):
        x, cache = _layer_step_batch(lp, x, cache, offsets)
        new_caches.append(cache)
    return _rms(x), new_caches


def carried_decode_seconds(step, state, caches, x, *, iters=32, trials=5):
    """Slope-timed decode step with the KV caches THREADED THROUGH the
    scan carry. per_step_seconds closes over the caches as a scan
    invariant, so every iteration must materialize a fresh copy of the
    appended cache buffers (the invariant is read again next iteration —
    in-place is illegal): the measured step silently includes a full
    cache copy (134 MB/slot). A production serving loop donates the
    cache and appends in place; carrying the caches reproduces that —
    XLA aliases scan carries, so the append is a true in-place
    1-position write. The append position stays fixed across iterations
    (overwrite, no overflow); each iteration's attend reads the carried
    cache, so nothing dead-codes."""
    import time as _time

    import numpy as np

    def make(k):
        @jax.jit
        def run(state, caches, x, seed):
            def body(carry, i):
                acc, cs = carry
                xi = x * (1.0 + 1e-12 * acc) + seed.astype(jnp.float32) * 1e-6
                y, cs = step(state, cs, xi)
                return (jnp.float32(jnp.sum(y)), cs), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.float32(0), caches), jnp.arange(k)
            )
            return acc

        return run

    ks = (max(2, iters // 4), iters)
    runners = {k: make(k) for k in ks}
    for k in ks:
        np.asarray(runners[k](state, caches, x, jnp.int32(0)))

    def timed(k, seed):
        t0 = _time.perf_counter()
        np.asarray(runners[k](state, caches, x, jnp.int32(seed)))
        return _time.perf_counter() - t0

    slopes = []
    for trial in range(trials):
        ts = timed(ks[0], 1000 + trial)
        tl = timed(ks[1], 2000 + trial)
        slopes.append((tl - ts) / (ks[1] - ks[0]))
    slopes.sort()
    return max(slopes[len(slopes) // 2], 1e-9)


def init_caches(layers=LAYERS):
    one = init_kv_cache(KV_HEADS, SEQ, HEAD_DIM)
    return jax.tree.map(
        lambda l: jnp.broadcast_to(l, (layers,) + l.shape).copy(), one
    )


def _assert_gqa_kernel_vs_oracle():
    """On-device numerics gate: the fused GQA decode kernel must match its
    XLA oracle at a kernel-eligible shape before the timed run."""
    import numpy as np

    from micronet_tpu.ops.decode_attention import (
        decode_attend_q8kv,
        decode_attend_q8kv_xla,
    )

    g, r, s, d = 8, 4, 128, 128
    cache = init_kv_cache(g, s, d)
    k = jax.random.normal(jax.random.PRNGKey(7), (g, s - 5, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(8), (g, s - 5, d), jnp.float32)
    cache = append_kv(cache, k, v)
    q = jax.random.normal(jax.random.PRNGKey(9), (g, r, d), jnp.float32)
    bound = jnp.full((g,), s - 5, jnp.int32)
    args = (
        cache.k_codes, cache.k_scale.reshape(g, s),
        cache.v_codes, cache.v_scale.reshape(g, s), q, bound,
    )
    out = np.asarray(decode_attend_q8kv(*args))
    ref = np.asarray(decode_attend_q8kv_xla(*args))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-3)


def main():
    from micronet_tpu.utils.timing import per_step_seconds

    _assert_gqa_kernel_vs_oracle()
    key = jax.random.PRNGKey(0)
    params = build_stacked_weights(key)
    n_bytes = sum(
        p.size * p.dtype.itemsize + s.size * s.dtype.itemsize
        for p, s in params.values()
    )
    # per-layer views for the unrolled step (the measured-fast layout)
    params_list = [
        {n: (p[i], s[i]) for n, (p, s) in params.items()} for i in range(LAYERS)
    ]
    caches = init_caches()
    # warm the cache to a realistic fill (decode attends the whole window)
    fk = jax.random.normal(
        jax.random.PRNGKey(2), (LAYERS, KV_HEADS, SEQ - 8, HEAD_DIM), jnp.bfloat16
    ).astype(jnp.float32)
    caches = jax.vmap(append_kv)(caches, fk, fk)
    caches_list = [jax.tree.map(lambda l: l[i], caches) for i in range(LAYERS)]

    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, DIM), jnp.float32)
    sec_tok = per_step_seconds(
        lambda s, xi: step_fn_unrolled(s[0], s[1], xi, jnp.int32(SEQ - 8))[0],
        (params_list, caches_list), x1, iters=32,
    )
    sec_scan = per_step_seconds(
        lambda s, xi: step_fn(s[0], s[1], xi, jnp.int32(SEQ - 8))[0],
        (params, caches), x1, iters=32,
    )
    # achievable bound: every weight byte read once at the measured
    # ~700 GB/s read stream (bench.py hbm_read_gbps_measured)
    bound = n_bytes / 700e9
    print(
        json.dumps(
            {
                "metric": "llm8b_w4_decode",
                "value": round(1.0 / sec_tok, 1),
                "unit": "tokens/s/chip",
                "ms_per_token": round(sec_tok * 1e3, 2),
                "weight_gb": round(n_bytes / 2**30, 2),
                "layers": LAYERS,
                "seq": SEQ,
                "frac_of_weight_read_bound": round(bound / sec_tok, 2),
                "ms_per_token_scan_stacked": round(sec_scan * 1e3, 2),
                "note": (
                    "bf16 weights (~14 GB) do not fit one v5e beside "
                    "cache+activations; W4 does. scan_stacked = lax.scan "
                    "over (L,...) weights, which pays a materialized "
                    "dynamic-slice copy per layer (docs/design.md)"
                ),
                "gqa": f"{HEADS}q/{KV_HEADS}kv",
            }
        ),
        flush=True,
    )

    # in-place-append variant of the B=1 step (production serving
    # semantics: the cache is donated/carried, so the append writes ONE
    # position instead of copying the 134 MB cache every step)
    def _b1_step(state, cs, xi):
        y, cs2 = step_fn_unrolled(state, cs, xi, jnp.int32(SEQ - 8))
        cs2 = [c.replace(length=c0.length) for c, c0 in zip(cs2, caches_list)]
        return y, cs2

    sec_tok_ip = carried_decode_seconds(
        _b1_step, params_list, caches_list, x1, iters=32
    )
    print(
        json.dumps(
            {
                "metric": "llm8b_w4_decode_inplace",
                "value": round(1.0 / sec_tok_ip, 1),
                "unit": "tokens/s/chip",
                "ms_per_token": round(sec_tok_ip * 1e3, 2),
                "frac_of_weight_read_bound": round(bound / sec_tok_ip, 2),
                "note": (
                    "caches carried through the scan (XLA aliases the "
                    "carry -> true in-place append); llm8b_w4_decode "
                    "keeps the cache as a scan invariant and therefore "
                    "pays a full 134 MB cache copy per step"
                ),
            }
        ),
        flush=True,
    )

    # continuous-batching decode: tokens/s/chip at B slots. Decode is
    # weight-read-bound, so the batch amortizes the 3.45 GB weight read —
    # only the per-slot cache read (134 MB/slot/token) scales with B.
    del caches, caches_list
    cache_bytes = 0
    for b in (8, 16):
        caches_b = [None] * LAYERS
        one = init_kv_cache(KV_HEADS, SEQ, HEAD_DIM)
        fill_k = jax.random.normal(
            jax.random.PRNGKey(4), (KV_HEADS, SEQ - 8, HEAD_DIM), jnp.float32
        )
        one = append_kv(one, fill_k, fill_k)
        for i in range(LAYERS):
            caches_b[i] = jax.tree.map(
                lambda l: jnp.broadcast_to(l, (b,) + l.shape).copy(), one
            )
        cache_bytes = sum(
            l.size * l.dtype.itemsize for l in jax.tree.leaves(caches_b[0])
        ) * LAYERS
        xb = jax.random.normal(jax.random.PRNGKey(5), (b, DIM), jnp.float32)
        offs = jnp.full((b,), SEQ - 8, jnp.int32)
        lens0 = [c.length for c in caches_b]

        def _bstep(state, cs, xi, _lens0=lens0):
            y, cs2 = step_fn_batch_unrolled(state[0], cs, xi, state[1])
            cs2 = [c.replace(length=l0) for c, l0 in zip(cs2, _lens0)]
            return y, cs2

        sec_b = carried_decode_seconds(
            _bstep, (params_list, offs), caches_b, xb, iters=24,
        )
        bound_b = (n_bytes + cache_bytes) / 700e9
        print(
            json.dumps(
                {
                    "metric": f"llm8b_w4_decode_b{b}",
                    "value": round(b / sec_b, 1),
                    "unit": "tokens/s/chip",
                    "ms_per_step": round(sec_b * 1e3, 2),
                    "batch": b,
                    "frac_of_read_bound": round(bound_b / sec_b, 2),
                    "note": (
                        "continuous-batching decode fast path: M=B "
                        "projections + batch folded into the attention "
                        "kernel grid (Llama.decode_batch); caches "
                        "carried (in-place append)"
                    ),
                }
            ),
            flush=True,
        )
        del caches_b

    tp = 128
    xp = jax.random.normal(jax.random.PRNGKey(3), (tp, DIM), jnp.float32)
    fresh = init_caches()
    fresh_list = [jax.tree.map(lambda l: l[i], fresh) for i in range(LAYERS)]
    sec_pre = per_step_seconds(
        lambda s, xi: step_fn_unrolled(s[0], s[1], xi, jnp.int32(0))[0],
        (params_list, fresh_list), xp, iters=8,
    )
    print(
        json.dumps(
            {
                "metric": "llm8b_w4_prefill",
                "value": round(tp / sec_pre, 1),
                "unit": "tokens/s/chip",
                "ms_per_block": round(sec_pre * 1e3, 2),
                "block_tokens": tp,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
