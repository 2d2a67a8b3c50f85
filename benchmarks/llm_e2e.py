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

MATS = [
    ("wq", DIM, DIM),
    ("wk", DIM, KV_DIM),
    ("wv", DIM, KV_DIM),
    ("wo", DIM, DIM),
    ("gate", DIM, MLP),
    ("up", DIM, MLP),
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
    q = _lin(layer_params, "wq", h).reshape(t, HEADS, HEAD_DIM).transpose(1, 0, 2)
    k = _lin(layer_params, "wk", h).reshape(t, KV_HEADS, HEAD_DIM).transpose(1, 0, 2)
    v = _lin(layer_params, "wv", h).reshape(t, KV_HEADS, HEAD_DIM).transpose(1, 0, 2)
    cache = append_kv(cache, k, v)
    att = attend(cache, q, causal_offset=offset)  # (H, t, D)
    att = att.transpose(1, 0, 2).reshape(t, DIM)
    x = x + _lin(layer_params, "wo", att)
    h2 = _rms(x)
    gated = jax.nn.silu(_lin(layer_params, "gate", h2)) * _lin(
        layer_params, "up", h2
    )
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
    caches = init_caches()
    # warm the cache to a realistic fill (decode attends the whole window)
    fk = jax.random.normal(
        jax.random.PRNGKey(2), (LAYERS, KV_HEADS, SEQ - 8, HEAD_DIM), jnp.bfloat16
    ).astype(jnp.float32)
    caches = jax.vmap(append_kv)(caches, fk, fk)

    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, DIM), jnp.float32)
    sec_tok = per_step_seconds(
        lambda s, xi: step_fn(s[0], s[1], xi, jnp.int32(SEQ - 8))[0],
        (params, caches), x1, iters=32,
    )
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
                "note": "bf16 weights (~14 GB) do not fit one v5e beside cache+activations; W4 does",
                "gqa": f"{HEADS}q/{KV_HEADS}kv",
            }
        ),
        flush=True,
    )

    tp = 128
    xp = jax.random.normal(jax.random.PRNGKey(3), (tp, DIM), jnp.float32)
    fresh = init_caches()
    sec_pre = per_step_seconds(
        lambda s, xi: step_fn(s[0], s[1], xi, jnp.int32(0))[0],
        (params, fresh), xp, iters=8,
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
