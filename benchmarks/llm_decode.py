"""Single-layer LLM decode step: W4A16 weights + int8 KV vs bf16.

Llama-3-8B layer shape (dim 4096, 32 heads x 128, MLP 14336), one token
against a 2048-token cache — the BASELINE stretch config measured as a
serving step rather than a lone matmul. Prints one JSON line per variant.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from micronet_tpu.ops.int4_matmul import (
    pack_int4_hl8,
    quantize_int4_weight_grouped,
    wo_linear_grouped_hl8,
)
from micronet_tpu.quant.kv_cache import append_kv, attend, init_kv_cache
from micronet_tpu.utils.timing import per_step_seconds

DIM, HEADS, HEAD_DIM, MLP, SEQ = 4096, 32, 128, 14336, 2048


def build_weights(key):
    ws = {}
    for name, shape in [
        ("wq", (DIM, DIM)), ("wk", (DIM, DIM)), ("wv", (DIM, DIM)),
        ("wo", (DIM, DIM)), ("up", (DIM, MLP)), ("down", (MLP, DIM)),
    ]:
        key, k2 = jax.random.split(key)
        ws[name] = jax.random.normal(k2, shape, jnp.float32) * 0.02
    return ws


def decode_step_w4(params, cache, x):
    """x (1, DIM) -> (1, DIM); packed W4 matmuls + int8 KV attention."""
    def lin(n, h):
        p, s = params[n]
        return wo_linear_grouped_hl8(h, p, s)

    q = lin("wq", x).reshape(1, HEADS, HEAD_DIM).transpose(1, 0, 2)
    k = lin("wk", x).reshape(1, HEADS, HEAD_DIM).transpose(1, 0, 2)
    v = lin("wv", x).reshape(1, HEADS, HEAD_DIM).transpose(1, 0, 2)
    cache = append_kv(cache, k, v)
    att = attend(cache, q).transpose(1, 0, 2).reshape(1, DIM)
    x = x + lin("wo", att)
    return x + lin("down", jax.nn.gelu(lin("up", x))), cache


def decode_step_bf16(ws, kc, vc, x):
    """bf16 weights + bf16 KV baseline (cache pre-filled, same math)."""
    def lin(n, h):
        return (h.astype(jnp.bfloat16) @ ws[n]).astype(jnp.float32)

    q = lin("wq", x).reshape(1, HEADS, HEAD_DIM).transpose(1, 0, 2)
    logits = jnp.einsum("htd,hsd->hts", q, kc.astype(jnp.float32))
    probs = jax.nn.softmax(logits / jnp.sqrt(128.0), axis=-1)
    att = jnp.einsum("hts,hsd->htd", probs, vc.astype(jnp.float32))
    att = att.transpose(1, 0, 2).reshape(1, DIM)
    x = x + lin("wo", att)
    return x + lin("down", jax.nn.gelu(lin("up", x)))


def main():
    key = jax.random.PRNGKey(0)
    ws = build_weights(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, DIM), jnp.float32)

    # W4 + int8 KV
    params = {}
    for n, w in ws.items():
        wq, gs = quantize_int4_weight_grouped(w, 128)
        params[n] = (pack_int4_hl8(wq), gs)
    cache = init_kv_cache(HEADS, SEQ, HEAD_DIM)
    fill_k = jax.random.normal(jax.random.PRNGKey(2), (HEADS, SEQ - 1, HEAD_DIM))
    fill_v = jax.random.normal(jax.random.PRNGKey(3), (HEADS, SEQ - 1, HEAD_DIM))
    cache = append_kv(cache, fill_k, fill_v)

    sec_q = per_step_seconds(
        lambda s, xi: decode_step_w4(s[0], s[1], xi)[0], (params, cache), x,
        iters=256,
    )
    print(json.dumps({"metric": "decode_w4_int8kv", "value": round(sec_q * 1e6, 1),
                      "unit": "us/token-layer"}), flush=True)

    wsb = {n: w.astype(jnp.bfloat16) for n, w in ws.items()}
    kc = fill_k.astype(jnp.bfloat16)
    vc = fill_v.astype(jnp.bfloat16)
    sec_b = per_step_seconds(
        lambda s, xi: decode_step_bf16(s[0], s[1], s[2], xi), (wsb, kc, vc), x,
        iters=256,
    )
    print(json.dumps({"metric": "decode_bf16", "value": round(sec_b * 1e6, 1),
                      "unit": "us/token-layer",
                      "speedup_w4": round(sec_b / sec_q, 2)}), flush=True)


if __name__ == "__main__":
    main()
