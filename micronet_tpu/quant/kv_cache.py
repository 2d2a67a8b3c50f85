"""Int8 KV-cache quantization for LLM decode (net-new vs the reference).

SURVEY.md §5 marks long-context work as net-new, built on the same
shape-polymorphic quantizer axes: the KV cache is the decode-path HBM
bottleneck (every generated token re-reads the whole cache), so storing
it as int8 codes + per-(head, position) scales halves/quarters the read
traffic vs bf16/f32 at negligible accuracy cost — the per-vector scale is
exactly the reference's per-channel observer idea
(iao/quantize.py:27-30) applied along the sequence axis.

Everything is functional state (struct.dataclass pytrees) so the cache
threads through ``lax.scan``/``jax.jit`` decode loops and checkpoints as
plain data. Quantization is symmetric absmax/127 per (layer, head,
position) vector at APPEND time — one pass, no calibration needed,
matching production int8-KV serving stacks.

Layout: (num_heads, max_seq, head_dim) codes int8 per layer, scales
(num_heads, max_seq, 1) f32. Attention dequantizes inside the jit —
XLA fuses the int8→f32 convert + scale multiply into the matmul
prologue, so the HBM win is realized without a custom kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "QuantKVCache",
    "init_kv_cache",
    "append_kv",
    "append_kv_batch_quantized",
    "quantize_kv_rows",
    "attend",
    "kv_cache_bytes",
]


def _quantize_vec(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 over the last axis: (..., D) -> codes int8 + scale
    (..., 1) f32. Round half away from zero (quantizers.py convention)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8).astype(jnp.float32)
    r = x.astype(jnp.float32) / scale
    q = jnp.sign(r) * jnp.floor(jnp.abs(r) + 0.5)
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


@struct.dataclass
class QuantKVCache:
    """One layer's quantized KV cache (static max length, fill pointer)."""

    k_codes: jax.Array  # (H, S, D) int8
    k_scale: jax.Array  # (H, S, 1) f32
    v_codes: jax.Array  # (H, S, D) int8
    v_scale: jax.Array  # (H, S, 1) f32
    length: jax.Array  # scalar int32 fill pointer

    @property
    def max_seq(self) -> int:
        return self.k_codes.shape[1]

    def dequant_k(self) -> jax.Array:
        return self.k_codes.astype(jnp.float32) * self.k_scale

    def dequant_v(self) -> jax.Array:
        return self.v_codes.astype(jnp.float32) * self.v_scale


def init_kv_cache(
    num_heads: int, max_seq: int, head_dim: int
) -> QuantKVCache:
    return QuantKVCache(
        k_codes=jnp.zeros((num_heads, max_seq, head_dim), jnp.int8),
        k_scale=jnp.zeros((num_heads, max_seq, 1), jnp.float32),
        v_codes=jnp.zeros((num_heads, max_seq, head_dim), jnp.int8),
        v_scale=jnp.zeros((num_heads, max_seq, 1), jnp.float32),
        length=jnp.zeros((), jnp.int32),
    )


def append_kv(
    cache: QuantKVCache, k: jax.Array, v: jax.Array
) -> QuantKVCache:
    """Quantize-and-append ``k``/``v`` of shape (H, T, D) at the fill
    pointer (T static, typically 1 for decode or the prompt length for
    prefill). Static shapes + dynamic_update_slice — scan/jit friendly."""
    kq, ks = _quantize_vec(k)
    vq, vs = _quantize_vec(v)
    i = cache.length
    upd = lambda buf, val: jax.lax.dynamic_update_slice(
        buf, val, (0, i, 0)
    )
    return QuantKVCache(
        k_codes=upd(cache.k_codes, kq),
        k_scale=upd(cache.k_scale, ks),
        v_codes=upd(cache.v_codes, vq),
        v_scale=upd(cache.v_scale, vs),
        length=i + k.shape[1],
    )


def quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Public row quantizer: (..., D) -> (codes int8, scale (..., 1) f32).
    The same symmetric absmax/127 rule :func:`append_kv` applies — used by
    the deferred-append decode path to quantize the current token's K/V
    once, feed the codes to the attention kernel, AND scatter them into
    the cache (so kernel column and cached column are bit-identical)."""
    return _quantize_vec(x)


def append_kv_batch_quantized(
    cache: QuantKVCache,  # batched: leaves (B, H, S, D), length (B,)
    k_codes: jax.Array,  # (B, H, D) int8 — pre-quantized current rows
    k_scale: jax.Array,  # (B, H) f32
    v_codes: jax.Array,  # (B, H, D) int8
    v_scale: jax.Array,  # (B, H) f32
) -> QuantKVCache:
    """Per-slot single-token append on a BATCHED cache, each slot at its
    own fill pointer, via one unique/sorted scatter per buffer.

    This is the serving fast path's append: ``vmap(append_kv)`` lowers
    the per-slot dynamic_update_slice to a general scatter whose output,
    when consumed by the attention kernel in the same step, forces XLA
    to materialize a full copy of the cache buffers (measured ~0.4
    ms/slot at the Llama-8B shape). Here the attention kernel reads the
    PRE-append cache plus the current row as a separate operand
    (ops/decode_attention.decode_attend_q8kv_cur), so this scatter's
    output is only carried to the next step — XLA aliases it in place.

    Overflow: a slot whose fill pointer has reached ``S`` clamps its
    write to the last row (matching :func:`append_kv`'s
    dynamic_update_slice clamp — NOT an out-of-bounds scatter, which
    with unique/sorted asserted would be formally undefined) and its
    length saturates at ``S``. ServeLoop additionally force-finishes
    slots at max_seq so this is a backstop, not a steady state."""
    b = k_codes.shape[0]
    s = cache.k_codes.shape[2]
    rows = jnp.arange(b)
    i = jnp.minimum(cache.length, s - 1)
    kw = dict(unique_indices=True, indices_are_sorted=True)
    return QuantKVCache(
        k_codes=cache.k_codes.at[rows, :, i, :].set(k_codes, **kw),
        k_scale=cache.k_scale.at[rows, :, i, 0].set(k_scale, **kw),
        v_codes=cache.v_codes.at[rows, :, i, :].set(v_codes, **kw),
        v_scale=cache.v_scale.at[rows, :, i, 0].set(v_scale, **kw),
        length=jnp.minimum(cache.length + 1, s),
    )


def attend(
    cache: QuantKVCache,
    q: jax.Array,
    *,
    causal_offset: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head attention of ``q`` (H, T, D) against the quantized cache.

    Positions at or beyond the fill pointer are masked; with
    ``causal_offset`` (the absolute position of q's first token), query t
    additionally cannot see positions beyond ``causal_offset + t`` —
    together: standard causal decode/prefill semantics over a
    statically-shaped cache.

    Grouped-query attention (GQA) is supported: ``q`` may carry
    ``r * H_kv`` heads for an ``H_kv``-head cache (query head ``i`` reads
    KV group ``i // r`` — the Llama-3 layout), so one cache read serves
    all ``r`` query heads of a group.

    Decode (T=1) dispatches to the fused Pallas kernel
    (:func:`..ops.decode_attention.decode_attend_q8kv`): scores, masked
    softmax, and the weighted sum read the int8 codes + scales directly in
    one VMEM pass — nothing dequantizes to HBM (GQA rides the same (8, D)
    query block, R rows per KV group). Prefill (T>1) keeps the XLA
    lowering (compute-bound there; f32 dequant amortizes over T).
    """
    hq, t, d = q.shape
    h = cache.k_codes.shape[0]
    assert hq % h == 0, f"query heads {hq} not a multiple of KV heads {h}"
    r = hq // h
    s = cache.max_seq
    if t == 1:
        from ..ops.decode_attention import decode_attend_q8kv

        bound = cache.length
        if causal_offset is not None:
            bound = jnp.minimum(bound, causal_offset + 1)
        bound = jnp.broadcast_to(jnp.asarray(bound, jnp.int32).reshape(()), (h,))
        q_in = q[:, 0, :].astype(jnp.float32)
        out = decode_attend_q8kv(
            cache.k_codes,
            cache.k_scale.reshape(h, s),
            cache.v_codes,
            cache.v_scale.reshape(h, s),
            q_in.reshape(h, r, d) if r > 1 else q_in,
            bound,
        )
        return out.reshape(hq, 1, d).astype(q.dtype)
    kf = cache.dequant_k()  # (H, S, D)
    vf = cache.dequant_v()
    if r > 1:  # GQA prefill: repeat KV groups across their query heads
        kf = jnp.repeat(kf, r, axis=0)
        vf = jnp.repeat(vf, r, axis=0)
    logits = jnp.einsum("htd,hsd->hts", q.astype(jnp.float32), kf)
    logits = logits / jnp.sqrt(jnp.asarray(d, jnp.float32))
    pos = jnp.arange(s)[None, None, :]  # (1, 1, S)
    valid = pos < cache.length
    if causal_offset is not None:
        tq = causal_offset + jnp.arange(t)[None, :, None]  # (1, T, 1)
        valid = jnp.logical_and(valid, pos <= tq)
    logits = jnp.where(valid, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hts,hsd->htd", probs, vf).astype(q.dtype)


def kv_cache_bytes(cache: QuantKVCache) -> int:
    """Storage bytes (codes + scales) — the HBM-traffic accounting."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(cache):
        total += leaf.size * leaf.dtype.itemsize
    return total
