"""Llama-family causal decoder — the production LLM serving model.

Net-new vs the reference (vision CNNs only; SURVEY.md §5 marks the LLM
path as the stretch capability, BASELINE.json configs[4]): the real
Llama-3 geometry as a first-class model family rather than a benchmark
script — grouped-query attention (GQA), rotary position embeddings
(RoPE), RMSNorm, SwiGLU, and the standard serving layout of FUSED
projections (one QKV matmul instead of three, one gate+up instead of
two: same bytes, fewer kernel launches).

Composes with every serving-side quantization piece in the framework:

- :func:`quantize_llama` swaps all block matmuls to weight-only int4
  (hl8-packed, group scales — the Pallas decode kernel on TPU, the XLA
  lowering elsewhere) via :mod:`micronet_tpu.quant.weight_only`;
- the KV cache stores int8 codes + per-(head, position) scales and
  decode rides the fused int8-KV attention kernel
  (:mod:`micronet_tpu.quant.kv_cache`, :mod:`..ops.decode_attention` —
  GQA query groups share one cache read);
- the serving API (``forward`` / ``forward_batch`` / ``init_cache`` /
  ``init_cache_batch``) matches :class:`..serve.ServeLoop`'s contract,
  so continuous batching works unchanged;
- TP: state shards over a ``model`` mesh axis with the same
  channel-sharding rule as the rest of the framework
  (:func:`micronet_tpu.parallel.sharding.shard_state`) — packed W4
  nibbles, group scales, embeddings, and the lm_head all shard on their
  output axis; GSPMD inserts the collectives.

This module defines geometry + numerics, not pretrained weights: tests
drive float-vs-W4 parity, prefill-vs-decode consistency, and the
TP/ServeLoop compositions on a tiny config; ``benchmarks/llm_e2e.py``
measures the 8B geometry on a real chip.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.modules import Linear, OrderedModule
from ..quant.kv_cache import QuantKVCache, append_kv, attend, init_kv_cache
from ..quant.weight_only import wo_quantize_linear

__all__ = ["LlamaConfig", "llama3_8b", "llama_tiny", "Llama", "quantize_llama"]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Llama-family geometry (field names follow the published configs)."""

    vocab: int
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    mlp_dim: int
    max_seq: int
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim


def llama3_8b(max_seq: int = 2048) -> LlamaConfig:
    """The Llama-3-8B geometry (GQA 32q/8kv, 14336 SwiGLU, theta 5e5)."""
    return LlamaConfig(
        vocab=128256, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
        mlp_dim=14336, max_seq=max_seq, rope_theta=500000.0,
    )


def llama_tiny(max_seq: int = 32) -> LlamaConfig:
    """CI-scale config with the same *shape* of everything (GQA ratio 2,
    even head_dim for RoPE, fused projections)."""
    return LlamaConfig(
        vocab=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
        mlp_dim=64, max_seq=max_seq, rope_theta=10000.0,
    )


def apply_rope(
    x: jax.Array,  # (H, T, D) with D even
    positions: jax.Array,  # (T,) absolute positions
    theta: float,
) -> jax.Array:
    """Rotary position embedding, rotate-half convention.

    Position enters attention only through the q·k phase difference, so
    any fixed pairing convention is self-consistent; rotate-half (the HF
    layout) is used throughout this module. f32 trig regardless of x's
    dtype (bf16 phase error grows with position)."""
    d = x.shape[-1]
    half = d // 2
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (T, half)
    cos, sin = jnp.cos(ang)[None], jnp.sin(ang)[None]  # (1, T, half)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def apply_rope_batch(
    x: jax.Array,  # (B, H, D) with D even — one token per request
    positions: jax.Array,  # (B,) absolute position of each request's token
    theta: float,
) -> jax.Array:
    """RoPE for the batched decode step: one token per request, each at
    its own absolute position. Same rotate-half formula as
    :func:`apply_rope` (elementwise-identical ops, so a request's
    numbers do not depend on what shares its batch)."""
    d = x.shape[-1]
    half = d // 2
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (B, half)
    cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]  # (B, 1, half)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class RMSNorm(OrderedModule):
    def __init__(self, dim: int, eps: float = 1e-5):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + self.eps) * self.weight[...]).astype(x.dtype)


class LlamaBlock(OrderedModule):
    """Pre-norm GQA attention + SwiGLU MLP with fused projections."""

    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.attn_norm = RMSNorm(cfg.dim, cfg.norm_eps)
        # fused QKV: columns [0, dim) are q, [dim, dim+kv_dim) k, rest v
        self.wqkv = Linear(cfg.dim, cfg.dim + 2 * cfg.kv_dim, bias=False, rngs=rngs)
        self.wo = Linear(cfg.dim, cfg.dim, bias=False, rngs=rngs)
        self.mlp_norm = RMSNorm(cfg.dim, cfg.norm_eps)
        # fused gate+up: columns [0, mlp) gate, [mlp, 2*mlp) up
        self.gateup = Linear(cfg.dim, 2 * cfg.mlp_dim, bias=False, rngs=rngs)
        self.down = Linear(cfg.mlp_dim, cfg.dim, bias=False, rngs=rngs)

    def __call__(
        self,
        x: jax.Array,  # (T, dim) — unbatched; vmap for batch
        cache: QuantKVCache,
        offset: jax.Array,  # scalar: absolute position of x[0]
    ) -> Tuple[jax.Array, QuantKVCache]:
        cfg = self.cfg
        t = x.shape[0]
        h = self.attn_norm(x)
        qkv = self.wqkv(h)
        q = qkv[:, : cfg.dim].reshape(t, cfg.n_heads, cfg.head_dim).transpose(1, 0, 2)
        k = (
            qkv[:, cfg.dim : cfg.dim + cfg.kv_dim]
            .reshape(t, cfg.n_kv_heads, cfg.head_dim)
            .transpose(1, 0, 2)
        )
        v = (
            qkv[:, cfg.dim + cfg.kv_dim :]
            .reshape(t, cfg.n_kv_heads, cfg.head_dim)
            .transpose(1, 0, 2)
        )
        pos = offset + jnp.arange(t)
        q = apply_rope(q, pos, cfg.rope_theta)
        k = apply_rope(k, pos, cfg.rope_theta)
        cache = append_kv(cache, k, v)
        att = attend(cache, q, causal_offset=offset)  # (n_heads, T, D)
        x = x + self.wo(att.transpose(1, 0, 2).reshape(t, cfg.dim))
        h2 = self.mlp_norm(x)
        gu = self.gateup(h2)
        gated = jax.nn.silu(gu[:, : cfg.mlp_dim]) * gu[:, cfg.mlp_dim :]
        return x + self.down(gated), cache

    def step_batch(
        self,
        x: jax.Array,  # (B, dim) — ONE token per request
        cache: QuantKVCache,  # batched: leaves (B, H, S, D), length (B,)
        offsets: jax.Array,  # (B,) absolute position of each token
    ) -> Tuple[jax.Array, QuantKVCache]:
        """Batched DECODE step — the serving throughput path.

        ``vmap(forward)`` turns each projection into B separate M=1
        matmuls, so the weights are streamed once per LANE worth of MXU
        work; this path instead runs every projection ONCE at M=B (the
        weight read amortizes over the whole batch — decode is
        weight-read-bound, so tokens/s scales ~linearly with B) and
        batches attention by folding B into the fused decode kernel's
        grid (G = B·n_kv_heads; the kernel's per-program SMEM bound
        vector already carries per-slot fill levels).

        Per-request numerics are independent of batch membership: rows
        of a matmul, RoPE, the KV append, and the attention programs
        are all per-request — the ServeLoop isolation oracle holds.
        """
        cfg = self.cfg
        b = x.shape[0]
        h = self.attn_norm(x)
        qkv = self.wqkv(h)  # one (B, dim+2*kv_dim) matmul
        q = qkv[:, : cfg.dim].reshape(b, cfg.n_heads, cfg.head_dim)
        k = qkv[:, cfg.dim : cfg.dim + cfg.kv_dim].reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        v = qkv[:, cfg.dim + cfg.kv_dim :].reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        q = apply_rope_batch(q, offsets, cfg.rope_theta)
        k = apply_rope_batch(k, offsets, cfg.rope_theta)

        from ..ops.decode_attention import decode_attend_q8kv_cur
        from ..quant.kv_cache import append_kv_batch_quantized, quantize_kv_rows

        # deferred append: quantize the current rows ONCE, attend over
        # the pre-append cache + the rows as a separate kernel operand,
        # and scatter the SAME codes into the cache afterwards. The
        # scatter output only feeds the NEXT step (it aliases the serving
        # loop's carried state); appending before attending would force a
        # full cache copy between the scatter and the kernel operand.
        kq, ks = quantize_kv_rows(k)  # (B, hkv, D) int8, (B, hkv, 1)
        vq, vs = quantize_kv_rows(v)
        hkv, s, d = cfg.n_kv_heads, cfg.max_seq, cfg.head_dim
        r = cfg.n_heads // hkv
        bound = jnp.minimum(cache.length, offsets)  # cache w/o current token
        att = decode_attend_q8kv_cur(
            cache.k_codes.reshape(b * hkv, s, d),
            cache.k_scale.reshape(b * hkv, s),
            cache.v_codes.reshape(b * hkv, s, d),
            cache.v_scale.reshape(b * hkv, s),
            # query head i reads KV group i // r — (b, hkv, r, d) keeps
            # head order so the output reshape restores (b, n_heads*d)
            q.reshape(b, hkv, r, d).reshape(b * hkv, r, d).astype(jnp.float32),
            jnp.broadcast_to(bound[:, None], (b, hkv)).reshape(b * hkv),
            kq.reshape(b * hkv, d),
            ks.reshape(b * hkv),
            vq.reshape(b * hkv, d),
            vs.reshape(b * hkv),
        )  # (B*hkv, r, D)
        cache = append_kv_batch_quantized(
            cache, kq, ks[..., 0], vq, vs[..., 0]
        )
        x = x + self.wo(att.reshape(b, cfg.n_heads * d).astype(x.dtype))
        h2 = self.mlp_norm(x)
        gu = self.gateup(h2)
        gated = jax.nn.silu(gu[:, : cfg.mlp_dim]) * gu[:, cfg.mlp_dim :]
        return x + self.down(gated), cache

    def step_batch_paged(
        self,
        x: jax.Array,  # (B, dim) — ONE token per request
        cache,  # PagedKVCache pool shared by B slots
        offsets: jax.Array,  # (B,) absolute position of each token
        active: jax.Array,  # (B,) bool — inactive lanes append nothing
    ):
        """Batched decode step over the PAGED pool — same math as
        :meth:`step_batch` (deferred append, fused int8-KV attention)
        with the cache read riding :func:`..ops.paged_attention.
        paged_decode_attend_cur` straight out of the page pool and the
        append allocating pages only for ACTIVE lanes
        (:func:`..quant.paged_kv.paged_append_batch`) — in a shared pool
        an idle lane's masked-garbage append would leak pages, so the
        dense path's idle-lanes-are-free trade needs the mask here."""
        from ..quant.paged_kv import paged_append_batch
        from ..ops.paged_attention import paged_decode_attend_cur
        from ..quant.kv_cache import quantize_kv_rows

        cfg = self.cfg
        b = x.shape[0]
        h = self.attn_norm(x)
        qkv = self.wqkv(h)
        q = qkv[:, : cfg.dim].reshape(b, cfg.n_heads, cfg.head_dim)
        k = qkv[:, cfg.dim : cfg.dim + cfg.kv_dim].reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        v = qkv[:, cfg.dim + cfg.kv_dim :].reshape(
            b, cfg.n_kv_heads, cfg.head_dim
        )
        q = apply_rope_batch(q, offsets, cfg.rope_theta)
        k = apply_rope_batch(k, offsets, cfg.rope_theta)
        kq, ks = quantize_kv_rows(k)  # (B, hkv, D) int8, (B, hkv, 1)
        vq, vs = quantize_kv_rows(v)
        hkv, d = cfg.n_kv_heads, cfg.head_dim
        r = cfg.n_heads // hkv
        bound = jnp.minimum(cache.lengths, offsets)  # cache w/o current
        att = paged_decode_attend_cur(
            cache.k_codes, cache.k_scale, cache.v_codes, cache.v_scale,
            cache.page_table, bound,
            q.reshape(b, hkv, r, d).astype(jnp.float32),
            kq, ks[..., 0], vq, vs[..., 0],
        )  # (B, hkv, r, D)
        cache = paged_append_batch(cache, kq, ks[..., 0], vq, vs[..., 0], active)
        x = x + self.wo(att.reshape(b, cfg.n_heads * d).astype(x.dtype))
        h2 = self.mlp_norm(x)
        gu = self.gateup(h2)
        gated = jax.nn.silu(gu[:, : cfg.mlp_dim]) * gu[:, cfg.mlp_dim :]
        return x + self.down(gated), cache


class Llama(OrderedModule):
    """Causal Llama-family LM (unbatched forward; ServeLoop-compatible).

    ``w4_group > 0`` quantizes each block AS IT IS BUILT (and the lm_head
    unless ``quantize_lm_head=False``): float transients peak at one
    block (~0.9 GB at the 8B geometry) instead of the whole float model
    (~28 GB, which does not fit next to anything on a 16 GB chip). The
    post-hoc :func:`quantize_llama` stays for converting trained/loaded
    float models at sizes where they fit."""

    def __init__(
        self,
        cfg: LlamaConfig,
        *,
        rngs: nnx.Rngs,
        w4_group: int = 0,
        w4_bits: int = 4,
        quantize_lm_head: bool = True,
    ):
        self.cfg = cfg
        self.embed = nnx.Param(
            jax.random.normal(rngs.params(), (cfg.vocab, cfg.dim), jnp.float32)
            * 0.02
        )
        blocks = []
        for _ in range(cfg.n_layers):
            blk = LlamaBlock(cfg, rngs=rngs)
            if w4_group:
                _quantize_block(blk, w4_group, w4_bits)
            blocks.append(blk)
        self.blocks = nnx.List(blocks)
        self.norm = RMSNorm(cfg.dim, cfg.norm_eps)
        self.lm_head = Linear(cfg.dim, cfg.vocab, bias=False, rngs=rngs)
        if w4_group and quantize_lm_head:
            # the lm_head reads dim*vocab bytes EVERY decoded token — at
            # the 8B geometry that's 2.1 GB/token in f32, >30% of the
            # whole W4 body; W4 storage makes it 0.26 GB
            self.lm_head = wo_quantize_linear(self.lm_head, w4_group, w4_bits)

    # -- serving API (the ServeLoop contract, same as TinyDecoder) ----------

    def init_cache(self) -> List[QuantKVCache]:
        cfg = self.cfg
        return [
            init_kv_cache(cfg.n_kv_heads, cfg.max_seq, cfg.head_dim)
            for _ in range(cfg.n_layers)
        ]

    def init_cache_batch(self, batch: int):
        return jax.tree.map(
            lambda l: jnp.broadcast_to(l, (batch,) + l.shape), self.init_cache()
        )

    def init_paged_cache(
        self, slots: int, page_size: int, num_pages: int
    ) -> List:
        """Per-layer PAGED pools for continuous-batching serving: HBM is
        ``num_pages`` pages per layer — sized to the expected SUM of live
        lengths, not ``slots * max_seq`` (the dense batch cache's bill).
        Each slot's logical capacity stays ``max_seq`` rows
        (= ``max_pages_per_slot`` pages), so the ServeLoop capacity guard
        is unchanged."""
        from ..quant.paged_kv import init_paged_kv

        cfg = self.cfg
        assert cfg.max_seq % page_size == 0, (cfg.max_seq, page_size)
        return [
            init_paged_kv(
                num_pages=num_pages,
                page_size=page_size,
                num_heads=cfg.n_kv_heads,
                head_dim=cfg.head_dim,
                slots=slots,
                max_pages_per_slot=cfg.max_seq // page_size,
            )
            for _ in range(cfg.n_layers)
        ]

    def forward(
        self,
        tokens: jax.Array,  # (T,) int32
        caches: List[QuantKVCache],
        offset: jax.Array,  # scalar: absolute position of tokens[0]
    ) -> Tuple[jax.Array, List[QuantKVCache]]:
        """Prefill (T>1) or decode (T==1): logits (T, vocab) + new caches.

        No positional table: position enters only through RoPE inside each
        block (the Llama layout), so max_seq bounds only the cache."""
        x = self.embed[...][tokens]
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk(x, cache, offset)
            new_caches.append(cache)
        return self.lm_head(self.norm(x)), new_caches

    def forward_batch(self, tokens, caches, offset):
        """Batched serving step: vmap of :meth:`forward` over requests
        (weights shared; per-request caches and offsets)."""
        gdef, state = nnx.split(self)

        def one(tok, cache, off):
            return nnx.merge(gdef, state).forward(tok, cache, off)

        return jax.vmap(one)(tokens, caches, offset)

    def decode_batch(self, tokens, caches, offsets):
        """Batched DECODE fast path (ONE token per request): every
        projection and the lm_head run once at M=B instead of B vmapped
        M=1 matmuls, and attention folds the batch into the fused
        kernel's grid (see :meth:`LlamaBlock.step_batch`). Decode is
        weight-read-bound, so tokens/s/chip scales ~linearly with B —
        this is the continuous-batching throughput path
        (:class:`..serve.ServeLoop` prefers it when present).

        tokens (B, 1) int32; caches = list of batched per-layer caches
        (leaves (B, H, S, D), lengths (B,)); offsets (B,). Returns
        logits (B, 1, vocab) + new caches — the ``forward_batch``
        contract at T=1.
        """
        x = self.embed[...][tokens[:, 0]]  # (B, dim)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.step_batch(x, cache, offsets)
            new_caches.append(cache)
        return self.lm_head(self.norm(x))[:, None, :], new_caches

    def decode_batch_paged(self, tokens, caches, offsets, active):
        """:meth:`decode_batch` over per-layer PAGED pools: same fused
        projections + deferred-append attention, cache reads straight
        from the page pool (``paged_decode_attend_cur``), appends
        allocating pages for ACTIVE lanes only. ``caches`` from
        :meth:`init_paged_cache`; ``active`` (B,) bool is the serving
        loop's occupancy mask."""
        x = self.embed[...][tokens[:, 0]]  # (B, dim)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.step_batch_paged(x, cache, offsets, active)
            new_caches.append(cache)
        return self.lm_head(self.norm(x))[:, None, :], new_caches

    def generate(self, prompt: jax.Array, steps: int) -> jax.Array:
        """Greedy decode ``steps`` tokens after ``prompt``."""
        caches = self.init_cache()
        logits, caches = self.forward(prompt, caches, jnp.int32(0))
        tok = jnp.argmax(logits[-1]).astype(jnp.int32)
        out = [int(tok)]
        offset = jnp.int32(prompt.shape[0])
        for _ in range(steps - 1):
            logits, caches = self.forward(tok[None], caches, offset)
            tok = jnp.argmax(logits[-1]).astype(jnp.int32)
            out.append(int(tok))
            offset = offset + 1
        return jnp.asarray(out, jnp.int32)


def _quantize_block(blk: LlamaBlock, group: int, bits: int) -> None:
    for name in ("wqkv", "wo", "gateup", "down"):
        setattr(blk, name, wo_quantize_linear(getattr(blk, name), group, bits))


def quantize_llama(model: Llama, group: int = 128, bits: int = 4) -> Llama:
    """Serving conversion: every block matmul (fused QKV, output proj,
    fused gate+up, down proj) becomes weight-only int4/int8 — hl8-packed
    nibbles + group scales riding the Pallas decode kernel on TPU.
    Embedding, norms, and lm_head stay float (standard practice; pass
    ``w4_group`` to the constructor — or apply ``wo_quantize_linear`` to
    ``lm_head`` — when vocab memory dominates). Group sizes that don't
    divide a projection's K fall back to per-column scales (see
    ``weight_only._quantize_2d``)."""
    for blk in model.blocks:
        _quantize_block(blk, group, bits)
    return model
