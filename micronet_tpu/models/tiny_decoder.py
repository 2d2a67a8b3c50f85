"""Minimal transformer decoder — the LLM-serving demo anchor.

Net-new vs the reference (vision CNNs only; SURVEY.md §5 marks the LLM
path as the stretch capability): a small causal decoder wired so every
serving-side quantization piece composes end to end —

- big matmuls swap to weight-only int4 (:mod:`micronet_tpu.quant.weight_only`,
  per-column or GPTQ-style group scales, Pallas decode kernel on TPU),
- the KV cache stores int8 codes + per-(head, position) scales
  (:mod:`micronet_tpu.quant.kv_cache`),
- prefill and single-token decode run over the same statically-shaped
  cache, so the decode loop is one compiled program (scan/jit friendly).

This is a capability demo at CI scale, not a pretrained model: tests
drive float-vs-quantized parity on it; bench uses Llama-shaped layers
from the kernels directly (BENCHMARKS.md).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.modules import Linear, OrderedModule
from ..parallel.moe import (
    MoEParams,
    init_moe,
    moe_apply,
    moe_apply_ep,
    quantize_moe,
)
from ..quant.kv_cache import QuantKVCache, append_kv, attend, init_kv_cache
from ..quant.weight_only import wo_quantize_linear

__all__ = ["TinyDecoder", "MoEMLP", "quantize_decoder"]


class RMSNorm(OrderedModule):
    def __init__(self, dim: int):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + 1e-6) * self.weight[...]).astype(x.dtype)


class MoEMLP(OrderedModule):
    """Top-1 MoE MLP block (nnx wrapper over ``parallel/moe``): dense
    single-device compute here; the EP shard_map path
    (:func:`micronet_tpu.parallel.moe_apply_ep`) consumes the same
    :class:`MoEParams` when serving over an ``expert`` mesh axis."""

    def __init__(
        self,
        dim: int,
        mlp_dim: int,
        n_experts: int,
        capacity_factor: float = 0.0,
        top_k: int = 1,
        *,
        rngs: nnx.Rngs,
    ):
        # serving default is DROP-FREE (capacity == k*T, cf = E): token t's
        # output must not depend on which other tokens share the forward
        # pass, or prefill and incremental decode would disagree. Training
        # can pass a finite cf (e.g. 1.25) for the classic GShard regime.
        # top_k=2 with renormalized gates is the actual GShard default.
        if not capacity_factor:
            capacity_factor = float(n_experts)
        p = init_moe(dim, mlp_dim, n_experts, rngs.params())
        self.router = nnx.Param(p.router)
        self.w_up = nnx.Param(p.w_up)
        self.w_down = nnx.Param(p.w_down)
        self.up_scale = None
        self.down_scale = None
        self.capacity_factor = capacity_factor
        self.top_k = top_k
        self.ep_mesh = None  # static: set via use_ep()
        self.ep_axis = "expert"

    def params(self) -> MoEParams:
        return MoEParams(
            router=self.router[...],
            w_up=self.w_up[...],
            w_down=self.w_down[...],
            up_scale=None if self.up_scale is None else self.up_scale[...],
            down_scale=None if self.down_scale is None else self.down_scale[...],
        )

    def quantize_(self) -> None:
        """In-place int8 weight-only expert conversion (serving).

        SERVING-ONLY: the expert weights become plain ``nnx.Variable``
        (not ``nnx.Param``), so they deliberately drop out of
        Param-filtered state — optimizers and Param-only checkpoint
        filters will no longer see them. Do not hand a quantized model
        back to training utilities (same contract as
        ``wo_quantize_linear``)."""
        qp = quantize_moe(self.params())
        self.w_up = nnx.Variable(qp.w_up)
        self.w_down = nnx.Variable(qp.w_down)
        # nnx.data: these attrs were initialized as (static) None, so the
        # first data assignment must override the static marking
        self.up_scale = nnx.data(nnx.Variable(qp.up_scale))
        self.down_scale = nnx.data(nnx.Variable(qp.down_scale))

    def use_ep(self, mesh, axis: str = "expert") -> None:
        """Serve this block expert-parallel: expert weights sharded over
        ``axis`` of ``mesh``, combine via psum (``moe_apply_ep``). The
        mesh is static module config (rides the graphdef, not the state),
        so a split/merge round-trip keeps the EP dispatch. Semantics are
        identical to the dense path — same router, same drop-free
        capacity — only the placement changes, so decode tokens produced
        under EP match the single-device path (tested in
        tests/test_llm_serving.py)."""
        assert self.top_k == 1, "moe_apply_ep is top-1; a2a path covers top-2"
        self.ep_mesh = mesh
        self.ep_axis = axis

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.ep_mesh is not None:
            return moe_apply_ep(
                self.params(), x, self.ep_mesh, self.ep_axis,
                self.capacity_factor,
            )
        return moe_apply(self.params(), x, self.capacity_factor, self.top_k)


class DecoderBlock(OrderedModule):
    def __init__(
        self,
        dim: int,
        heads: int,
        mlp_dim: int,
        *,
        moe_experts: int = 0,
        rngs: nnx.Rngs,
    ):
        assert dim % heads == 0
        self.heads = heads
        self.head_dim = dim // heads
        self.norm1 = RMSNorm(dim)
        self.wq = Linear(dim, dim, bias=False, rngs=rngs)
        self.wk = Linear(dim, dim, bias=False, rngs=rngs)
        self.wv = Linear(dim, dim, bias=False, rngs=rngs)
        self.wo = Linear(dim, dim, bias=False, rngs=rngs)
        self.norm2 = RMSNorm(dim)
        if moe_experts:
            self.moe = MoEMLP(dim, mlp_dim, moe_experts, rngs=rngs)
        else:
            self.moe = None
            self.up = Linear(dim, mlp_dim, bias=False, rngs=rngs)
            self.down = Linear(mlp_dim, dim, bias=False, rngs=rngs)

    def _split(self, x: jax.Array) -> jax.Array:
        t, _ = x.shape
        return x.reshape(t, self.heads, self.head_dim).transpose(1, 0, 2)

    def __call__(
        self,
        x: jax.Array,  # (T, dim) — unbatched; vmap for batch
        cache: QuantKVCache,
        offset: jax.Array,
    ) -> Tuple[jax.Array, QuantKVCache]:
        h = self.norm1(x)
        q, k, v = self._split(self.wq(h)), self._split(self.wk(h)), self._split(self.wv(h))
        cache = append_kv(cache, k, v)
        att = attend(cache, q, causal_offset=offset)  # (H, T, D)
        att = att.transpose(1, 0, 2).reshape(x.shape[0], -1)
        x = x + self.wo(att)
        return self._mlp(x), cache

    def _mlp(self, x: jax.Array) -> jax.Array:
        h2 = self.norm2(x)
        if self.moe is not None:
            return x + self.moe(h2)
        return x + self.down(jax.nn.gelu(self.up(h2)))

    def prefill_sp(
        self,
        x: jax.Array,  # (T, dim), T sharded over `axis` of `mesh`
        cache: QuantKVCache,  # must be EMPTY (fill pointer 0)
        mesh,
        axis: str = "seq",
    ) -> Tuple[jax.Array, QuantKVCache]:
        """Sequence-parallel prefill: the prompt's attention runs as exact
        ring attention over the ``axis`` mesh dimension (activations never
        materialize the full T on one chip), and the K/V still land in the
        int8 cache, so the subsequent decode path is byte-identical to a
        dense prefill.

        Numerics note: the dense prefill attends against the quantize-
        dequantized cache values (attend() reads int8 codes), so the ring
        attention here consumes the SAME dequantized K/V — parity with
        :meth:`__call__` is exact up to reduction order."""
        from ..parallel.sequence import ring_attention

        t = x.shape[0]
        h = self.norm1(x)
        q, k, v = self._split(self.wq(h)), self._split(self.wk(h)), self._split(self.wv(h))
        cache = append_kv(cache, k, v)
        kdq = cache.dequant_k()[:, :t]  # (H, T, D): what attend() would see
        vdq = cache.dequant_v()[:, :t]
        att = ring_attention(
            q.transpose(1, 0, 2).astype(jnp.float32),
            kdq.transpose(1, 0, 2),
            vdq.transpose(1, 0, 2),
            mesh,
            axis=axis,
            causal=True,
        ).astype(x.dtype)  # (T, H, D)
        x = x + self.wo(att.reshape(t, -1))
        return self._mlp(x), cache


class TinyDecoder(OrderedModule):
    """Causal decoder LM over a token vocabulary (unbatched forward)."""

    def __init__(
        self,
        vocab: int = 256,
        dim: int = 64,
        heads: int = 4,
        depth: int = 2,
        mlp_dim: int = 128,
        max_seq: int = 64,
        moe_experts: int = 0,
        *,
        rngs: nnx.Rngs,
    ):
        self.vocab, self.dim, self.max_seq = vocab, dim, max_seq
        self.heads, self.depth = heads, depth
        key = rngs.params()
        self.embed = nnx.Param(
            jax.random.normal(key, (vocab, dim), jnp.float32) * 0.02
        )
        self.pos = nnx.Param(
            jax.random.normal(jax.random.fold_in(key, 1), (max_seq, dim)) * 0.02
        )
        self.blocks = nnx.List(
            [
                DecoderBlock(dim, heads, mlp_dim, moe_experts=moe_experts, rngs=rngs)
                for _ in range(depth)
            ]
        )
        self.norm = RMSNorm(dim)
        self.lm_head = Linear(dim, vocab, bias=False, rngs=rngs)

    def init_cache(self) -> List[QuantKVCache]:
        return [
            init_kv_cache(self.heads, self.max_seq, self.dim // self.heads)
            for _ in range(self.depth)
        ]

    def forward(
        self,
        tokens: jax.Array,  # (T,) int32
        caches: List[QuantKVCache],
        offset: jax.Array,  # scalar: absolute position of tokens[0]
    ) -> Tuple[jax.Array, List[QuantKVCache]]:
        """Prefill (T>1) or decode (T==1) step: logits (T, vocab) + caches."""
        t = tokens.shape[0]
        pos_ids = offset + jnp.arange(t)
        x = self.embed[...][tokens] + self.pos[...][pos_ids]
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk(x, cache, offset)
            new_caches.append(cache)
        return self.lm_head(self.norm(x)), new_caches

    def prefill_sp(
        self,
        tokens: jax.Array,  # (T,) int32, T divisible by the mesh axis
        caches: List[QuantKVCache],  # fresh (init_cache())
        mesh,
        axis: str = "seq",
    ) -> Tuple[jax.Array, List[QuantKVCache]]:
        """Sequence-parallel prefill over a ``seq`` mesh axis: logits and
        caches match :meth:`forward` (tokens, caches, offset=0) up to
        reduction order, with per-device attention memory O(T/S)."""
        t = tokens.shape[0]
        x = self.embed[...][tokens] + self.pos[...][jnp.arange(t)]
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.prefill_sp(x, cache, mesh, axis)
            new_caches.append(cache)
        return self.lm_head(self.norm(x)), new_caches

    def forward_batch(
        self,
        tokens: jax.Array,  # (B, T) int32
        caches,  # pytree of QuantKVCache with a leading B on every leaf
        offset: jax.Array,  # (B,) absolute positions
    ):
        """Batched serving step: vmap of :meth:`forward` over requests,
        weights shared, per-request caches/offsets (continuous-batching
        shape: each request may sit at a different position)."""
        gdef, state = nnx.split(self)

        def one(tok, cache, off):
            return nnx.merge(gdef, state).forward(tok, cache, off)

        return jax.vmap(one)(tokens, caches, offset)

    def init_cache_batch(self, batch: int):
        """Batched caches: every leaf gains a leading batch dim."""
        return jax.tree.map(
            lambda l: jnp.broadcast_to(l, (batch,) + l.shape), self.init_cache()
        )

    def generate(
        self, prompt: jax.Array, steps: int
    ) -> jax.Array:
        """Greedy decode ``steps`` tokens after ``prompt`` (host loop over a
        jitted step — the cache is functional state, so a lax.scan variant
        is a pure refactor)."""
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


def quantize_decoder(
    model: TinyDecoder, group: int = 0, bits: int = 4
) -> TinyDecoder:
    """Swap every block Linear (attention projections + MLP) for
    weight-only int4/int8 — the serving conversion. MoE blocks quantize
    their experts to int8 (per-expert per-column scales). The embedding,
    positional table, norms, and lm_head stay float (standard practice)."""
    for blk in model.blocks:
        names = ("wq", "wk", "wv", "wo") if blk.moe is not None else (
            "wq", "wk", "wv", "wo", "up", "down"
        )
        for name in names:
            setattr(
                blk, name, wo_quantize_linear(getattr(blk, name), group, bits)
            )
        if blk.moe is not None:
            blk.moe.quantize_()
    return model
