"""Continuous-batching scheduler over the batched decode step.

The reference's deploy leg is a fixed-shape TensorRT engine fed one batch
at a time (deploy/tensorrt/util_trt.py:189-222). Production LLM serving
needs the orthogonal thing: a FIXED-shape compiled step (XLA: one program)
with DYNAMIC membership — requests of different lengths join mid-flight,
finished requests leave, their slot is recycled for the next queued
request. This module supplies that admission/eviction loop on top of
:meth:`TinyDecoder.forward_batch` (weights shared, per-slot caches and
offsets — every slot advances independently).

Design (vLLM-style continuous batching, TPU-first):

- ONE compiled decode program for the whole loop: ``(B, 1)`` tokens +
  per-slot offsets over statically-shaped int8 KV caches. Slot joins or
  leaves never recompile.
- Admission = prefill the request alone (T = prompt length; one compile
  per distinct length — bucket/pad upstream if needed, cf.
  ``infer/deploy.py``'s AOT batch ladder), then splice its cache into the
  batched cache pytree at the free slot index.
- Eviction = host-side bookkeeping only; the slot's device state is fully
  reset at the next admission, so a stale cache can never leak into a new
  request (asserted by tests/test_serving_loop.py's isolation oracle).
- Inactive slots still step (their lanes are masked garbage) — that is
  the TPU-correct trade: B is static, the XLA program never changes, and
  idle-lane work is free compared to a recompile.

Determinism contract: a request's tokens are identical to its isolated
``generate()`` run, regardless of what shares the batch (per-slot caches
+ drop-free MoE serving capacity guarantee independence).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, Dict, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["Request", "ServeLoop"]


@jax.jit
def _splice_paged(caches, single, slot, length):
    """Admission splice: free ``slot`` (idempotent on an empty slot),
    then page in the prefilled dense rows, per layer. One compile total
    (slot/length are traced scalars; prompt lengths never recompile)."""
    from ..quant.paged_kv import paged_free_slot, paged_insert_from_dense

    out = []
    for c, s in zip(caches, single):
        c = paged_free_slot(c, slot)
        c = paged_insert_from_dense(
            c, slot, s.k_codes, s.k_scale[..., 0],
            s.v_codes, s.v_scale[..., 0], length,
        )
        out.append(c)
    return out


@jax.jit
def _free_all(caches, slot):
    """Eviction: return ``slot``'s pages to every layer's pool."""
    from ..quant.paged_kv import paged_free_slot

    return [paged_free_slot(c, slot) for c in caches]


@dataclasses.dataclass
class Request:
    """One generation request.

    ``temperature == 0`` (default) decodes greedily; otherwise tokens are
    sampled with temperature / top-k / top-p under a per-request seed.
    Sampling keys are a function of (seed, absolute position) only —
    never of batch layout — so a request's tokens are identical whether
    it runs isolated or continuous-batched (see ``serve/sampling.py``)."""

    rid: int
    prompt: List[int]
    max_new_tokens: int
    eos: Optional[int] = None
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0
    # filled by the loop:
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ServeLoop:
    """Admission/eviction scheduler over ``model.forward_batch`` slots.

    ``paged=True`` switches the KV state from the dense batched cache
    (``slots * max_seq`` rows reserved per layer regardless of use) to
    the shared PAGE POOL (:mod:`micronet_tpu.quant.paged_kv`): HBM is
    ``num_pages`` pages per layer — sized to the expected sum of LIVE
    lengths — admission allocates a prompt's pages (and defers the
    request while the pool is full: page-level admission control, the
    thing slot-count admission cannot express), decode appends via the
    active-masked batch append, and eviction RETURNS the pages to the
    pool immediately (dense slots only recycle at the next admission).
    Requires the model to expose ``init_paged_cache`` +
    ``decode_batch_paged`` (``Llama`` does); token streams are identical
    to the dense loop (same deferred-append math, same sampling keys —
    bit-identical on CPU where both ride the same XLA oracle)."""

    def __init__(
        self,
        model,
        max_slots: int,
        *,
        paged: bool = False,
        page_size: int = 16,
        num_pages: Optional[int] = None,
        prefill_chunk: int = 0,
    ):
        self.model = model
        self.b = max_slots
        self.paged = paged
        # prefill_chunk > 0: admission prefills in fixed-size chunks, so
        # arbitrary prompt lengths compile ONE chunk shape instead of one
        # program per distinct length (VERDICT r4 item 8). Pad rows in
        # the final chunk land past the true length; the slot's fill
        # pointer is reset to the true length at splice, so decode
        # appends OVERWRITE them and attention never sees them.
        self.prefill_chunk = prefill_chunk
        if paged:
            self.page_size = page_size
            if num_pages is None:
                # default pool = dense capacity + the zero page (callers
                # shrink it to realize the HBM win; default is safe)
                spec = jax.eval_shape(model.init_cache)
                num_pages = 1 + max_slots * (int(spec[0].max_seq) // page_size)
            self.num_pages = num_pages
            self.caches = model.init_paged_cache(
                max_slots, page_size, num_pages
            )
            self.active = jnp.zeros((max_slots,), bool)
        else:
            self.caches = model.init_cache_batch(max_slots)
        self.offsets = jnp.zeros((max_slots,), jnp.int32)
        self.next_tok = jnp.zeros((max_slots, 1), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * max_slots
        self.queue: Deque[Request] = deque()
        self.finished: Dict[int, Request] = {}
        # per-slot sampling params — traced arrays, so a request with
        # different temperature/top_k/top_p joining never recompiles
        self.temps = jnp.zeros((max_slots,), jnp.float32)
        self.topks = jnp.zeros((max_slots,), jnp.int32)
        self.topps = jnp.ones((max_slots,), jnp.float32)
        self.seed_keys = jax.vmap(jax.random.PRNGKey)(
            jnp.zeros((max_slots,), jnp.uint32)
        )
        # cache capacity: a slot at offset >= max_seq cannot append
        # another KV row, so its request is force-finished (truncated)
        # rather than clamp-overwriting the last cache position.
        # eval_shape: read max_seq off the cache SPEC without materializing
        # a whole per-layer cache on device (a transient HBM spike equal to
        # one full cache at Llama-8B shapes — ADVICE r4)
        try:
            spec = jax.eval_shape(model.init_cache)
            self.max_seq = int(spec[0].max_seq)
        except Exception:
            self.max_seq = None

    # -- request lifecycle --------------------------------------------------

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req) if r is None]

    def _admit(self, slot: int, req: Request) -> bool:
        """Prefill ``req`` alone, then splice cache/offset/token into the
        batch state at ``slot`` (device state of the slot is fully
        overwritten — recycling cannot leak the previous request).
        Paged mode first checks the pool has pages for the whole prompt;
        if not, the request goes back to the queue head and admission
        reports False (page-level admission control — the request waits
        for evictions, exactly vLLM's behavior)."""
        from .sampling import position_key, sample_token

        if self.paged:
            # reserve pages for the WHOLE request — prompt plus decode
            # growth (capped at max_seq): admission that only budgets
            # the prompt lets the pool run out mid-decode, where the
            # saturating append would silently drop KV rows (the
            # force-finish backstop in _maybe_finish catches that, but
            # reservation keeps it an edge case, not a steady state)
            # appended rows = prompt + (max_new - 1): the final output
            # token is sampled but its KV row is never written
            rows = len(req.prompt) + max(req.max_new_tokens - 1, 0)
            if self.max_seq is not None:
                rows = min(rows, self.max_seq)
            # liveness cap: a request bigger than the whole pool would
            # defer forever — admit it when the pool is otherwise free
            # and let the exhaustion backstop truncate it
            needed = min(-(-rows // self.page_size), self.num_pages - 1)
            if int(self.caches[0].free_top) < needed:
                self.queue.appendleft(req)
                return False
        prompt = jnp.asarray(req.prompt, jnp.int32)
        last_logits, cache_single = self._prefill(prompt)
        seed_key = jax.random.PRNGKey(req.seed)
        first = sample_token(
            last_logits,
            position_key(seed_key, jnp.uint32(len(req.prompt))),
            jnp.float32(req.temperature),
            jnp.int32(req.top_k),
            jnp.float32(req.top_p),
        )
        if self.paged:
            self.caches = _splice_paged(
                self.caches, cache_single, jnp.int32(slot),
                jnp.int32(len(req.prompt)),
            )
            self.active = self.active.at[slot].set(True)
        else:
            self.caches = jax.tree.map(
                lambda full, one: full.at[slot].set(one),
                self.caches, cache_single,
            )
            if self.prefill_chunk:
                # chunked prefill appended pad rows past the true length:
                # reset the fill pointer so decode appends overwrite them
                self.caches = [
                    c.replace(length=c.length.at[slot].set(len(req.prompt)))
                    for c in self.caches
                ]
        self.offsets = self.offsets.at[slot].set(len(req.prompt))
        self.next_tok = self.next_tok.at[slot, 0].set(first)
        self.temps = self.temps.at[slot].set(req.temperature)
        self.topks = self.topks.at[slot].set(req.top_k)
        self.topps = self.topps.at[slot].set(req.top_p)
        self.seed_keys = self.seed_keys.at[slot].set(seed_key)
        req.output.append(int(first))
        self.slot_req[slot] = req
        self._maybe_finish(slot)
        return True

    def _prefill(self, prompt: jax.Array):
        """Prefill a request alone; returns (last-position logits (V,),
        single-slot cache list).

        Default: one ``model.forward`` at the exact prompt length (one
        compile per DISTINCT length). With ``prefill_chunk=C``: the
        prompt is padded to a multiple of C and streamed through
        ``ceil(L/C)`` fixed-shape forward calls — one compiled program
        for every prompt length. Pad rows write garbage K/V past the
        true length; callers reset the fill pointer to the true length
        (splice / paged_insert_from_dense), so decode appends overwrite
        them. Falls back to exact-length prefill when padding would
        overflow the cache (L close to max_seq)."""
        length = int(prompt.shape[0])
        c = self.prefill_chunk
        if c and (self.max_seq is None or -(-length // c) * c <= self.max_seq):
            pad = (-length) % c
            toks = (
                jnp.concatenate([prompt, jnp.zeros((pad,), jnp.int32)])
                if pad
                else prompt
            )
            cache = self.model.init_cache()
            last = None
            for i in range(toks.shape[0] // c):
                logits, cache = self.model.forward(
                    toks[i * c : (i + 1) * c], cache, jnp.int32(i * c)
                )
                if i == (length - 1) // c:
                    last = logits[(length - 1) % c]
            return last, cache
        logits, cache = self.model.forward(
            prompt, self.model.init_cache(), jnp.int32(0)
        )
        return logits[-1], cache

    def _maybe_finish(
        self,
        slot: int,
        offset: Optional[int] = None,
        kv_len: Optional[int] = None,
    ) -> None:
        req = self.slot_req[slot]
        if req is None:
            return
        hit_eos = req.eos is not None and req.output and req.output[-1] == req.eos
        # capacity guard: a slot at offset >= max_seq cannot append
        # another KV row — finish (truncate) it. ``offset`` is the
        # host-side value when the caller already fetched the batch
        # (one device_get per STEP, not per slot — tunnel latency)
        if offset is None:
            offset = int(self.offsets[slot])
        full = self.max_seq is not None and offset >= self.max_seq
        # paged backstop: if the cache fill pointer trails the offset,
        # an append was dropped (pool exhausted mid-decode) — finishing
        # the slot (truncation) frees its pages; continuing would decode
        # against an incomplete cache (silent divergence). Admission
        # reserves decode growth, so this only fires on pathological
        # over-subscription
        pool_oom = self.paged and kv_len is not None and kv_len < offset
        if (
            len(req.output) >= req.max_new_tokens
            or hit_eos
            or full
            or pool_oom
        ):
            req.done = True
            self.finished[req.rid] = req
            self.slot_req[slot] = None
            if self.paged:
                # eviction returns the slot's pages to the pool NOW —
                # the whole point of paging (dense slots just recycle
                # their reserved rows at the next admission)
                self.caches = _free_all(self.caches, jnp.int32(slot))
                self.active = self.active.at[slot].set(False)

    # -- the loop -----------------------------------------------------------

    def step(self) -> None:
        """Admit queued requests into free slots, then one batched decode
        step for every slot (active lanes consume their token; idle lanes
        compute masked garbage — the program shape never changes)."""
        for slot in self._free_slots():
            if not self.queue:
                break
            if not self._admit(slot, self.queue.popleft()):
                break  # pool full: later requests wait their FIFO turn
        if not any(r is not None for r in self.slot_req):
            return
        from .sampling import position_key, sample_token_batch

        if self.paged:
            logits, self.caches = self.model.decode_batch_paged(
                self.next_tok, self.caches, self.offsets, self.active
            )
        else:
            # decode_batch (when the model provides it) is the M=B fast
            # path: one matmul per projection for the whole batch instead
            # of B vmapped M=1 matmuls — same per-request numerics, ~B×
            # the weight-read amortization (decode is weight-bound)
            step_fn = getattr(self.model, "decode_batch", None) or (
                self.model.forward_batch
            )
            logits, self.caches = step_fn(
                self.next_tok, self.caches, self.offsets
            )
        # the token produced from the input at position `off` sits at
        # position off+1 — key it by that position (matches the isolated
        # generate_sampled run token for token)
        keys = jax.vmap(position_key)(self.seed_keys, self.offsets + 1)
        toks = sample_token_batch(
            logits[:, 0, :], keys, self.temps, self.topks, self.topps
        )
        self.offsets = self.offsets + 1
        self.next_tok = toks[:, None]
        if self.paged:
            host_toks, host_offs, host_lens = jax.device_get(
                (toks, self.offsets, self.caches[0].lengths)
            )
        else:
            host_toks, host_offs = jax.device_get((toks, self.offsets))
            host_lens = None
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            req.output.append(int(host_toks[slot]))
            self._maybe_finish(
                slot,
                offset=int(host_offs[slot]),
                kv_len=None if host_lens is None else int(host_lens[slot]),
            )

    def run(self, max_steps: int = 10_000) -> Dict[int, Request]:
        """Drive until every submitted request finishes (or max_steps)."""
        for _ in range(max_steps):
            if not self.queue and all(r is None for r in self.slot_req):
                break
            self.step()
        return self.finished
