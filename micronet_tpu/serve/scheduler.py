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
    """Admission/eviction scheduler over ``model.forward_batch`` slots."""

    def __init__(self, model, max_slots: int):
        self.model = model
        self.b = max_slots
        self.caches = model.init_cache_batch(max_slots)
        self.offsets = jnp.zeros((max_slots,), jnp.int32)
        self.next_tok = jnp.zeros((max_slots, 1), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * max_slots
        self.queue: Deque[Request] = deque()
        self.finished: Dict[int, Request] = {}
        self._fresh_single = model.init_cache()
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
        # rather than clamp-overwriting the last cache position
        try:
            self.max_seq = int(model.init_cache()[0].max_seq)
        except Exception:
            self.max_seq = None

    # -- request lifecycle --------------------------------------------------

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req) if r is None]

    def _admit(self, slot: int, req: Request) -> None:
        """Prefill ``req`` alone, then splice cache/offset/token into the
        batch state at ``slot`` (device state of the slot is fully
        overwritten — recycling cannot leak the previous request)."""
        from .sampling import position_key, sample_token

        prompt = jnp.asarray(req.prompt, jnp.int32)
        logits, cache_single = self.model.forward(
            prompt, self.model.init_cache(), jnp.int32(0)
        )
        seed_key = jax.random.PRNGKey(req.seed)
        first = sample_token(
            logits[-1],
            position_key(seed_key, jnp.uint32(len(req.prompt))),
            jnp.float32(req.temperature),
            jnp.int32(req.top_k),
            jnp.float32(req.top_p),
        )
        self.caches = jax.tree.map(
            lambda full, one: full.at[slot].set(one), self.caches, cache_single
        )
        self.offsets = self.offsets.at[slot].set(len(req.prompt))
        self.next_tok = self.next_tok.at[slot, 0].set(first)
        self.temps = self.temps.at[slot].set(req.temperature)
        self.topks = self.topks.at[slot].set(req.top_k)
        self.topps = self.topps.at[slot].set(req.top_p)
        self.seed_keys = self.seed_keys.at[slot].set(seed_key)
        req.output.append(int(first))
        self.slot_req[slot] = req
        self._maybe_finish(slot)

    def _maybe_finish(self, slot: int, offset: Optional[int] = None) -> None:
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
        if len(req.output) >= req.max_new_tokens or hit_eos or full:
            req.done = True
            self.finished[req.rid] = req
            self.slot_req[slot] = None  # slot recycles at next admission

    # -- the loop -----------------------------------------------------------

    def step(self) -> None:
        """Admit queued requests into free slots, then one batched decode
        step for every slot (active lanes consume their token; idle lanes
        compute masked garbage — the program shape never changes)."""
        for slot in self._free_slots():
            if not self.queue:
                break
            self._admit(slot, self.queue.popleft())
        if not any(r is not None for r in self.slot_req):
            return
        from .sampling import position_key, sample_token_batch

        # decode_batch (when the model provides it) is the M=B fast path:
        # one matmul per projection for the whole batch instead of B
        # vmapped M=1 matmuls — same per-request numerics, ~B× the
        # weight-read amortization (decode is weight-bound)
        step_fn = getattr(self.model, "decode_batch", None) or (
            self.model.forward_batch
        )
        logits, self.caches = step_fn(self.next_tok, self.caches, self.offsets)
        # the token produced from the input at position `off` sits at
        # position off+1 — key it by that position (matches the isolated
        # generate_sampled run token for token)
        keys = jax.vmap(position_key)(self.seed_keys, self.offsets + 1)
        toks = sample_token_batch(
            logits[:, 0, :], keys, self.temps, self.topks, self.topps
        )
        self.offsets = self.offsets + 1
        self.next_tok = toks[:, None]
        host_toks, host_offs = jax.device_get((toks, self.offsets))
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            req.output.append(int(host_toks[slot]))
            self._maybe_finish(slot, offset=int(host_offs[slot]))

    def run(self, max_steps: int = 10_000) -> Dict[int, Request]:
        """Drive until every submitted request finishes (or max_steps)."""
        for _ in range(max_steps):
            if not self.queue and all(r is None for r in self.slot_req):
                break
            self.step()
        return self.finished
