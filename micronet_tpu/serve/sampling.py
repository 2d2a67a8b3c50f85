"""Token sampling for the serving loop: temperature / top-k / top-p.

The reference's deploy leg has no sampling at all (classification
engines); production LLM serving needs it. Design constraints, TPU-first:

- ONE jitted program for every lane of the continuous batch: temperature,
  top_k, and top_p are *traced per-slot arrays*, not Python branches, so a
  greedy request and a creative request share the compiled step (no
  recompile when a request with different sampling params joins).
- DETERMINISM independent of batch membership: the PRNG key for the token
  at absolute position ``p`` of request ``r`` is
  ``fold_in(PRNGKey(r.seed), p)`` — a function of the request alone. A
  request therefore samples the same tokens whether it runs isolated or
  shares the batch with anything else (the ServeLoop isolation oracle
  extends to stochastic decoding).
- top-k and top-p are DYNAMIC values over a static-shape sort: the k-th
  logit / nucleus threshold is gathered from the sorted array, so the
  program shape never depends on k or p.

``temperature == 0`` means greedy (argmax), the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sample_token",
    "sample_token_batch",
    "position_key",
    "generate_sampled",
]


def position_key(seed_key: jax.Array, position: jax.Array) -> jax.Array:
    """The PRNG key for the token generated at absolute ``position`` —
    a pure function of (request seed, position), never of batch layout."""
    return jax.random.fold_in(seed_key, position.astype(jnp.uint32))


def sample_token(
    logits: jax.Array,  # (V,) f32
    key: jax.Array,
    temperature: jax.Array,  # scalar f32; 0 => greedy
    top_k: jax.Array,  # scalar int32; 0 => no k-cut
    top_p: jax.Array,  # scalar f32; 1 => no nucleus cut
) -> jax.Array:
    """One token id (int32). All sampling params are traced scalars."""
    v = logits.shape[-1]
    greedy = jnp.argmax(logits).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)

    desc = jnp.sort(scaled)[::-1]  # (V,) descending
    # top-k: logits strictly below the k-th largest are cut. k<=0 or k>=V
    # disables the cut (threshold = the minimum logit).
    k = jnp.clip(top_k, 0, v)
    kth = jnp.where(k > 0, desc[jnp.clip(k - 1, 0, v - 1)], desc[v - 1])
    keep = scaled >= kth

    # top-p (nucleus): smallest prefix of the descending-prob list with
    # cumulative mass >= top_p; a logit is kept iff its probability is
    # >= the last included one. cs - ps < top_p includes the first
    # element that crosses the threshold (standard nucleus convention).
    probs_desc = jax.nn.softmax(desc)
    cs = jnp.cumsum(probs_desc)
    included = (cs - probs_desc) < top_p
    # threshold = min prob among included entries (at least desc[0])
    thr_logit = jnp.min(jnp.where(included, desc, jnp.inf))
    keep = jnp.logical_and(keep, scaled >= thr_logit)

    masked = jnp.where(keep, scaled, -jnp.inf)
    sampled = jax.random.categorical(key, masked).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy)


def sample_token_batch(
    logits: jax.Array,  # (B, V)
    keys: jax.Array,  # (B, 2) / (B,) key batch
    temperature: jax.Array,  # (B,)
    top_k: jax.Array,  # (B,)
    top_p: jax.Array,  # (B,)
) -> jax.Array:
    """Per-slot sampling for the continuous batch (vmap of
    :func:`sample_token` — one compiled program for all lanes)."""
    return jax.vmap(sample_token)(logits, keys, temperature, top_k, top_p)


def generate_sampled(
    model,
    prompt: jax.Array,  # (T,) int32
    steps: int,
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    seed: int = 0,
):
    """Isolated sampled decode of ``steps`` tokens after ``prompt`` —
    the single-request oracle for the continuous-batching loop: a
    ``Request`` with the same sampling params produces these exact
    tokens regardless of what shares its batch."""
    base = jax.random.PRNGKey(seed)
    t = jnp.float32(temperature)
    k = jnp.int32(top_k)
    p = jnp.float32(top_p)
    caches = model.init_cache()
    logits, caches = model.forward(prompt, caches, jnp.int32(0))
    pos = int(prompt.shape[0])
    tok = sample_token(logits[-1], position_key(base, jnp.uint32(pos)), t, k, p)
    out = [int(tok)]
    for _ in range(steps - 1):
        logits, caches = model.forward(tok[None], caches, jnp.int32(pos))
        pos += 1
        tok = sample_token(
            logits[-1], position_key(base, jnp.uint32(pos)), t, k, p
        )
        out.append(int(tok))
    return jnp.asarray(out, jnp.int32)
