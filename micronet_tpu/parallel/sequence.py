"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

Net-new vs the reference (SURVEY.md §5 "long-context: absent — vision
CNNs only"), completing the classic parallel mode set (dp/tp/pp/ep in
the sibling modules). TPU-first long-context design:

- The sequence is sharded over the ``seq`` mesh axis: each device holds
  a contiguous (T/S, H, D) block of q, k, v. Activations never
  materialize the full sequence on one chip — the memory ceiling per
  device is O(T/S), which is what makes million-token contexts fit.
- A ``lax.scan`` of S ticks rotates the K/V blocks around the ring with
  ``lax.ppermute`` (neighbor ICI exchange, no all-gather): at tick s a
  device attends its local queries against the block that started
  (i - s) mod S hops away, maintaining flash-attention online-softmax
  accumulators (running row max m, normalizer l, weighted sum acc) so
  the result is exact, not approximate.
- Causal masking uses global positions reconstructed from the ring
  index, so the semantics match a plain masked attention on the
  gathered sequence (the oracle in tests/test_sequence_parallel.py).
- Backward is AD through scan+ppermute (the same property the pipeline
  module exploits): the cotangent ring runs in reverse automatically.

``ring_attention`` is the sharded entry; ``attention_reference`` is the
dense oracle with identical scaling/masking conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention", "attention_reference"]


def attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, causal: bool = True
) -> jax.Array:
    """Dense multi-head attention oracle: q,k,v (T, H, D) -> (T, H, D)."""
    d = q.shape[-1]
    scores = jnp.einsum("thd,shd->hts", q, k) / jnp.sqrt(float(d))
    if causal:
        t = q.shape[0]
        mask = jnp.arange(t)[:, None] >= jnp.arange(t)[None, :]
        scores = jnp.where(mask[None], scores, -jnp.inf)
    return jnp.einsum("hts,shd->thd", jax.nn.softmax(scores, axis=-1), v)


def ring_attention(
    q: jax.Array,  # (T, H, D) — sharded over T on `axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = True,
) -> jax.Array:
    """Exact attention with the sequence sharded over ``axis``.

    Equals :func:`attention_reference` on the gathered arrays (up to
    reduction order); per-device memory is O(T/S * T/S) score blocks
    instead of O(T^2). Differentiable end to end.
    """
    s_devices = mesh.shape[axis]
    t_total, n_heads, d = q.shape
    assert t_total % s_devices == 0, (t_total, s_devices)
    t_loc = t_total // s_devices
    scale = 1.0 / jnp.sqrt(float(d))
    # send each block to the NEXT device; after tick s, the resident block
    # on device i is the one that started at (i - s) mod S
    perm = [(i, (i + 1) % s_devices) for i in range(s_devices)]
    neg_big = jnp.asarray(-1e30, jnp.float32)

    def shard_fn(q, k, v):
        i = jax.lax.axis_index(axis)
        q_pos = i * t_loc + jnp.arange(t_loc)  # global positions of local q
        qf = q.astype(jnp.float32)

        def tick(carry, s):
            k_blk, v_blk, acc, m, l = carry
            src = (i - s) % s_devices
            k_pos = src * t_loc + jnp.arange(t_loc)
            scores = (
                jnp.einsum("thd,uhd->htu", qf, k_blk.astype(jnp.float32)) * scale
            )  # (H, t_loc, t_loc)
            if causal:
                ok = q_pos[None, :, None] >= k_pos[None, None, :]
                scores = jnp.where(ok, scores, neg_big)
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1))  # (H, t_loc)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new[..., None])
            if causal:
                # rows with no visible key yet: keep p exactly 0 (exp of
                # neg_big underflows anyway; this guards the all-masked row)
                p = jnp.where(ok, p, 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "htu,uhd->htd", p, v_blk.astype(jnp.float32)
            )
            k_nxt, v_nxt = jax.lax.ppermute((k_blk, v_blk), axis, perm)
            return (k_nxt, v_nxt, acc_new, m_new, l_new), None

        acc0 = jnp.zeros((n_heads, t_loc, d), jnp.float32)
        m0 = jnp.full((n_heads, t_loc), neg_big)
        l0 = jnp.zeros((n_heads, t_loc), jnp.float32)
        (_, _, acc, _, l), _ = jax.lax.scan(
            tick, (k, v, acc0, m0, l0), jnp.arange(s_devices)
        )
        out = acc / jnp.maximum(l, 1e-30)[..., None]  # (H, t_loc, D)
        return out.transpose(1, 0, 2).astype(q.dtype)

    from jax import shard_map

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(q, k, v)
