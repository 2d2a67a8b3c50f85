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
    balanced: bool = True,
) -> jax.Array:
    """Exact attention with the sequence sharded over ``axis``.

    Equals :func:`attention_reference` on the gathered arrays (up to
    reduction order); per-device memory is O(T/S * T/S) score blocks
    instead of O(T^2). Differentiable end to end.

    Causal mode defaults to the ZIGZAG (striped) schedule
    (:func:`_ring_attention_zigzag`): a contiguous layout wastes ~2x FLOPs
    (every device computes all S score blocks and masks half away, and the
    last device is the critical path every tick). Pass ``balanced=False``
    to force the contiguous schedule (kept as the oracle for the zigzag
    parity test and for odd local lengths, where zigzag can't split the
    block).
    """
    if causal and balanced and mesh.shape[axis] > 1:
        t_loc_ = q.shape[0] // mesh.shape[axis]
        if t_loc_ % 2 == 0:
            return _ring_attention_zigzag(q, k, v, mesh, axis)
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


def _ring_attention_zigzag(
    q: jax.Array,  # (T, H, D) — contiguously sharded over T on `axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
) -> jax.Array:
    """Causal ring attention with the ZIGZAG (striped) block layout — the
    load-balanced schedule (VERDICT r2 weak item 5).

    With contiguous blocks, causal masking makes device i need only blocks
    0..i: device S-1 computes S blocks while device 0 computes 1, and since
    every tick is a ring barrier the wall-clock is set by the busiest
    device — half the FLOPs are masked away and the balance is the worst
    possible. The zigzag layout splits T into 2S stripes of h = T/(2S) and
    gives device i stripes (i, 2S-1-i). Then:

    - tick 0 (diagonal): the two local triangular blocks plus the one full
      block (late stripe vs early stripe) — ~2 full-block equivalents;
    - ticks 1..S-1: exactly TWO full, UNMASKED block pairs per device —
      (q_late vs k_early) always, plus (q_early vs k_early) when the
      source stripe is strictly past, or (q_late vs k_late) when it is
      strictly future. No wasted work, no masks, identical cost on every
      device: total = S(2S+1) h^2-blocks — exactly the causal optimum.

    The function takes and returns CONTIGUOUS sharding (same contract as
    :func:`ring_attention`): two fixed ppermutes redistribute stripes to
    the zigzag layout on entry and back on exit (h-sized neighbor
    exchanges, amortized over the S-tick ring). Differentiable end to end.
    """
    s_devices = mesh.shape[axis]
    t_total, n_heads, d = q.shape
    assert t_total % (2 * s_devices) == 0, (t_total, s_devices)
    t_loc = t_total // s_devices
    h = t_loc // 2
    scale = 1.0 / jnp.sqrt(float(d))
    neg_big = jnp.asarray(-1e30, jnp.float32)

    # stripe 2i (each device's first half) lives on device t_e(i); stripe
    # 2i+1 (second half) on t_o(i) — both maps are device permutations
    t_e = [2 * i if 2 * i < s_devices else 2 * s_devices - 1 - 2 * i
           for i in range(s_devices)]
    t_o = [2 * i + 1 if 2 * i + 1 < s_devices else 2 * s_devices - 2 - 2 * i
           for i in range(s_devices)]
    perm_even = [(i, t_e[i]) for i in range(s_devices)]
    perm_odd = [(i, t_o[i]) for i in range(s_devices)]
    inv_even = [(t_e[i], i) for i in range(s_devices)]
    inv_odd = [(t_o[i], i) for i in range(s_devices)]
    ring = [(i, (i + 1) % s_devices) for i in range(s_devices)]

    def shard_fn(q, k, v):
        i = jax.lax.axis_index(axis)
        even = (i % 2) == 0

        def to_zigzag(x):
            recv_e = jax.lax.ppermute(x[:h], axis, perm_even)
            recv_o = jax.lax.ppermute(x[h:], axis, perm_odd)
            lo = jnp.where(even, recv_e, recv_o)  # stripe i
            hi = jnp.where(even, recv_o, recv_e)  # stripe 2S-1-i
            return lo, hi

        q_lo, q_hi = to_zigzag(q.astype(jnp.float32))
        k_lo, k_hi = to_zigzag(k.astype(jnp.float32))
        v_lo, v_hi = to_zigzag(v.astype(jnp.float32))

        def block(qf, k_blk, v_blk, m, l, acc, mask=None):
            """One (h x h) online-softmax update; mask=None => full."""
            scores = jnp.einsum("thd,uhd->htu", qf, k_blk) * scale
            if mask is not None:
                scores = jnp.where(mask, scores, neg_big)
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new[..., None])
            if mask is not None:
                p = jnp.where(mask, p, 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "htu,uhd->htd", p, v_blk
            )
            return m_new, l_new, acc_new

        zeros_acc = jnp.zeros((n_heads, h, d), jnp.float32)
        zeros_l = jnp.zeros((n_heads, h), jnp.float32)
        m0 = jnp.full((n_heads, h), neg_big)

        # tick 0 — the diagonal: both local triangular blocks + the one
        # always-needed full block (late stripe attends early stripe)
        tri = jnp.tril(jnp.ones((h, h), bool))[None]  # (1, h, h)
        m_a, l_a, acc_a = block(q_lo, k_lo, v_lo, m0, zeros_l, zeros_acc, tri)
        m_b, l_b, acc_b = block(q_hi, k_hi, v_hi, m0, zeros_l, zeros_acc, tri)
        m_b, l_b, acc_b = block(q_hi, k_lo, v_lo, m_b, l_b, acc_b)

        def tick(carry, s):
            k_lo_b, k_hi_b, v_lo_b, v_hi_b, m_a, l_a, acc_a, m_b, l_b, acc_b = carry
            # rotate first: after one hop the resident pair is the one that
            # started (i - s) hops away
            k_lo_b, k_hi_b, v_lo_b, v_hi_b = jax.lax.ppermute(
                (k_lo_b, k_hi_b, v_lo_b, v_hi_b), axis, ring
            )
            src = (i - s) % s_devices  # stripe pair (src, 2S-1-src)
            # q_hi vs k_lo(src): always fully visible (src <= S-1 < 2S-1-i)
            m_b, l_b, acc_b = block(q_hi, k_lo_b, v_lo_b, m_b, l_b, acc_b)
            # exactly one of: q_lo vs k_lo(src) [src < i: past, full] or
            # q_hi vs k_hi(2S-1-src) [src > i: their late stripe is our
            # past, full] — select operands/accumulators, one einsum
            use_a = src < i
            q_sel = jnp.where(use_a, q_lo, q_hi)
            k_sel = jnp.where(use_a, k_lo_b, k_hi_b)
            v_sel = jnp.where(use_a, v_lo_b, v_hi_b)
            m_s = jnp.where(use_a, m_a, m_b)
            l_s = jnp.where(use_a, l_a, l_b)
            acc_s = jnp.where(use_a, acc_a, acc_b)
            m_s, l_s, acc_s = block(q_sel, k_sel, v_sel, m_s, l_s, acc_s)
            m_a = jnp.where(use_a, m_s, m_a)
            l_a = jnp.where(use_a, l_s, l_a)
            acc_a = jnp.where(use_a, acc_s, acc_a)
            m_b = jnp.where(use_a, m_b, m_s)
            l_b = jnp.where(use_a, l_b, l_s)
            acc_b = jnp.where(use_a, acc_b, acc_s)
            return (
                k_lo_b, k_hi_b, v_lo_b, v_hi_b,
                m_a, l_a, acc_a, m_b, l_b, acc_b,
            ), None

        carry = (k_lo, k_hi, v_lo, v_hi, m_a, l_a, acc_a, m_b, l_b, acc_b)
        if s_devices > 1:
            carry, _ = jax.lax.scan(tick, carry, jnp.arange(1, s_devices))
        _, _, _, _, m_a, l_a, acc_a, m_b, l_b, acc_b = carry

        out_lo = acc_a / jnp.maximum(l_a, 1e-30)[..., None]  # (H, h, D)
        out_hi = acc_b / jnp.maximum(l_b, 1e-30)[..., None]
        out_lo = out_lo.transpose(1, 0, 2)  # (h, H, D)
        out_hi = out_hi.transpose(1, 0, 2)

        # inverse redistribution: send back through the inverted entry
        # permutations so each device's contiguous halves are restored
        send_e = jnp.where(even, out_lo, out_hi)
        send_o = jnp.where(even, out_hi, out_lo)
        half0 = jax.lax.ppermute(send_e, axis, inv_even)
        half1 = jax.lax.ppermute(send_o, axis, inv_odd)
        return jnp.concatenate([half0, half1], axis=0).astype(q.dtype)

    from jax import shard_map

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(q, k, v)
