"""Mixture-of-Experts with expert parallelism over an ``expert`` mesh axis.

Net-new vs the reference (SURVEY.md §2.9: no EP — no parallelism beyond
``nn.DataParallel`` — anywhere), completing the classic mode set next to
dp/tp/pp (`parallel/sharding.py`, `parallel/pipeline.py`). TPU-first
design, GShard-style top-1 routing:

- **Static capacity dispatch**: every shape is fixed at trace time. The
  router's choices become a one-hot dispatch tensor ``D (T, E, C)`` built
  with a cumsum slot assignment; gather/scatter to expert slots are
  einsums against ``D`` (MXU work, no dynamic shapes, no sorts). Tokens
  past an expert's capacity are dropped (output 0 — the residual
  connection carries them), exactly the GShard/Switch contract.
- **Expert parallelism** (:func:`moe_apply_ep`): expert weights are
  sharded over the ``expert`` mesh axis (each device holds ``E/ep``
  experts' parameters — the memory win); activations are replicated
  along the axis, every device computes its local experts' slots only
  (the FLOP win), and the combine is one ``psum`` over ICI.
- **Weight-only quantized experts** (:func:`quantize_moe`): expert
  matrices stored as int8 codes + per-(expert, column) scales via the
  same RTN core as the LLM serving kit (`quant/weight_only.py`); dequant
  fuses into the einsum prologue.

The dense path (:func:`moe_apply`) is the correctness oracle: the EP
path equals it bitwise up to reduction order (tests assert allclose and
gradient parity on an 8-device CPU mesh).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "MoEParams",
    "init_moe",
    "quantize_moe",
    "moe_apply",
    "moe_apply_ep",
    "moe_apply_ep_a2a",
    "load_balance_loss",
]


@struct.dataclass
class MoEParams:
    """Top-1 MoE MLP parameters. ``w_up``/``w_down`` are float
    ``(E, dim, mlp)`` / ``(E, mlp, dim)`` — or int8 codes with
    ``up_scale``/``down_scale`` ``(E, 1, cols)`` after :func:`quantize_moe`."""

    router: jax.Array  # (dim, E) f32
    w_up: jax.Array  # (E, dim, mlp)
    w_down: jax.Array  # (E, mlp, dim)
    up_scale: Optional[jax.Array] = None
    down_scale: Optional[jax.Array] = None

    def up(self) -> jax.Array:
        if self.up_scale is None:
            return self.w_up
        return self.w_up.astype(self.up_scale.dtype) * self.up_scale

    def down(self) -> jax.Array:
        if self.down_scale is None:
            return self.w_down
        return self.w_down.astype(self.down_scale.dtype) * self.down_scale


def init_moe(
    dim: int, mlp_dim: int, n_experts: int, key: jax.Array
) -> MoEParams:
    kr, ku, kd = jax.random.split(key, 3)
    s = 1.0 / math.sqrt(dim)
    return MoEParams(
        router=jax.random.normal(kr, (dim, n_experts), jnp.float32) * 0.02,
        w_up=jax.random.normal(ku, (n_experts, dim, mlp_dim), jnp.float32) * s,
        w_down=jax.random.normal(kd, (n_experts, mlp_dim, dim), jnp.float32)
        / math.sqrt(mlp_dim),
    )


def quantize_moe(params: MoEParams) -> MoEParams:
    """Int8 weight-only expert storage: symmetric RTN per (expert, column),
    the same core as ``quant/weight_only.quantize_int8_weight`` vmapped
    over the expert dim. Router stays float (it is tiny and decides
    routing — quantizing it changes which expert runs, not just values)."""
    from ..ops.int4_matmul import symmetric_rtn

    def q(w):  # (E, K, N) -> codes (E, K, N) int8, scale (E, 1, N)
        return jax.vmap(lambda m: symmetric_rtn(m, 127.0, 0))(w)

    up_c, up_s = q(params.w_up)
    dn_c, dn_s = q(params.w_down)
    return MoEParams(
        router=params.router,
        w_up=up_c,
        w_down=dn_c,
        up_scale=up_s,
        down_scale=dn_s,
    )


def _capacity(
    n_tokens: int, n_experts: int, capacity_factor: float, top_k: int = 1
) -> int:
    return max(1, int(math.ceil(capacity_factor * top_k * n_tokens / n_experts)))


def _dispatch(
    logits: jax.Array, capacity: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-1 dispatch: router logits (T, E) -> (gate (T,), D (T, E, C)).

    ``D[t, e, c] = 1`` iff token t is the c-th token routed to expert e
    and c < capacity. Slot assignment is a cumsum over the (static)
    token order — deterministic, shape-static, sort-free."""
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(logits, axis=-1)  # (T,)
    onehot = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    gate = jnp.sum(probs * onehot, axis=-1)  # (T,)
    # slot within expert (only meaningful where routed)
    pos = jnp.cumsum(onehot, axis=0).astype(jnp.int32) - 1
    # one_hot is 0 for out-of-range values, so pos >= capacity (dropped)
    # and pos < 0 (not routed here) both vanish without an explicit mask
    dmat = jax.nn.one_hot(pos, capacity, dtype=logits.dtype) * onehot[..., None]
    return gate, dmat


def _dispatch_topk(
    logits: jax.Array, capacity: int, top_k: int
) -> Tuple[jax.Array, jax.Array]:
    """GShard top-k dispatch (the actual GShard default is k=2):
    logits (T, E) -> (dispatch D (T, E, C) in {0,1}, combine W (T, E, C)).

    Gates are the router probabilities of the chosen experts,
    renormalized over the k choices (GShard eq. 4). Slot accounting is
    choice-major: every token's 1st choice queues before ANY token's 2nd
    choice (GShard's "second expert gets leftover capacity" rule), so a
    capacity squeeze preferentially drops 2nd choices. ``out = einsum(
    y, W)`` — dropped choices contribute 0 and the residual carries them.
    """
    t, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    _, idx = jax.lax.top_k(logits, top_k)  # (T, k)
    onehots = [
        jax.nn.one_hot(idx[:, j], e, dtype=logits.dtype) for j in range(top_k)
    ]
    gates = [jnp.sum(probs * oh, axis=-1) for oh in onehots]  # k x (T,)
    denom = sum(gates) + 1e-9
    gates = [g / denom for g in gates]
    dmat = jnp.zeros((t, e, capacity), logits.dtype)
    comb = jnp.zeros((t, e, capacity), logits.dtype)
    base = jnp.zeros((e,), jnp.int32)  # slots consumed by earlier choices
    for j in range(top_k):
        oh = onehots[j]
        pos = jnp.cumsum(oh, axis=0).astype(jnp.int32) - 1 + base[None, :]
        d_j = jax.nn.one_hot(pos, capacity, dtype=logits.dtype) * oh[..., None]
        dmat = dmat + d_j
        comb = comb + d_j * gates[j][:, None, None]
        base = base + jnp.sum(oh, axis=0).astype(jnp.int32)
    return dmat, comb


def _expert_mlp(xe: jax.Array, w_up: jax.Array, w_down: jax.Array) -> jax.Array:
    """(E, C, dim) expert slots through each expert's MLP."""
    h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xe, w_up))
    return jnp.einsum("ecf,efd->ecd", h, w_down)


def moe_apply(
    params: MoEParams,
    x: jax.Array,
    capacity_factor: float = 1.25,
    top_k: int = 1,
) -> jax.Array:
    """Dense (single-device) top-k MoE forward: x (T, dim) -> (T, dim).

    ``top_k=1`` keeps the Switch-style routing of rounds 1-2 bit-for-bit;
    ``top_k=2`` is the actual GShard configuration (renormalized gates,
    choice-major capacity). The correctness oracle for the EP paths;
    identical routing, capacity, and drop semantics."""
    n_experts = params.router.shape[-1]
    cap = _capacity(x.shape[0], n_experts, capacity_factor, top_k)
    logits = x @ params.router
    if top_k == 1:
        gate, dmat = _dispatch(logits, cap)
        comb = dmat * gate[:, None, None]
    else:
        dmat, comb = _dispatch_topk(logits, cap, top_k)
    xe = jnp.einsum("td,tec->ecd", x, dmat)
    y = _expert_mlp(xe, params.up(), params.down())
    return jnp.einsum("ecd,tec->td", y, comb)


def moe_apply_ep(
    params: MoEParams,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "expert",
    capacity_factor: float = 1.25,
) -> jax.Array:
    """Expert-parallel forward: expert weights sharded over ``axis``
    (each device holds E/ep experts), activations replicated along it,
    combine via ``psum``. Semantics == :func:`moe_apply`. Differentiable
    (psum/slice transpose rules give the EP backward for free)."""
    ep = mesh.shape[axis]
    n_experts = params.router.shape[-1]
    assert n_experts % ep == 0, (n_experts, ep)
    e_local = n_experts // ep
    cap = _capacity(x.shape[0], n_experts, capacity_factor)

    def shard_fn(router, w_up, w_down, up_s, down_s, x):
        k = jax.lax.axis_index(axis)
        logits = x @ router  # replicated: every device routes identically
        gate, dmat = _dispatch(logits, cap)
        d_local = jax.lax.dynamic_slice_in_dim(dmat, k * e_local, e_local, 1)
        up = w_up if up_s is None else w_up.astype(up_s.dtype) * up_s
        down = w_down if down_s is None else w_down.astype(down_s.dtype) * down_s
        xe = jnp.einsum("td,tec->ecd", x, d_local)
        y = _expert_mlp(xe, up, down)
        out = jnp.einsum("ecd,tec->td", y, d_local) * gate[:, None]
        return jax.lax.psum(out, axis)

    from jax import shard_map

    quantized = params.up_scale is not None
    scale_spec = P(axis) if quantized else None
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), scale_spec, scale_spec, P()),
        out_specs=P(),
        check_vma=False,
    )(params.router, params.w_up, params.w_down, params.up_scale, params.down_scale, x)


def moe_apply_ep_a2a(
    params: MoEParams,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "expert",
    capacity_factor: float = 1.25,
    top_k: int = 2,
) -> jax.Array:
    """Expert parallelism with GShard's all-to-all token exchange — the
    scalable dispatch (VERDICT r2 item 9).

    Unlike :func:`moe_apply_ep` (activations replicated; every device
    builds the full (T, E, C) dispatch), tokens here are SHARDED over
    ``axis``: each device routes its own T/ep tokens, builds a local
    (T_l, E, C_l) dispatch, and two ``all_to_all`` collectives move the
    expert slots to/from their owners — per-device dispatch work and ICI
    volume are O(T_l * cf * k * dim), independent of the mesh size.

    Semantics: capacity is accounted PER SHARD (C_l slots per expert per
    token shard — GShard's data-parallel behavior), so the oracle is
    ``vmap(moe_apply)`` over the token shards, not one global dispatch.
    Differentiable: all_to_all is its own transpose, so AD gives the
    backward exchange for free.
    """
    ep = mesh.shape[axis]
    n_experts = params.router.shape[-1]
    assert n_experts % ep == 0, (n_experts, ep)
    assert x.shape[0] % ep == 0, (x.shape, ep)
    e_local = n_experts // ep
    t_local = x.shape[0] // ep
    cap = _capacity(t_local, n_experts, capacity_factor, top_k)
    dim = x.shape[-1]

    def shard_fn(router, w_up, w_down, up_s, down_s, x_l):
        logits = x_l @ router  # (T_l, E) — each shard routes its tokens
        if top_k == 1:
            gate, dmat = _dispatch(logits, cap)
            comb = dmat * gate[:, None, None]
        else:
            dmat, comb = _dispatch_topk(logits, cap, top_k)
        xe = jnp.einsum("td,tec->ecd", x_l, dmat)  # (E, C_l, dim)
        # exchange: send each expert-owner its slots; receive every
        # shard's slots for OUR experts -> (ep, e_local, C_l, dim) with
        # dim 0 = source shard
        xe = xe.reshape(ep, e_local, cap, dim)
        xr = jax.lax.all_to_all(xe, axis, split_axis=0, concat_axis=0)
        xr = xr.transpose(1, 0, 2, 3).reshape(e_local, ep * cap, dim)
        up = w_up if up_s is None else w_up.astype(up_s.dtype) * up_s
        down = w_down if down_s is None else w_down.astype(down_s.dtype) * down_s
        y = _expert_mlp(xr, up, down)  # (e_local, ep*C_l, dim)
        y = y.reshape(e_local, ep, cap, dim).transpose(1, 0, 2, 3)
        yr = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0)
        yr = yr.reshape(n_experts, cap, dim)  # our tokens' slots, all experts
        return jnp.einsum("ecd,tec->td", yr, comb)

    from jax import shard_map

    quantized = params.up_scale is not None
    scale_spec = P(axis) if quantized else None
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), scale_spec, scale_spec, P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(
        params.router,
        params.w_up,
        params.w_down,
        params.up_scale,
        params.down_scale,
        x,
    )


def load_balance_loss(logits: jax.Array) -> jax.Array:
    """GShard/Switch auxiliary load-balancing loss:
    ``E * sum_e f_e * P_e`` where ``f_e`` is the fraction of tokens
    top-1-routed to expert e and ``P_e`` the mean router probability.
    Add ``lambda * load_balance_loss(x @ router)`` to the train loss."""
    n_experts = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(logits, -1), n_experts, dtype=logits.dtype)
    return n_experts * jnp.sum(onehot.mean(axis=0) * probs.mean(axis=0))
