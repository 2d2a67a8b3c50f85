"""Expert-parallel MoE (parallel/moe.py) — net-new vs the reference
(SURVEY.md §2.9: no EP anywhere), completing dp/tp/pp/ep. The dense
single-device forward is the oracle; the EP shard_map path over an
8-device 'expert' mesh must match it in values AND gradients, for float
and int8 weight-only experts alike."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from micronet_tpu.parallel.moe import (
    init_moe,
    load_balance_loss,
    moe_apply,
    moe_apply_ep,
    quantize_moe,
)

DIM, MLP, E, T = 16, 32, 8, 24


def _mesh(ep=8):
    return Mesh(np.array(jax.devices()[:ep]), ("expert",))


def _setup(seed=0):
    params = init_moe(DIM, MLP, E, jax.random.PRNGKey(seed))
    x = jax.random.normal(jax.random.PRNGKey(seed + 100), (T, DIM), jnp.float32)
    return params, x


@pytest.mark.slow
def test_ep_matches_dense_forward():
    params, x = _setup()
    y_dense = moe_apply(params, x, capacity_factor=2.0)
    y_ep = moe_apply_ep(params, x, _mesh(), capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense), atol=1e-5)


@pytest.mark.slow
def test_ep_matches_dense_with_fewer_devices_than_experts():
    params, x = _setup(1)
    y_dense = moe_apply(params, x, capacity_factor=2.0)
    y_ep = moe_apply_ep(params, x, _mesh(ep=4), capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense), atol=1e-5)


@pytest.mark.slow
def test_ep_gradients_match_dense():
    params, x = _setup(2)
    mesh = _mesh()
    tgt = jax.random.normal(jax.random.PRNGKey(7), (T, DIM))

    def loss_dense(p, xi):
        return jnp.mean((moe_apply(p, xi, 2.0) - tgt) ** 2)

    def loss_ep(p, xi):
        return jnp.mean((moe_apply_ep(p, xi, mesh, capacity_factor=2.0) - tgt) ** 2)

    gd, gxd = jax.grad(loss_dense, argnums=(0, 1))(params, x)
    ge, gxe = jax.grad(loss_ep, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(ge), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gxe), np.asarray(gxd), atol=1e-5)


def test_capacity_drops_overflow_tokens():
    """All tokens routed to one expert + capacity 1 token/expert: exactly
    one token produces output, the rest are dropped to zero (GShard
    contract — the residual connection carries dropped tokens)."""
    params, x = _setup(3)
    x = jnp.abs(x) + 0.1  # positive coords so the rigged logit is positive
    # rig the router: expert 0 wins for every token
    router = jnp.zeros_like(params.router).at[:, 0].set(1.0)
    params = params.replace(router=router)
    y = moe_apply(params, x, capacity_factor=E / T)  # capacity = 1
    nonzero_rows = np.abs(np.asarray(y)).max(axis=1) > 0
    assert nonzero_rows.sum() == 1, nonzero_rows.sum()
    assert nonzero_rows[0]  # cumsum order: the first token takes the slot


@pytest.mark.slow
def test_quantized_ep_matches_quantized_dense():
    params, x = _setup(4)
    qp = quantize_moe(params)
    assert qp.w_up.dtype == jnp.int8 and qp.down_scale is not None
    y_dense = moe_apply(qp, x, 2.0)
    y_ep = moe_apply_ep(qp, x, _mesh(), capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense), atol=1e-5)
    # int8 RTN stays close to the float experts
    y_f = moe_apply(params, x, 2.0)
    err = np.abs(np.asarray(y_dense) - np.asarray(y_f)).max()
    ref = np.abs(np.asarray(y_f)).max()
    assert err < 0.05 * ref, (err, ref)


def test_load_balance_loss_bounds():
    """Uniform routing minimizes the aux loss at ~1; collapsed routing
    drives it toward E."""
    k = jax.random.PRNGKey(0)
    uniform = jax.random.normal(k, (256, E)) * 1e-3
    collapsed = jnp.zeros((256, E)).at[:, 0].set(10.0)
    lu = float(load_balance_loss(uniform))
    lc = float(load_balance_loss(collapsed))
    assert 0.9 < lu < 1.3, lu
    assert lc > 0.9 * E, lc


@pytest.mark.slow
def test_moe_trains_dense_and_ep_identically():
    """A few SGD steps through dense and EP losses keep parameters in
    lockstep — EP is a scheduling change, not a semantics change."""
    params, x = _setup(5)
    mesh = _mesh()
    tgt = jax.random.normal(jax.random.PRNGKey(9), (T, DIM))

    def mk_loss(apply):
        def loss(p):
            return jnp.mean((apply(p) - tgt) ** 2)

        return loss

    ld = mk_loss(lambda p: moe_apply(p, x, 2.0))
    le = mk_loss(lambda p: moe_apply_ep(p, x, mesh, capacity_factor=2.0))
    pd = pe = params
    for _ in range(3):
        pd = jax.tree.map(lambda w, g: w - 0.1 * g, pd, jax.grad(ld)(pd))
        pe = jax.tree.map(lambda w, g: w - 0.1 * g, pe, jax.grad(le)(pe))
    for a, b in zip(jax.tree.leaves(pe), jax.tree.leaves(pd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert float(ld(pd)) < float(ld(params))


def test_moe_decoder_prefill_decode_consistency():
    """TinyDecoder(moe_experts=4): prefill of [t0..t3] then decode t4 ==
    full prefill (drop-free serving capacity keeps routing per-token)."""
    from flax import nnx

    from micronet_tpu.models.tiny_decoder import TinyDecoder

    m = TinyDecoder(vocab=64, dim=32, heads=2, depth=2, mlp_dim=64,
                    max_seq=16, moe_experts=4, rngs=nnx.Rngs(0))
    toks = jnp.asarray([3, 14, 15, 9, 26], jnp.int32)
    logits_full, _ = m.forward(toks, m.init_cache(), jnp.int32(0))
    _, caches = m.forward(toks[:4], m.init_cache(), jnp.int32(0))
    l5, _ = m.forward(toks[4:], caches, jnp.int32(4))
    # prefill attention is f32, the T=1 decode step rides the fused
    # bf16-operand path (ops/decode_attention.py): bf16-class tolerance.
    # A routing/capacity inconsistency would produce O(1) differences.
    np.testing.assert_allclose(
        np.asarray(l5[0]), np.asarray(logits_full[-1]), rtol=2e-2, atol=5e-3
    )


def test_moe_decoder_quantized_tracks_float():
    """quantize_decoder on an MoE decoder: int4 attention + int8 experts
    stay close to the float model; generation runs end to end."""
    from flax import nnx

    from micronet_tpu.models.tiny_decoder import TinyDecoder, quantize_decoder

    kwargs = dict(vocab=64, dim=64, heads=4, depth=2, mlp_dim=128,
                  max_seq=16, moe_experts=4)
    mf = TinyDecoder(**kwargs, rngs=nnx.Rngs(0))
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lf, _ = mf.forward(toks, mf.init_cache(), jnp.int32(0))
    lf = np.asarray(lf)

    def cos_to_float(m):
        lq, _ = m.forward(toks, m.init_cache(), jnp.int32(0))
        lq = np.asarray(lq)
        return float((lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq)))

    # experts-only int8: routing inputs untouched, logits stay tight
    me = TinyDecoder(**kwargs, rngs=nnx.Rngs(0))
    for blk in me.blocks:
        blk.moe.quantize_()
    assert me.blocks[0].moe.w_up[...].dtype == jnp.int8
    assert cos_to_float(me) > 0.99

    # full serving conversion (W4 attention + int8 experts): the quantized
    # attention perturbs the router input, so a token may flip its top-1
    # expert — on an untrained random model that flip is an uncorrelated
    # output swap, hence the looser bound (real MoE serving accepts this;
    # trained experts are correlated, so flips cost far less)
    mq = quantize_decoder(TinyDecoder(**kwargs, rngs=nnx.Rngs(0)), group=32)
    assert cos_to_float(mq) > 0.9
    out = mq.generate(toks, steps=4)
    assert out.shape == (4,) and int(out.max()) < 64


# ---------------------------------------------------------------------------
# round 3: top-2 routing + all-to-all EP dispatch (VERDICT r2 item 9)
# ---------------------------------------------------------------------------


def test_top2_gates_renormalize_and_match_manual():
    """Drop-free top-2 == manual mixture of the two chosen experts with
    renormalized router probabilities."""
    from micronet_tpu.parallel.moe import _expert_mlp

    params, x = _setup(3)
    y = moe_apply(params, x, capacity_factor=float(E), top_k=2)
    logits = x @ params.router
    probs = jax.nn.softmax(logits, -1)
    _, idx = jax.lax.top_k(logits, 2)
    manual = []
    for t in range(T):
        acc = 0.0
        g = [float(probs[t, idx[t, j]]) for j in range(2)]
        gs = [gi / (sum(g) + 1e-9) for gi in g]
        for j in range(2):
            e = int(idx[t, j])
            h = jax.nn.gelu(x[t] @ params.w_up[e])
            acc = acc + gs[j] * (h @ params.w_down[e])
        manual.append(acc)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jnp.stack(manual)), rtol=1e-4, atol=1e-5
    )


def test_top2_capacity_drops_second_choices_first():
    """With capacity for exactly the first choices, top-2 output must
    equal the top-1 output scaled by the renormalized first gate."""
    params, x = _setup(4)
    # route all tokens to one expert: capacity 1*T can hold every 1st
    # choice but no 2nd choices (choice-major accounting)
    logits = x @ params.router
    probs = jax.nn.softmax(logits, -1)
    _, idx = jax.lax.top_k(logits, 2)
    y2 = moe_apply(params, x, capacity_factor=E / 2.0, top_k=2)  # cap = T
    # every 1st choice fits iff no expert gets > T first-choice tokens (true
    # trivially); 2nd choices fit only in leftover slots — verify that any
    # token whose 2nd choice was dropped equals gate1-only output
    from micronet_tpu.parallel.moe import _dispatch_topk

    dmat, comb = _dispatch_topk(logits, T, 2)
    got_both = np.asarray(jnp.sum(dmat, axis=(1, 2))) == 2
    g1 = jnp.sum(probs * jax.nn.one_hot(idx[:, 0], E), -1)
    g2 = jnp.sum(probs * jax.nn.one_hot(idx[:, 1], E), -1)
    g1n = g1 / (g1 + g2 + 1e-9)
    for t in range(T):
        if got_both[t]:
            continue
        e = int(idx[t, 0])
        h = jax.nn.gelu(x[t] @ params.w_up[e])
        expect = float(g1n[t]) * (h @ params.w_down[e])
        np.testing.assert_allclose(
            np.asarray(y2[t]), np.asarray(expect), rtol=1e-4, atol=1e-5
        )


def _sharded_oracle(params, x, ep, cf, top_k):
    """Per-shard dispatch reference: vmap the dense forward over the token
    shards (the a2a path's capacity is accounted per shard)."""
    xs = x.reshape(ep, x.shape[0] // ep, x.shape[-1])
    return jax.vmap(lambda xi: moe_apply(params, xi, cf, top_k))(xs).reshape(
        x.shape
    )


@pytest.mark.slow
def test_ep_a2a_matches_sharded_dense_top1_and_top2():
    from micronet_tpu.parallel.moe import moe_apply_ep_a2a

    params, x = _setup(5)
    for top_k in (1, 2):
        ref = _sharded_oracle(params, x, 8, 2.0, top_k)
        got = moe_apply_ep_a2a(
            params, x, _mesh(), capacity_factor=2.0, top_k=top_k
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, err_msg=f"top_k={top_k}"
        )


@pytest.mark.slow
def test_ep_a2a_quantized_experts():
    from micronet_tpu.parallel.moe import moe_apply_ep_a2a

    params, x = _setup(6)
    qp = quantize_moe(params)
    ref = _sharded_oracle(qp, x, 8, 2.0, 2)
    got = moe_apply_ep_a2a(qp, x, _mesh(), capacity_factor=2.0, top_k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_ep_a2a_gradients_match_sharded_dense():
    from micronet_tpu.parallel.moe import moe_apply_ep_a2a

    params, x = _setup(7)
    mesh = _mesh()
    tgt = jax.random.normal(jax.random.PRNGKey(9), (T, DIM))

    def loss_ref(p, xi):
        return jnp.mean((_sharded_oracle(p, xi, 8, 2.0, 2) - tgt) ** 2)

    def loss_a2a(p, xi):
        return jnp.mean(
            (moe_apply_ep_a2a(p, xi, mesh, capacity_factor=2.0, top_k=2) - tgt)
            ** 2
        )

    gd, gxd = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    ga, gxa = jax.grad(loss_a2a, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxd), atol=1e-5)
