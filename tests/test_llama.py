"""Llama model family: RoPE math, GQA decode consistency, W4 serving
conversion, ServeLoop composition, and TP sharding.

Net-new vs the reference (SURVEY.md §5 marks the LLM path as the
stretch capability); oracles are internal-consistency + float-vs-W4
parity, same strategy as tests/test_llm_serving.py."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.models.llama import (
    Llama,
    LlamaConfig,
    apply_rope,
    llama3_8b,
    llama_tiny,
    quantize_llama,
)


def _tiny(max_seq=32, seed=0):
    return Llama(llama_tiny(max_seq=max_seq), rngs=nnx.Rngs(seed))


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def test_rope_identity_at_position_zero():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 8), jnp.float32)
    y = apply_rope(x, jnp.zeros((1,), jnp.int32), theta=10000.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_rope_preserves_norm():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 16), jnp.float32)
    y = apply_rope(x, jnp.arange(5, dtype=jnp.int32) + 7, theta=10000.0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_attention_depends_on_relative_position_only():
    """q·k after RoPE is invariant to a common position shift — the
    property that makes rotary embeddings work with a sliding cache."""
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 1, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 16), jnp.float32)

    def score(pq, pk):
        qr = apply_rope(q, jnp.asarray([pq], jnp.int32), theta=10000.0)
        kr = apply_rope(k, jnp.asarray([pk], jnp.int32), theta=10000.0)
        return float(jnp.sum(qr * kr))

    np.testing.assert_allclose(score(9, 4), score(14, 9), rtol=1e-4)
    np.testing.assert_allclose(score(3, 3), score(11, 11), rtol=1e-4)


# ---------------------------------------------------------------------------
# model consistency
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_prefill_equals_incremental_decode():
    """Full prefill vs prefill+decode produce the same final logits —
    validates RoPE offsets, GQA cache append, and causal masking."""
    m = _tiny()
    toks = jnp.asarray([1, 5, 9, 2, 7], jnp.int32)
    logits_full, _ = m.forward(toks, m.init_cache(), jnp.int32(0))
    logits_pre, caches = m.forward(toks[:4], m.init_cache(), jnp.int32(0))
    logits_last, _ = m.forward(toks[4:], caches, jnp.int32(4))
    np.testing.assert_allclose(
        np.asarray(logits_last[0]), np.asarray(logits_full[-1]),
        rtol=2e-2, atol=5e-3,
    )
    # earlier positions agree too (causality: prefix logits can't change)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:4]),
        rtol=2e-2, atol=5e-3,
    )


def test_gqa_cache_holds_kv_heads_only():
    cfg = llama_tiny()
    m = Llama(cfg, rngs=nnx.Rngs(0))
    caches = m.init_cache()
    assert len(caches) == cfg.n_layers
    assert caches[0].k_codes.shape == (
        cfg.n_kv_heads, cfg.max_seq, cfg.head_dim
    )
    logits, caches = m.forward(
        jnp.asarray([3, 4], jnp.int32), caches, jnp.int32(0)
    )
    assert logits.shape == (2, cfg.vocab)
    assert int(caches[0].length) == 2


def test_llama3_8b_geometry():
    cfg = llama3_8b(max_seq=64)
    assert (cfg.dim, cfg.n_heads, cfg.n_kv_heads, cfg.mlp_dim, cfg.n_layers) == (
        4096, 32, 8, 14336, 32
    )
    assert cfg.head_dim == 128 and cfg.kv_dim == 1024


def test_forward_jits_as_one_program():
    m = _tiny(max_seq=8)
    gdef, state = nnx.split(m)

    @jax.jit
    def step(st, tok, caches, off):
        return nnx.merge(gdef, st).forward(tok, caches, off)

    caches = m.init_cache()
    l1, caches = step(state, jnp.asarray([5], jnp.int32), caches, jnp.int32(0))
    l2, _ = step(state, jnp.asarray([7], jnp.int32), caches, jnp.int32(1))
    assert l1.shape == (1, 64) and np.isfinite(np.asarray(l2)).all()


# ---------------------------------------------------------------------------
# W4 serving conversion
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_w4_llama_tracks_float():
    mf = _tiny()
    mq = quantize_llama(_tiny(), group=16)
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lf, _ = mf.forward(toks, mf.init_cache(), jnp.int32(0))
    lq, _ = mq.forward(toks, mq.init_cache(), jnp.int32(0))
    lf, lq = np.asarray(lf), np.asarray(lq)
    cos = float((lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq)))
    assert cos > 0.98, cos
    out = mq.generate(toks, steps=4)
    assert out.shape == (4,) and int(out.max()) < 64


def test_w4_storage_shrinks():
    from micronet_tpu.quant.weight_only import WOLinear

    mq = quantize_llama(_tiny(), group=16)
    for blk in mq.blocks:
        for name in ("wqkv", "wo", "gateup", "down"):
            lin = getattr(blk, name)
            assert isinstance(lin, WOLinear)
            assert lin.packed[...].dtype == jnp.int8
            # nibble packing: K/2 rows of int8
            assert lin.packed[...].shape[0] * 2 == lin.k


# ---------------------------------------------------------------------------
# compositions: continuous batching + TP
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_serve_loop_over_w4_llama_matches_isolated():
    from micronet_tpu.serve import Request, ServeLoop

    model = quantize_llama(_tiny(max_seq=32), group=16)

    def isolated(prompt, n):
        return [
            int(t)
            for t in np.asarray(
                model.generate(jnp.asarray(prompt, jnp.int32), steps=n)
            )
        ]

    reqs = [
        Request(rid=0, prompt=[3, 14, 15], max_new_tokens=5),
        Request(rid=1, prompt=[9, 26, 5, 35], max_new_tokens=4),
    ]
    loop = ServeLoop(model, max_slots=2)
    for r in reqs:
        loop.submit(r)
    done = loop.run()
    assert set(done) == {0, 1}
    assert done[0].output == isolated([3, 14, 15], 5)
    assert done[1].output == isolated([9, 26, 5, 35], 4)


@pytest.mark.slow
def test_decode_batch_matches_per_request():
    """The M=B decode fast path (one matmul per projection, batch folded
    into the attention kernel grid) reproduces each request's isolated
    forward — at DIFFERENT per-slot offsets/fill levels."""
    model = quantize_llama(_tiny(max_seq=16), group=16)
    prompts = [[1, 2, 3], [9, 8, 7, 6]]

    # per-request prefill, then splice into a batched cache (the ServeLoop
    # admission shape)
    caches_b = model.init_cache_batch(2)
    offs, next_tok, refs = [], [], []
    for i, p in enumerate(prompts):
        toks = jnp.asarray(p, jnp.int32)
        logits, cache_i = model.forward(toks, model.init_cache(), jnp.int32(0))
        caches_b = jax.tree.map(
            lambda full, one: full.at[i].set(one), caches_b, cache_i
        )
        offs.append(len(p))
        tok = int(jnp.argmax(logits[-1]))
        next_tok.append(tok)
        # isolated decode step: the oracle for this slot
        li, _ = model.forward(
            jnp.asarray([tok], jnp.int32), cache_i, jnp.int32(len(p))
        )
        refs.append(np.asarray(li[0]))

    offsets = jnp.asarray(offs, jnp.int32)
    lb, cb = model.decode_batch(
        jnp.asarray(next_tok, jnp.int32)[:, None], caches_b, offsets
    )
    assert lb.shape == (2, 1, 64)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(lb[i, 0]), refs[i], rtol=1e-5, atol=1e-5
        )
    # caches advanced per-slot
    assert [int(l) for l in np.asarray(cb[0].length)] == [o + 1 for o in offs]


@pytest.mark.slow
def test_decode_batch_matches_forward_batch():
    """Fast path vs the vmap reference on identical batched state."""
    model = quantize_llama(_tiny(max_seq=16), group=16)
    caches = model.init_cache_batch(3)
    toks = jnp.asarray([[5], [6], [7]], jnp.int32)
    offs = jnp.zeros((3,), jnp.int32)
    l_ref, c_ref = model.forward_batch(toks, caches, offs)
    l_fast, c_fast = model.decode_batch(toks, caches, offs)
    np.testing.assert_allclose(
        np.asarray(l_fast), np.asarray(l_ref), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(c_fast), jax.tree.leaves(c_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


@pytest.mark.slow
def test_llama_tp_sharded_matches_single_device():
    """Channel-shard the W4 llama over an 8-way 'model' mesh: packed
    nibbles/group scales shard on their output axis, GSPMD inserts the
    collectives, and the jitted forward matches the unsharded run."""
    from micronet_tpu.parallel import make_mesh
    from micronet_tpu.parallel.sharding import shard_state

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    mesh = make_mesh(data=1, model=8)
    cfg = LlamaConfig(
        vocab=64, dim=64, n_layers=2, n_heads=8, n_kv_heads=4,
        mlp_dim=128, max_seq=16, rope_theta=10000.0,
    )
    m = quantize_llama(Llama(cfg, rngs=nnx.Rngs(0)), group=32)
    toks = jnp.asarray([1, 2, 3], jnp.int32)
    y_ref, _ = m.forward(toks, m.init_cache(), jnp.int32(0))

    gdef, state = nnx.split(m)
    state_sh = shard_state(state, mesh, "model")

    @jax.jit
    def fwd(st, tok, caches, off):
        return nnx.merge(gdef, st).forward(tok, caches, off)

    y_sh, caches = fwd(state_sh, toks, m.init_cache(), jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(y_sh), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    y2, _ = fwd(state_sh, jnp.asarray([5], jnp.int32), caches, jnp.int32(3))
    assert np.isfinite(np.asarray(y2)).all()
