"""LLM serving kit: int8 KV cache + weight-only decoder (net-new vs the
reference — SURVEY.md §5 stretch path)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.models.tiny_decoder import TinyDecoder, quantize_decoder
from micronet_tpu.quant.kv_cache import (
    append_kv,
    attend,
    init_kv_cache,
    kv_cache_bytes,
)


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


def test_kv_quantization_accuracy():
    """int8 per-(head, position) KV codes reproduce float attention to ~1%."""
    h, s, d = 4, 32, 16
    k = _rand(0, (h, s, d))
    v = _rand(1, (h, s, d))
    q = _rand(2, (h, 1, d))
    cache = append_kv(init_kv_cache(h, s, d), k, v)
    out_q = attend(cache, q)
    # float reference with the same mask semantics
    logits = jnp.einsum("htd,hsd->hts", q, k) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    out_f = jnp.einsum("hts,hsd->htd", probs, v)
    rel = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
    assert rel < 0.02, rel


def test_prefill_equals_incremental_decode():
    """Appending T tokens at once or one at a time gives the IDENTICAL
    cache (per-vector scales are independent of batch grouping)."""
    h, s, d, t = 2, 16, 8, 5
    k = _rand(3, (h, t, d))
    v = _rand(4, (h, t, d))
    c1 = append_kv(init_kv_cache(h, s, d), k, v)
    c2 = init_kv_cache(h, s, d)
    for i in range(t):
        c2 = append_kv(c2, k[:, i : i + 1], v[:, i : i + 1])
    for a, b in zip(jax.tree.leaves(c1), jax.tree.leaves(c2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_causal_mask_blocks_future():
    """With causal_offset, query t must ignore cache positions > offset+t
    even though they are already filled."""
    h, s, d = 1, 8, 4
    k = _rand(5, (h, s, d))
    v = _rand(6, (h, s, d))
    cache = append_kv(init_kv_cache(h, s, d), k, v)  # fully filled
    q = _rand(7, (h, 2, d))
    out = attend(cache, q, causal_offset=jnp.int32(0))
    # reference: token 0 sees position 0 only; token 1 sees 0..1. The T=2
    # query runs the f32 prefill path while the T=1 references run the
    # fused decode path (bf16 operands, f32 accumulation — see
    # ops/decode_attention.py), so agreement is at bf16-operand precision;
    # a causal-mask VIOLATION would be O(1), far outside this tolerance.
    for t in range(2):
        kt, vt = k[:, : t + 1], v[:, : t + 1]
        cache_t = append_kv(init_kv_cache(h, s, d), kt, vt)
        ref = attend(cache_t, q[:, t : t + 1])
        np.testing.assert_allclose(
            np.asarray(out[:, t : t + 1]), np.asarray(ref), rtol=2e-2, atol=1e-3
        )


def test_kv_cache_compression_ratio():
    h, s, d = 8, 128, 64
    cache = init_kv_cache(h, s, d)
    f32_bytes = 2 * h * s * d * 4  # K and V in f32
    ratio = f32_bytes / kv_cache_bytes(cache)
    assert 3.5 < ratio < 4.0  # int8 codes + per-vector scales


def test_decoder_prefill_decode_consistency():
    """Prefill of [t0..t3] then decode t4 == prefill of [t0..t4]: same
    final-position logits (the static-cache bookkeeping is sound)."""
    m = TinyDecoder(vocab=64, dim=32, heads=2, depth=2, mlp_dim=64, max_seq=16,
                    rngs=nnx.Rngs(0))
    toks = jnp.asarray([3, 14, 15, 9, 26], jnp.int32)
    logits_full, _ = m.forward(toks, m.init_cache(), jnp.int32(0))
    l4, caches = m.forward(toks[:4], m.init_cache(), jnp.int32(0))
    l5, _ = m.forward(toks[4:], caches, jnp.int32(4))
    # prefill runs the f32 attention path, the T=1 decode step the fused
    # bf16-operand path (ops/decode_attention.py), so agreement is at
    # bf16-operand precision; a cache-bookkeeping bug (wrong position,
    # stale fill pointer) would show up as O(1) logit differences.
    np.testing.assert_allclose(
        np.asarray(l5[0]), np.asarray(logits_full[-1]), rtol=2e-2, atol=5e-3
    )


@pytest.mark.slow
def test_quantized_decoder_tracks_float():
    """W4-grouped weights + int8 KV: logits stay close to the float
    decoder, greedy generation runs end to end."""
    mf = TinyDecoder(vocab=64, dim=64, heads=4, depth=2, mlp_dim=128,
                     max_seq=16, rngs=nnx.Rngs(0))
    mq = TinyDecoder(vocab=64, dim=64, heads=4, depth=2, mlp_dim=128,
                     max_seq=16, rngs=nnx.Rngs(0))
    mq = quantize_decoder(mq, group=32)
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lf, _ = mf.forward(toks, mf.init_cache(), jnp.int32(0))
    lq, _ = mq.forward(toks, mq.init_cache(), jnp.int32(0))
    lf, lq = np.asarray(lf), np.asarray(lq)
    cos = float((lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq)))
    assert cos > 0.98, cos

    out = mq.generate(toks, steps=4)
    assert out.shape == (4,) and int(out.max()) < 64


def test_decoder_forward_jits():
    """The decode step compiles as one program over functional cache state."""
    m = TinyDecoder(vocab=32, dim=32, heads=2, depth=1, mlp_dim=64, max_seq=8,
                    rngs=nnx.Rngs(0))
    gdef, state = nnx.split(m)

    @jax.jit
    def step(state, tok, caches, offset):
        model = nnx.merge(gdef, state)
        return model.forward(tok, caches, offset)

    caches = m.init_cache()
    logits, caches = step(state, jnp.asarray([5], jnp.int32), caches, jnp.int32(0))
    logits2, _ = step(state, jnp.asarray([7], jnp.int32), caches, jnp.int32(1))
    assert logits.shape == (1, 32) and np.isfinite(np.asarray(logits2)).all()


def test_decode_bench_steps_smoke(monkeypatch):
    """benchmarks/llm_decode.py step functions at CI scale: the W4+int8KV
    step and the bf16 baseline agree and run under jit."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "llm_decode_mod",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks", "llm_decode.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "DIM", 64)
    monkeypatch.setattr(mod, "HEADS", 4)
    monkeypatch.setattr(mod, "HEAD_DIM", 16)
    monkeypatch.setattr(mod, "MLP", 128)
    monkeypatch.setattr(mod, "SEQ", 16)

    from micronet_tpu.ops.int4_matmul import (
        pack_int4,
        quantize_int4_weight_grouped,
    )
    from micronet_tpu.quant.kv_cache import append_kv, init_kv_cache

    ws = mod.build_weights(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64))
    params = {}
    for n, w in ws.items():
        wq, gs = quantize_int4_weight_grouped(w, 32)
        params[n] = (pack_int4(wq), gs)
    cache = init_kv_cache(4, 16, 16)
    fk = jax.random.normal(jax.random.PRNGKey(2), (4, 15, 16))
    fv = jax.random.normal(jax.random.PRNGKey(3), (4, 15, 16))
    cache = append_kv(cache, fk, fv)
    y_q, _ = jax.jit(mod.decode_step_w4)(params, cache, x)
    y_b = jax.jit(mod.decode_step_bf16)(
        ws, fk.astype(jnp.bfloat16), fv.astype(jnp.bfloat16), x
    )
    y_q, y_b = np.asarray(y_q), np.asarray(y_b)
    assert np.isfinite(y_q).all() and np.isfinite(y_b).all()
    # W4 + int8KV vs bf16 baseline: same computation class
    rel = np.linalg.norm(y_q - y_b) / np.linalg.norm(y_b)
    assert rel < 0.25, rel


@pytest.mark.slow
def test_decoder_tp_sharded_matches_single_device():
    """Tensor-parallel serving: channel-shard the decoder's W4 weights and
    KV cache heads over an 8-way model mesh; the jitted forward matches the
    unsharded one (GSPMD inserts the collectives)."""
    from micronet_tpu.parallel import make_mesh
    from micronet_tpu.parallel.sharding import shard_state

    mesh = make_mesh(data=1, model=8)
    m = TinyDecoder(vocab=64, dim=64, heads=8, depth=2, mlp_dim=128,
                    max_seq=16, rngs=nnx.Rngs(0))
    m = quantize_decoder(m, group=32)
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
    # decode one more token against the sharded-run cache
    y2, _ = fwd(state_sh, jnp.asarray([5], jnp.int32), caches, jnp.int32(3))
    assert np.isfinite(np.asarray(y2)).all()


@pytest.mark.slow
def test_batched_decode_matches_per_request():
    """forward_batch (vmap over requests, shared weights, per-request
    caches + offsets) reproduces the per-request loop — the
    continuous-batching serving shape."""
    m = quantize_decoder(
        TinyDecoder(vocab=64, dim=32, heads=2, depth=2, mlp_dim=64,
                    max_seq=16, rngs=nnx.Rngs(0)),
        group=16,
    )
    toks = jnp.asarray([[1, 2, 3], [9, 8, 7]], jnp.int32)
    offs = jnp.asarray([0, 0], jnp.int32)
    caches = m.init_cache_batch(2)
    lb, cb = m.forward_batch(toks, caches, offs)
    for i in range(2):
        li, ci = m.forward(toks[i], m.init_cache(), jnp.int32(0))
        np.testing.assert_allclose(
            np.asarray(lb[i]), np.asarray(li), rtol=1e-5, atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(cb), jax.tree.leaves(ci)):
            np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b))
    # requests at DIFFERENT positions in one batched step
    l2, _ = m.forward_batch(
        jnp.asarray([[5], [6]], jnp.int32), cb, jnp.asarray([3, 3], jnp.int32)
    )
    assert l2.shape == (2, 1, 64) and np.isfinite(np.asarray(l2)).all()


# ---------------------------------------------------------------------------
# round 3: sp / ep composed with the decoder (VERDICT r2 item 5)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_sp_prefill_matches_dense_forward():
    """Sequence-parallel prefill (ring attention over a 4-device 'seq'
    axis) produces the same logits and the same int8 caches as the dense
    prefill, and the subsequent dense decode steps are interchangeable."""
    from jax.sharding import Mesh

    sp = 4
    mesh = Mesh(np.array(jax.devices()[:sp]), ("seq",))
    dec = TinyDecoder(vocab=32, dim=16, heads=2, depth=2, mlp_dim=32,
                      max_seq=16, rngs=nnx.Rngs(0))
    toks = jnp.asarray(np.arange(8) % 32, jnp.int32)

    logits_d, caches_d = dec.forward(toks, dec.init_cache(), jnp.int32(0))
    logits_sp, caches_sp = dec.prefill_sp(toks, dec.init_cache(), mesh)

    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_d), atol=2e-5
    )
    # caches identical: the int8 codes must match bit for bit (same
    # quantization of the same K/V), scales to f32 exactness
    for cd, cs in zip(caches_d, caches_sp):
        np.testing.assert_array_equal(
            np.asarray(cs.k_codes), np.asarray(cd.k_codes)
        )
        np.testing.assert_array_equal(
            np.asarray(cs.v_codes), np.asarray(cd.v_codes)
        )
        assert int(cs.length) == int(cd.length)
    # a decode step from the sp-built caches == from the dense caches
    nxt = jnp.asarray([5], jnp.int32)
    ld, _ = dec.forward(nxt, caches_d, jnp.int32(8))
    ls, _ = dec.forward(nxt, caches_sp, jnp.int32(8))
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld), atol=2e-5)


@pytest.mark.slow
def test_sp_prefill_quantized_decoder():
    """Same parity on the W4-quantized serving decoder."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    dec = quantize_decoder(
        TinyDecoder(vocab=32, dim=16, heads=2, depth=1, mlp_dim=32,
                    max_seq=16, rngs=nnx.Rngs(0)),
        group=8,
    )
    toks = jnp.asarray(np.arange(8) % 32, jnp.int32)
    logits_d, _ = dec.forward(toks, dec.init_cache(), jnp.int32(0))
    logits_sp, _ = dec.prefill_sp(toks, dec.init_cache(), mesh)
    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_d), atol=2e-5
    )


@pytest.mark.slow
def test_ep_moe_decoder_matches_dense():
    """MoE decoder served expert-parallel (experts sharded over a 4-device
    'expert' axis via use_ep) produces the same prefill logits and greedy
    decode tokens as the dense single-device path."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))

    def build():
        return quantize_decoder(
            TinyDecoder(vocab=32, dim=16, heads=2, depth=1, mlp_dim=32,
                        max_seq=16, moe_experts=8, rngs=nnx.Rngs(0)),
            group=8,
        )

    dense = build()
    ep = build()
    for blk in ep.blocks:
        blk.moe.use_ep(mesh)

    toks = jnp.asarray(np.arange(6) % 32, jnp.int32)
    ld, cd = dense.forward(toks, dense.init_cache(), jnp.int32(0))
    le, ce = ep.forward(toks, ep.init_cache(), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(le), np.asarray(ld), atol=2e-5)

    # use_ep survives split/merge (static config on the graphdef) — the
    # jitted serving path keeps the EP dispatch
    gdef, state = nnx.split(ep)

    @jax.jit
    def step(st, tok, caches, off):
        return nnx.merge(gdef, st).forward(tok, caches, off)

    l1, _ = step(state, jnp.asarray([3], jnp.int32), ce, jnp.int32(6))
    l1d, _ = dense.forward(jnp.asarray([3], jnp.int32), cd, jnp.int32(6))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1d), atol=2e-5)
