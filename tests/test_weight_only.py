"""Weight-only int4: pack/unpack round trip, kernel vs XLA oracle, pytree
API, and a tiny transformer decode sanity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from micronet_tpu.nn import modules as M
from micronet_tpu.ops.int4_matmul import (
    int4_matmul,
    int4_matmul_xla,
    pack_int4,
    quantize_int4_weight,
    unpack_int4,
)
from micronet_tpu.quant.weight_only import (
    WOTensor,
    dequantize_leaf,
    pytree_bytes,
    quantize_pytree,
    wo_quantize_linear,
)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    w_q = rng.randint(-7, 8, (128, 64)).astype(np.int8)
    packed = pack_int4(jnp.asarray(w_q))
    assert packed.shape == (64, 64)
    out = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), w_q)


def test_int4_matmul_matches_xla():
    rng = np.random.RandomState(1)
    x = rng.randn(24, 192).astype(np.float32)  # unaligned M
    w = rng.randn(192, 130).astype(np.float32) * 0.1
    w_q, scale = quantize_int4_weight(jnp.asarray(w), axis=0)
    packed = pack_int4(w_q)
    ref = int4_matmul_xla(jnp.asarray(x), packed, scale)
    out = int4_matmul(jnp.asarray(x), packed, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    # int4 error vs the float matmul stays moderate
    rel = np.abs(np.asarray(ref) - x @ w).max() / np.abs(x @ w).max()
    assert rel < 0.2


def test_wo_linear_and_compression():
    lin = M.Linear(512, 256, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 512))
    y_fp = lin(x)
    wo = wo_quantize_linear(lin)
    y_q = wo(x)
    # W4 keeps outputs close
    err = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert err < 0.2
    # ~8x smaller than f32 storage for the weight
    fp_bytes = 512 * 256 * 4
    q_bytes = int(wo.packed[...].size) + int(wo.scale[...].size) * 4
    assert q_bytes < fp_bytes / 6


@pytest.mark.slow
def test_quantize_pytree_and_decode():
    """Tiny GPT-ish decode: pytree-quantized weights reproduce fp logits
    closely and shrink the checkpoint ~8x."""
    d, dff, vocab = 128, 512, 256
    rng = np.random.RandomState(0)
    params = {
        "wq": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "wk": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "wv": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "wo": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),
        "w1": jnp.asarray(rng.randn(d, dff).astype(np.float32) * 0.05),
        "w2": jnp.asarray(rng.randn(dff, d).astype(np.float32) * 0.05),
        "emb": jnp.asarray(rng.randn(vocab, d).astype(np.float32) * 0.05),
        "ln": jnp.ones((d,), jnp.float32),  # not quantized (1-D)
    }

    def mm(w, x):
        return w.matmul(x) if isinstance(w, WOTensor) else x @ w

    def decode(p, tok_ids):
        x = (
            p["emb"].dequantize() if isinstance(p["emb"], WOTensor) else p["emb"]
        )[tok_ids]
        q, k, v = mm(p["wq"], x), mm(p["wk"], x), mm(p["wv"], x)
        att = jax.nn.softmax(q @ k.T / np.sqrt(d))
        x = x + mm(p["wo"], att @ v)
        x = x * p["ln"]
        x = x + mm(p["w2"], jax.nn.gelu(mm(p["w1"], x)))
        emb = p["emb"].dequantize() if isinstance(p["emb"], WOTensor) else p["emb"]
        return x @ emb.T

    toks = jnp.asarray([3, 17, 250, 9])
    logits_fp = decode(params, toks)

    qparams = quantize_pytree(params, min_size=1024)
    n_q = sum(
        1 for l in jax.tree_util.tree_leaves(qparams, is_leaf=lambda x: isinstance(x, WOTensor))
        if isinstance(l, WOTensor)
    )
    assert n_q == 7  # all 2-D mats incl embedding; ln stays float
    logits_q = decode(qparams, toks)

    # top-1 agreement on every position
    assert np.array_equal(
        np.argmax(np.asarray(logits_fp), -1), np.argmax(np.asarray(logits_q), -1)
    )
    # ~7-8x compression
    ratio = pytree_bytes(params) / pytree_bytes(qparams)
    assert ratio > 6, ratio


# ---- group-wise (block) scales ----


def test_grouped_quantize_beats_per_column_on_outlier_rows():
    """The point of block scales: an outlier ROW widens only its own
    group's step, so overall reconstruction error drops."""
    from micronet_tpu.ops.int4_matmul import (
        quantize_int4_weight,
        quantize_int4_weight_grouped,
    )

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (512, 64)) * 0.02
    w = w.at[7].mul(50.0)  # one huge row
    q_c, s_c = quantize_int4_weight(w, axis=0)
    q_g, s_g = quantize_int4_weight_grouped(w, group=128)
    deq_c = q_c.astype(jnp.float32) * s_c
    gs, n = s_g.shape
    scale_full = jnp.broadcast_to(s_g[:, None, :], (gs, 128, n)).reshape(512, n)
    deq_g = q_g.astype(jnp.float32) * scale_full
    err_c = float(jnp.linalg.norm(deq_c - w))
    err_g = float(jnp.linalg.norm(deq_g - w))
    # the outlier poisons only 1 of 4 groups: err^2 drops ~4x, err ~2x
    assert err_g < 0.6 * err_c, (err_g, err_c)
    assert s_g.shape == (4, 64)


def test_int4_matmul_grouped_matches_xla():
    from micronet_tpu.ops.int4_matmul import (
        int4_matmul_grouped,
        int4_matmul_grouped_xla,
        pack_int4,
        quantize_int4_weight_grouped,
    )

    k, n, m, g = 512, 256, 24, 128
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.05
    w_out = w.at[3].mul(30.0)  # outlier variant: kernel/oracle exactness
    x = jax.random.normal(jax.random.PRNGKey(2), (m, k))
    for wt in (w, w_out):
        w_q, gscale = quantize_int4_weight_grouped(wt, g)
        packed = pack_int4(w_q)
        y_ref = int4_matmul_grouped_xla(x, packed, gscale)
        y_ker = int4_matmul_grouped(x, packed, gscale, bm=16, bn=128)
        np.testing.assert_allclose(
            np.asarray(y_ker), np.asarray(y_ref), rtol=1e-6, atol=1e-6
        )
    # clean weights: the whole path approximates the float matmul (bf16
    # dequant + int4 steps => a few percent)
    w_q, gscale = quantize_int4_weight_grouped(w, g)
    y_ref = int4_matmul_grouped_xla(x, pack_int4(w_q), gscale)
    y_f = np.asarray(x @ w)
    rel = np.linalg.norm(np.asarray(y_ref) - y_f) / np.linalg.norm(y_f)
    # int4 RTN on gaussian weights: scale~2.8sigma/7, RMS err ~ scale/sqrt(12)
    # ~ 11% of sigma -> the matmul inherits it
    assert rel < 0.15, rel


@pytest.mark.slow
def test_wo_linear_grouped_module_and_pytree():
    lin = M.Linear(256, 128, rngs=nnx.Rngs(0))
    wo = wo_quantize_linear(lin, group=64)
    assert wo.group == 64 and wo.scale[...].shape == (4, 128)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 256))
    y_q = np.asarray(wo(x))
    y_f = np.asarray(lin(x))
    rel = np.linalg.norm(y_q - y_f) / np.linalg.norm(y_f)
    assert rel < 0.1, rel

    params = {"mlp": jax.random.normal(jax.random.PRNGKey(4), (512, 512))}
    qp = quantize_pytree(params, min_size=1, group=128)
    assert qp["mlp"].group == 128
    deq = jax.tree.map(
        dequantize_leaf, qp, is_leaf=lambda l: hasattr(l, "packed")
    )
    rel = float(
        jnp.linalg.norm(deq["mlp"] - params["mlp"])
        / jnp.linalg.norm(params["mlp"])
    )
    assert rel < 0.15  # int4 RTN error class on gaussian weights

    # non-divisible K falls back to per-column, still correct
    lin2 = M.Linear(100, 32, rngs=nnx.Rngs(1))
    wo2 = wo_quantize_linear(lin2, group=64)
    assert wo2.group == 0
    x2 = jax.random.normal(jax.random.PRNGKey(5), (4, 100))
    rel2 = float(
        jnp.linalg.norm(wo2(x2) - lin2(x2)) / jnp.linalg.norm(lin2(x2))
    )
    assert rel2 < 0.1


def test_w8a16_weight_only():
    """int8 weight-only (bits=8): 4x compression vs f32, ~1% matmul error,
    grouped and per-column, module + pytree surfaces."""
    from micronet_tpu.quant.weight_only import _quantize_2d

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256))
    y_f = np.asarray(x @ w)
    for group in (0, 64):
        wo = _quantize_2d(w, group=group, bits=8)
        assert wo.bits == 8 and wo.packed.shape == (256, 128)
        assert wo.packed.dtype == jnp.int8
        y = np.asarray(wo.matmul(x))
        rel = np.linalg.norm(y - y_f) / np.linalg.norm(y_f)
        assert rel < 0.02, (group, rel)  # int8 ~0.3% RMS on gaussian
        # dequantize roundtrip
        rel_w = float(
            jnp.linalg.norm(wo.dequantize() - w) / jnp.linalg.norm(w)
        )
        assert rel_w < 0.01

    lin = M.Linear(256, 128, rngs=nnx.Rngs(0))
    wol = wo_quantize_linear(lin, group=64, bits=8)
    rel = float(
        jnp.linalg.norm(wol(x) - lin(x)) / jnp.linalg.norm(lin(x))
    )
    assert rel < 0.02

    params = {"w": w}
    qp = quantize_pytree(params, min_size=1, bits=8)
    assert qp["w"].bits == 8
    from micronet_tpu.quant.weight_only import pytree_bytes

    ratio = (w.size * 4) / pytree_bytes(qp)
    assert 3.5 < ratio < 4.1  # f32 -> int8 + scales
