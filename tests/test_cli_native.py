"""Package self-tests, native host library, CLI, and mesh sharding."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx


@pytest.mark.slow
def test_quant_test_manual_and_auto(capsys):
    import micronet_tpu

    micronet_tpu.quant_test_manual()
    micronet_tpu.quant_test_auto()
    out = capsys.readouterr().out
    assert out.count("micronet_tpu is ready") == 2


def test_native_gather():
    from micronet_tpu.train import native_loader

    if not native_loader.available():
        pytest.skip("native lib not built (make -C native)")
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (1000, 32, 32, 3), dtype=np.uint8)
    idx = rng.permutation(1000)[:256].astype(np.int64)
    out = native_loader.gather_u8(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    # bad index is an error, not memory corruption
    with pytest.raises(RuntimeError):
        native_loader.gather_u8(src, np.array([10_000], np.int64))


def test_cli_prune_runs(tmp_path):
    from micronet_tpu import cli

    save = os.path.join(tmp_path, "pruned.npz")
    rc = cli.main(
        [
            "prune",
            "--model_type",
            "0",
            "--cfg",
            "12,12,12,12,12,12,12,12",
            "--percent",
            "0.3",
            "--save",
            save,
        ]
    )
    assert rc == 0 and os.path.exists(save)


def test_cli_gc_prune_prints_cfg(capsys):
    from micronet_tpu import cli

    rc = cli.main(["prune", "--model_type", "1", "--gc", "--percent", "0.4"])
    assert rc == 0
    assert "cfg: [" in capsys.readouterr().out


@pytest.mark.slow
def test_data_parallel_observer_consistency():
    """DP on the 8-device CPU mesh: batch sharded on 'data'; global-mean
    BN stats and global-min/max observers must equal the single-device
    result (the cross-replica reduction the reference lacked)."""
    from micronet_tpu.models import nin
    from micronet_tpu.nn import prepare, qat_iao, train_mode
    from micronet_tpu.parallel import make_mesh, shard_batch, shard_model_and_optimizer
    from micronet_tpu.quant.config import QuantConfig

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")

    def build():
        m = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
        q = prepare(m, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
        train_mode(q)
        return q

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))

    # single device
    q1 = build()
    y1 = q1(x)

    # 8-way data parallel
    mesh = make_mesh(data=8, model=1)
    q8 = build()
    shard_model_and_optimizer(q8, None, mesh)
    with mesh:
        xs = shard_batch(x, mesh)

        @nnx.jit
        def step(model, x):
            return model(x)

        y8 = step(q8, xs)

    # reduction ORDER differs across shards (psum of partials vs single
    # pass); tiny stat deltas move rounding boundaries, so compare with
    # fp-reduction tolerances, not bit-exactness
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1), atol=2e-2)

    def scales(m):
        return [
            np.asarray(mm.weight_quantizer.scale[...])
            for _, mm in nnx.iter_modules(m)
            if isinstance(mm, qat_iao.QuantBNFuseConv2d)
        ]

    for a, b in zip(scales(q1), scales(q8)):
        np.testing.assert_allclose(a, b, rtol=1e-3)


def test_shard_map_dp_step():
    """Explicit-collective DP: shard_map step runs, loss is replicated,
    quantizer stats are synchronized across shards."""
    import optax

    from micronet_tpu.models import nin
    from micronet_tpu.nn import prepare, train_mode, qat_iao
    from micronet_tpu.parallel import dp_shard_map_step, make_mesh
    from micronet_tpu.quant.config import QuantConfig

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")

    mesh = make_mesh(data=8, model=1)
    model = nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0))
    q = prepare(model, QuantConfig(a_bits=8, w_bits=8, bn_fuse=True), method="iao")
    train_mode(q)
    gdef, state = nnx.split(q)

    def loss_of_logits(logits, y):
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    step = dp_shard_map_step(gdef, mesh, loss_of_logits)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 10)
    with mesh:
        loss, grads, new_state = step(state, x, y)
    assert np.isfinite(float(loss))
    # stats synchronized: min_val/max_val identical across shards by
    # construction (pmin/pmax); spot-check one quantizer's scale is scalarized
    q2 = nnx.merge(gdef, new_state)
    fq = next(
        m.activation_quantizer
        for _, m in nnx.iter_modules(q2)
        if isinstance(m, qat_iao.QuantBNFuseConv2d)
    )
    assert bool(fq.initialized[...])
    assert float(fq.scale[...][0]) > 0


@pytest.mark.slow
def test_cli_bn_fuse_dump(tmp_path):
    """bn-fuse --dump writes the .txt module-tree/parameter dump and the
    JSON summary with quant scales inlined (reference bn_fuse.py:155-200)."""
    import json

    from micronet_tpu import cli

    save = str(tmp_path / "fused.npz")
    rc = cli.main(
        [
            "bn-fuse",
            "--model_type",
            "0",
            "--a_bits",
            "8",
            "--w_bits",
            "8",
            "--bn_fuse",
            "--save",
            save,
            "--dump",
        ]
    )
    assert rc == 0
    txt = (tmp_path / "fused.txt").read_text()
    assert "# module tree" in txt and "# parameters" in txt
    assert "QuantConv2d" in txt
    para = json.loads((tmp_path / "fused_para.json").read_text())
    scale_keys = [k for k in para if k.endswith("scale/.value")]
    assert scale_keys, f"no scale entries in dump: {list(para)[:5]}"
    assert all("values" in para[k] for k in scale_keys)
