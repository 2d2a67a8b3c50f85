"""Deploy leg: AOT batch-bucket engines + serialized StableHLO programs
(reference deploy/tensorrt/util_trt.py — get_engine fixed/dynamic paths,
engine serialize/deserialize)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.infer import (
    CompiledEngine,
    build_engine,
    deserialize_engine,
    freeze_int,
    fuse_bn_iao,
    serialize_engine,
)
from micronet_tpu.infer.deploy import profile_buckets
from micronet_tpu.models import nin
from micronet_tpu.nn import eval_mode, prepare, train_mode
from micronet_tpu.quant.config import QuantConfig


def _frozen_engine():
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    q = prepare(nin.Net(cfg=[8] * 8, rngs=nnx.Rngs(0)), cfg, method="iao")
    train_mode(q)
    for i in range(3):
        q(jax.random.normal(jax.random.PRNGKey(i), (4, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)
    return freeze_int(fused)


def test_profile_buckets_ladder():
    assert profile_buckets(1, 256) == (1, 2, 4, 8, 16, 32, 64, 128, 256)
    assert profile_buckets(8, 8) == (8,)
    assert profile_buckets(3, 10) == (3, 6, 10)


@pytest.mark.slow
def test_compiled_engine_matches_eager_across_batches():
    engine = _frozen_engine()
    eval_mode(engine)
    compiled = build_engine(engine, profile=(1, 4, 8), example_shape=(32, 32, 3))
    # dispatch: in-bucket, padded, and beyond-max (chunked) batch sizes
    for n in (1, 3, 4, 7, 8, 13, 20):
        x = jax.random.normal(jax.random.PRNGKey(n), (n, 32, 32, 3))
        y_eager = np.asarray(engine(x))
        y_aot = np.asarray(compiled(x))
        assert y_aot.shape == y_eager.shape
        np.testing.assert_allclose(y_aot, y_eager, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_compiled_engine_opt_bucket_exact():
    engine = _frozen_engine()
    compiled = build_engine(engine, profile=(1, 3, 8))
    assert 3 in compiled.buckets  # opt batch gets its own exact program


def test_serialize_roundtrip(tmp_path):
    """Weights-embedded StableHLO artifact reproduces the engine bitwise
    and survives a disk roundtrip (serialized TRT engine contract)."""
    engine = _frozen_engine()
    eval_mode(engine)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    y_ref = np.asarray(engine(x))

    path = str(tmp_path / "engine.stablehlo")
    data = serialize_engine(engine, batch=4, path=path)
    assert len(data) > 1000
    # deserialized programs recompile: bitwise vs the jitted engine is not
    # guaranteed (fusion choices may differ), float-noise closeness is
    runner = deserialize_engine(path)
    np.testing.assert_allclose(np.asarray(runner(x)), y_ref, rtol=1e-5, atol=1e-6)
    # bytes entry point too
    runner2 = deserialize_engine(data)
    np.testing.assert_allclose(np.asarray(runner2(x)), y_ref, rtol=1e-5, atol=1e-6)


def test_compiled_engine_flops_reported():
    engine = _frozen_engine()
    compiled = CompiledEngine(engine, buckets=(2,), example_shape=(32, 32, 3))
    fl = compiled.flops
    assert set(fl) == {2}


@pytest.mark.slow
def test_sharded_serving_matches_single_device():
    """Mesh-sharded serving (net-new vs TRT): a dp=4 x tp=2 mesh engine
    reproduces the single-device engine across bucket-padded and chunked
    batch sizes — weights channel-sharded, batch data-sharded, XLA
    inserting the collectives."""
    from micronet_tpu.parallel import make_mesh

    engine = _frozen_engine()
    eval_mode(engine)
    mesh = make_mesh(data=4, model=2)
    compiled = build_engine(
        engine, profile=(1, 4, 8), example_shape=(32, 32, 3), mesh=mesh
    )
    # buckets rounded up to data-axis multiples
    assert all(b % 4 == 0 for b in compiled.buckets)
    for n in (2, 4, 8, 11):
        x = jax.random.normal(jax.random.PRNGKey(n), (n, 32, 32, 3))
        np.testing.assert_allclose(
            np.asarray(compiled(x)), np.asarray(engine(x)), rtol=1e-5, atol=1e-5
        )
