"""Deploy pipeline: KL-entropy PTQ -> int8 engine -> AOT buckets + artifact.

Run:  python examples/deploy_engine.py

The TensorRT-replacement flow end to end (COVERAGE.md §2.8):
1. calibrate a float model with TRT-style KL entropy observers
   (+ write the calibration cache),
2. fuse BN and freeze to the chained int8 engine,
3. build batch-bucketed AOT programs (the optimization-profile analog),
4. serialize a weights-embedded StableHLO artifact and run it back.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from flax import nnx

    from micronet_tpu.infer import (
        build_engine,
        deserialize_engine,
        freeze_int,
        fuse_bn_iao,
        serialize_engine,
    )
    from micronet_tpu.models import nin
    from micronet_tpu.nn import eval_mode, prepare, train_mode
    from micronet_tpu.quant.calibrate import finalize_entropy_calibration
    from micronet_tpu.quant.config import QuantConfig

    # 1) KL-entropy calibration (streams the float network)
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, ptq=True,
                      ptq_observer="kl", pretrained_model=True)
    q = prepare(nin.Net(cfg=[16] * 8, rngs=nnx.Rngs(0)), cfg, method="iao")
    train_mode(q)
    for i in range(8):
        q(jax.random.normal(jax.random.PRNGKey(i), (16, 32, 32, 3)))
    table = finalize_entropy_calibration(q, cache="/tmp/micronet_calib.json")
    print(f"calibrated {len(table)} tensors (cache: /tmp/micronet_calib.json)")

    # 2) fuse + freeze
    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)
    engine = freeze_int(fused, example_input=jnp.zeros((1, 32, 32, 3)))
    eval_mode(engine)

    # 3) bucketed AOT serving (min/opt/max = 1/8/32)
    compiled = build_engine(engine, profile=(1, 8, 32))
    x = jax.random.normal(jax.random.PRNGKey(99), (5, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(compiled(x)), np.asarray(engine(x)), rtol=1e-5, atol=1e-5
    )
    print(f"AOT buckets {compiled.buckets}: batch-5 request matches eager")

    # 4) serialized artifact roundtrip
    blob = serialize_engine(engine, batch=8, path="/tmp/micronet_engine.stablehlo")
    runner = deserialize_engine("/tmp/micronet_engine.stablehlo")
    y = runner(jax.random.normal(jax.random.PRNGKey(7), (8, 32, 32, 3)))
    print(f"artifact: {len(blob)} bytes, output {np.asarray(y).shape} — deploy OK")


if __name__ == "__main__":
    main()
