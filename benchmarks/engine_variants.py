"""Whole-engine throughput variants on the real chip.

Times the NIN-GC W8A8 inference graph end to end for each engine
lowering so the default configuration is chosen from measurements:

  fp32        — float eval baseline (BN separate)
  int8-conv   — chained engine, conv_general_dilated int8 lowering
  int8-dot    — chained engine, 1x1 convs as batched int8 dot_general

Usage: PYTHONPATH=. python benchmarks/engine_variants.py [batch]
"""

import sys

import jax
import jax.numpy as jnp
from flax import nnx

from micronet_tpu.infer import freeze_int, fuse_bn_iao
from micronet_tpu.models import nin_gc
from micronet_tpu.nn import eval_mode, prepare, train_mode
from micronet_tpu.quant.config import QuantConfig
from micronet_tpu.utils import throughput


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)

    fp_model = nin_gc.Net(rngs=nnx.Rngs(0))
    eval_mode(fp_model)
    gdef_f, state_f = nnx.split(fp_model)
    fps_fp, sec_fp = throughput(
        lambda s, xi: nnx.merge(gdef_f, s)(xi), state_f, x, iters=64
    )
    print(f"fp32       {fps_fp:10.1f} img/s  {sec_fp * 1e3:7.2f} ms")

    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    q = prepare(nin_gc.Net(rngs=nnx.Rngs(0)), cfg, method="iao")
    train_mode(q)
    for i in range(2):
        q(jax.random.normal(jax.random.PRNGKey(i), (32, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)

    for name, dot in [("int8-conv", False), ("int8-dot", True)]:
        engine = freeze_int(fused, example_input=x[:1])
        for _, mm in nnx.iter_modules(engine):
            if hasattr(mm, "pointwise_dot"):
                mm.pointwise_dot = dot
        eval_mode(engine)
        gdef_e, state_e = nnx.split(engine)
        fps_e, sec_e = throughput(
            lambda s, xi: nnx.merge(gdef_e, s)(xi), state_e, x, iters=64
        )
        print(
            f"{name:10s} {fps_e:10.1f} img/s  {sec_e * 1e3:7.2f} ms  "
            f"vs fp32 {fps_e / fps_fp:.3f}x"
        )


if __name__ == "__main__":
    main()
