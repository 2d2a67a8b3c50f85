"""Benchmark: flagship quantized inference throughput on the current chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures NIN-GC IAO W8A8 (bn-fused, weight-pre-quantized inference graph)
images/sec at batch 256 on the default JAX backend. The reference
publishes no throughput numbers (SURVEY.md §6) — its test scripts print
FPS but nothing is committed — so vs_baseline compares against the same
model's FP32 eval throughput here (quantized / fp32; higher is better,
the reference's quant "FPS improves" oracle made quantitative).
"""

import json
import time

import jax
import jax.numpy as jnp
from flax import nnx


def _throughput(fn, state, x, iters=30, warmup=5):
    for _ in range(warmup):
        fn(state, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return (iters * x.shape[0]) / dt


def main():
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import eval_mode, prepare, train_mode
    from micronet_tpu.quant.config import QuantConfig

    batch = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)

    # fp32 baseline
    fp_model = nin_gc.Net(rngs=nnx.Rngs(0))
    eval_mode(fp_model)
    gdef_f, state_f = nnx.split(fp_model)

    @jax.jit
    def fwd_fp(state, x):
        return nnx.merge(gdef_f, state)(x)

    fps_fp = _throughput(fwd_fp, state_f, x)

    # quantized inference graph: QAT-prepared, BN-fused, pre-quantized
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    q = prepare(nin_gc.Net(rngs=nnx.Rngs(0)), cfg, method="iao")
    train_mode(q)
    for i in range(2):  # move observers/BN off init so scales are realistic
        q(jax.random.normal(jax.random.PRNGKey(i), (32, 32, 32, 3)))
    from micronet_tpu.infer import fuse_bn_iao

    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)
    gdef_q, state_q = nnx.split(fused)

    @jax.jit
    def fwd_q(state, x):
        return nnx.merge(gdef_q, state)(x)

    fps_q = _throughput(fwd_q, state_q, x)

    print(
        json.dumps(
            {
                "metric": "nin_gc_w8a8_bnfused_inference_throughput",
                "value": round(fps_q, 1),
                "unit": "img/s",
                "vs_baseline": round(fps_q / fps_fp, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
