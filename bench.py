"""Benchmark: flagship quantized inference throughput on the current chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures NIN-GC IAO W8A8 (bn-fused, weight-pre-quantized inference graph)
images/sec at batch 1024 on the default JAX backend, using the
slope-based on-device harness in micronet_tpu.utils.timing (naive
wall-clock timing lies in this environment: launch RPC overhead +
execution-result caching). The reference publishes no throughput numbers
(SURVEY.md §6), so vs_baseline compares against the same model's FP32
eval throughput here (quantized / fp32) — the reference's "FPS improves"
oracle made quantitative.
"""

import json

import jax
import jax.numpy as jnp
from flax import nnx


def main():
    from micronet_tpu.infer import freeze_int, fuse_bn_iao
    from micronet_tpu.models import nin_gc
    from micronet_tpu.nn import eval_mode, prepare, train_mode
    from micronet_tpu.quant.config import QuantConfig
    from micronet_tpu.utils import throughput

    batch = 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)

    # fp32 baseline
    fp_model = nin_gc.Net(rngs=nnx.Rngs(0))
    eval_mode(fp_model)
    gdef_f, state_f = nnx.split(fp_model)
    fps_fp, _ = throughput(lambda s, xi: nnx.merge(gdef_f, s)(xi), state_f, x)

    # quantized inference graphs: QAT-prepared, BN-fused, pre-quantized
    cfg = QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)
    q = prepare(nin_gc.Net(rngs=nnx.Rngs(0)), cfg, method="iao")
    train_mode(q)
    for i in range(2):  # move observers/BN off init so scales are realistic
        q(jax.random.normal(jax.random.PRNGKey(i), (32, 32, 32, 3)))
    fused = fuse_bn_iao(q, cfg)
    eval_mode(fused)
    gdef_q, state_q = nnx.split(fused)
    fps_q, _ = throughput(lambda s, xi: nnx.merge(gdef_q, s)(xi), state_q, x)

    engine = freeze_int(fused)
    eval_mode(engine)
    gdef_e, state_e = nnx.split(engine)
    fps_e, _ = throughput(lambda s, xi: nnx.merge(gdef_e, s)(xi), state_e, x)

    best = max(fps_q, fps_e)
    print(
        json.dumps(
            {
                "metric": "nin_gc_w8a8_inference_throughput",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / fps_fp, 3),
                "detail": {
                    "fp32_img_s": round(fps_fp, 1),
                    "fake_quant_img_s": round(fps_q, 1),
                    "int_engine_img_s": round(fps_e, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
