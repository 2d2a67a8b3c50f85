"""Training-step throughput across quant flavors on the current chip.

A scan of K full train steps (augment + forward + STE backward + Adam +
state updates) with the loss chained into the next input — the honest
measurement recipe from micronet_tpu.utils.timing applied to a mutating
step. Prints one JSON line per flavor.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import optax
from flax import nnx

from micronet_tpu.models import nin_gc
from micronet_tpu.nn import prepare, train_mode
from micronet_tpu.quant.config import QuantConfig

BATCH = 256


def build(method, cfg):
    model = nin_gc.Net(rngs=nnx.Rngs(0))
    if method:
        model = prepare(model, cfg, method=method, inplace=True)
    train_mode(model)
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
    return model, opt


def measure(method, cfg, iters=64):
    from micronet_tpu.utils.timing import train_step_seconds

    model, opt = build(method, cfg)
    gdef, state = nnx.split((model, opt))
    x0 = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 32, 32, 3))
    y0 = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, 10)

    def step(st, xi, yi):
        m, o = nnx.merge(gdef, st)

        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(m(xi), yi).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        o.update(m, grads)
        _, st2 = nnx.split((m, o))
        return st2, loss

    sec = train_step_seconds(step, state, x0, y0, iters=iters)
    return BATCH / sec, sec


def main():
    flavors = [
        ("fp32", None, None),
        ("dorefa_w8a8", "dorefa", QuantConfig(a_bits=8, w_bits=8)),
        ("iao_w8a8", "iao", QuantConfig(a_bits=8, w_bits=8)),
        # default bn_fuse: bn_stats="auto" resolves to the single-conv
        # accumulator-stats lowering on TPU (VERDICT r2 item 7)
        ("iao_w8a8_bnfuse", "iao", QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)),
        # the reference-faithful double-conv path (bf16 stats conv), kept
        # as the comparison point for the acc lowering's win
        ("iao_w8a8_bnfuse_statsconv", "iao",
         QuantConfig(a_bits=8, w_bits=8, bn_fuse=True, bn_stats="on")),
        ("iao_w4a4_bnfuse", "iao",
         QuantConfig(a_bits=4, w_bits=4, bn_fuse=True)),
        ("wbwtab_bin", "wbwtab", QuantConfig(W=2, A=2)),
        # attribution flavors: isolate activation-quant vs weight-quant cost
        ("iao_a8_only", "iao", QuantConfig(a_bits=8, w_bits=32)),
        ("iao_w8_only", "iao", QuantConfig(a_bits=32, w_bits=8)),
        # frozen-scale act quant (no observer/qparams update in the loop)
        ("iao_a8_qaft", "iao", QuantConfig(a_bits=8, w_bits=32, qaft=True)),
    ]
    only = set(sys.argv[1:])
    if only:
        flavors = [f for f in flavors if f[0] in only]
    for name, method, cfg in flavors:
        fps, sec = measure(method, cfg)
        print(
            json.dumps(
                {
                    "metric": f"train_step_{name}",
                    "value": round(fps, 1),
                    "unit": "img/s",
                    "ms_per_step": round(sec * 1e3, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
