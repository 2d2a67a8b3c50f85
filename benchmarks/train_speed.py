"""Training-step throughput across quant flavors on the current chip.

A scan of K full train steps (augment + forward + STE backward + Adam +
state updates) with the loss chained into the next input — the honest
measurement recipe from micronet_tpu.utils.timing applied to a mutating
step. Prints one JSON line per flavor.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
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
    model, opt = build(method, cfg)
    gdef, state = nnx.split((model, opt))
    x0 = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 32, 32, 3))
    y0 = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, 10)

    def make(k):
        @jax.jit
        def run(state, x, y, seed):
            def body(carry, i):
                st, prev_loss = carry
                m, o = nnx.merge(gdef, st)
                xi = x * (1.0 + 1e-12 * prev_loss) + seed.astype(jnp.float32) * 1e-6

                def loss_fn(m):
                    return optax.softmax_cross_entropy_with_integer_labels(
                        m(xi), y
                    ).mean()

                loss, grads = nnx.value_and_grad(loss_fn)(m)
                o.update(m, grads)
                _, st2 = nnx.split((m, o))
                return (st2, loss), None

            (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(k))
            return loss

        return run

    ks = (max(2, iters // 4), iters)
    runners = {k: make(k) for k in ks}
    for k in ks:
        np.asarray(runners[k](state, x0, y0, jnp.int32(0)))

    def timed(k, seed):
        t0 = time.perf_counter()
        np.asarray(runners[k](state, x0, y0, jnp.int32(seed)))
        return time.perf_counter() - t0

    slopes = []
    for t in range(3):
        ts = timed(ks[0], 100 + t)
        tl = timed(ks[1], 200 + t)
        slopes.append((tl - ts) / (ks[1] - ks[0]))
    slopes.sort()
    sec = max(slopes[1], 1e-9)
    return BATCH / sec, sec


def main():
    flavors = [
        ("fp32", None, None),
        ("dorefa_w8a8", "dorefa", QuantConfig(a_bits=8, w_bits=8)),
        ("iao_w8a8", "iao", QuantConfig(a_bits=8, w_bits=8)),
        ("iao_w8a8_bnfuse", "iao", QuantConfig(a_bits=8, w_bits=8, bn_fuse=True)),
        ("wbwtab_bin", "wbwtab", QuantConfig(W=2, A=2)),
    ]
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
