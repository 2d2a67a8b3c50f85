"""Where does activation fake-quant spend its time in a train step?

Times fwd+bwd of variants of the activation-quantizer computation at a
NIN-GC-sized activation (batch 256), each as grad of a scalar readout so
the STE backward is included:

  baseline  — identity (measures harness + grad plumbing)
  relu      — one elementwise op (HBM floor: read + write + bwd mask)
  fq_eval   — fake_quant with frozen scale (no observer)
  obs       — EMA min/max observer update alone
  fq_train  — observer + qparams + fake_quant (the real QAT path)

Usage: python benchmarks/actquant_profile.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from micronet_tpu.utils.timing import per_step_seconds
from micronet_tpu.quant.quantizers import fake_quant, symmetric_qparams
from micronet_tpu.quant.observers import MinMaxState, ema_minmax_update

SHAPES = [
    ("256x32x32x256", (32, 32, 256)),
    ("256x8x8x1024", (8, 8, 1024)),
]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name, hwc in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (batch,) + hwc, jnp.float32)
        mn = jnp.asarray(-2.5).reshape(1)
        mx = jnp.asarray(2.7).reshape(1)

        def run(fn):
            def step(state, xi):
                def loss(z):
                    return jnp.sum(fn(z, state))

                return jax.grad(loss)(xi)

            return per_step_seconds(step, (mn, mx), x, iters=16) * 1e3

        def f_base(z, s):
            return z

        def f_relu(z, s):
            return jax.nn.relu(z)

        def f_fq_eval(z, s):
            mn_, mx_ = s
            scale, zp = symmetric_qparams(mn_, mx_, -128.0, 127.0)
            return fake_quant(z, scale, zp, -128.0, 127.0, mn_, mx_, True)

        def f_obs(z, s):
            mn_, mx_ = s
            st = MinMaxState(mn_, mx_, jnp.ones((), jnp.bool_))
            st = ema_minmax_update(st, z, None, 0.1)
            return z * (1.0 + 0.0 * st.max_val.reshape(()))

        def f_fq_train(z, s):
            mn_, mx_ = s
            st = MinMaxState(mn_, mx_, jnp.ones((), jnp.bool_))
            st = ema_minmax_update(st, z, None, 0.1)
            scale, zp = symmetric_qparams(st.min_val, st.max_val, -128.0, 127.0)
            return fake_quant(z, scale, zp, -128.0, 127.0, st.min_val, st.max_val, True)

        rows = [
            ("baseline", f_base),
            ("relu", f_relu),
            ("fq_eval", f_fq_eval),
            ("obs", f_obs),
            ("fq_train", f_fq_train),
        ]
        print(name)
        for label, fn in rows:
            print(f"  {label:10s} {run(fn):8.3f} ms")


if __name__ == "__main__":
    main()
