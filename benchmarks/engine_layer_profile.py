"""Per-layer lowering shootout for the int8 engine on the real chip.

For each NIN-GC conv layer shape (batch 1024), times three chained
lowerings (int8 in -> int8 out, the engine's steady state) plus the fp32
baseline (f32 in -> f32 out, conv+BN+ReLU as XLA fuses it in the eval
graph):

  f32        — conv f32 + scale/bias + relu  (what fp32 eval pays)
  int8       — int8 conv, int32 accum, f32 requant epilogue (IntConv2d)
  bf16       — int8 codes cast to bf16, bf16 conv / f32 accum, requant
  dot        — 1x1 only: int8 dot_general lowering (IntConv2d.pointwise_dot)

The engine picks its per-layer lowering from these numbers (the model is
bandwidth-bound on this chip — BENCHMARKS.md — so the winner varies by
shape). Usage: python benchmarks/engine_layer_profile.py [batch]
"""

import sys

import jax
import jax.numpy as jnp

from micronet_tpu.utils.timing import per_step_seconds

# (name, H, W, Cin, Cout, k, stride, pad, groups) — NIN-GC default cfg
LAYERS = [
    ("L0 5x5 g1 3>256 32x32", 32, 32, 3, 256, 5, 1, 2, 1),
    ("L1 1x1 g2 256>256 32x32", 32, 32, 256, 256, 1, 1, 0, 2),
    ("L3 3x3 g16 256>512 16x16", 16, 16, 256, 512, 3, 1, 1, 16),
    ("L4 1x1 g4 512>512 16x16", 16, 16, 512, 512, 1, 1, 0, 4),
    ("L6 3x3 g32 512>1024 8x8", 8, 8, 512, 1024, 3, 1, 1, 32),
    ("L7 1x1 g8 1024>1024 8x8", 8, 8, 1024, 1024, 1, 1, 0, 8),
    ("L8 1x1 g1 1024>10 8x8", 8, 8, 1024, 10, 1, 1, 0, 1),
]

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, stride, pad, groups, pref):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=DN,
        feature_group_count=groups,
        preferred_element_type=pref,
    )


def requant(acc_f32, scale, out_scale):
    y = acc_f32 * scale
    q = jnp.sign(y) * jnp.floor(jnp.abs(y / out_scale) + 0.5)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    key = jax.random.PRNGKey(0)
    print(f"batch={batch}  (ms per layer, chained int8 boundaries)")
    print(f"{'layer':28s} {'f32':>8s} {'int8':>8s} {'bf16':>8s} {'dot':>8s}")
    for name, h, w_, ci, co, k, st, pd, g in LAYERS:
        x_f = jax.random.normal(key, (batch, h, w_, ci), jnp.float32)
        x_i = jax.random.randint(key, (batch, h, w_, ci), -127, 128, jnp.int8)
        w_f = jax.random.normal(key, (k, k, ci // g, co), jnp.float32) * 0.05
        w_i = jax.random.randint(key, (k, k, ci // g, co), -127, 128, jnp.int8)
        scale = jnp.float32(0.01)

        def f32_layer(state, x):
            wf, sc = state
            y = conv(x, wf, st, pd, g, jnp.float32)
            return jax.nn.relu(y * sc + 0.1)

        def int8_layer(state, x):
            wq, sc = state
            acc = conv(x, wq, st, pd, g, jnp.int32)
            return requant(acc.astype(jnp.float32), sc, jnp.float32(0.02))

        def bf16_layer(state, x):
            wq, sc = state
            acc = conv(
                x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16), st, pd, g,
                jnp.float32,
            )
            return requant(acc.astype(jnp.float32), sc, jnp.float32(0.02))

        t_f = per_step_seconds(f32_layer, (w_f, scale), x_f, iters=32) * 1e3
        t_i = per_step_seconds(int8_layer, (w_i, scale), x_i, iters=32) * 1e3
        t_b = per_step_seconds(bf16_layer, (w_i, scale), x_i, iters=32) * 1e3
        t_d = float("nan")
        if k == 1 and st == 1:
            og, kg = co // g, ci // g

            def dot_layer(state, x):
                wq, sc = state
                m = x.shape[0] * x.shape[1] * x.shape[2]
                w2 = wq[0, 0]
                if g == 1:
                    acc = jax.lax.dot_general(
                        x.reshape(m, ci), w2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                else:
                    xg = x.reshape(m, g, kg).transpose(1, 0, 2)
                    wg = w2.reshape(kg, g, og).transpose(1, 0, 2)
                    acc = jax.lax.dot_general(
                        xg, wg, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                return requant(acc.astype(jnp.float32), sc, jnp.float32(0.02))

            t_d = per_step_seconds(dot_layer, (w_i, scale), x_i, iters=32) * 1e3
        print(f"{name:28s} {t_f:8.3f} {t_i:8.3f} {t_b:8.3f} {t_d:8.3f}")


if __name__ == "__main__":
    main()
