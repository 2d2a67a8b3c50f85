"""Per-layer engine perf experiment (run on the real chip).

For each NIN-GC layer shape at batch 1024, times:
  - fp32 XLA conv (the baseline the engine must beat)
  - int8 XLA conv with int32 accumulation + requant epilogue (current
    engine path)
  - int8 dot_general lowering (1x1 convs as (M,C)x(C,O) matmuls; grouped
    via batched dot_general) + requant epilogue
  - bf16 conv

Prints a table; informs the IntConv2d lowering choice.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from micronet_tpu.utils.timing import per_step_seconds

# (name, H, W, Cin, Cout, k, stride, pad, groups)
LAYERS = [
    ("conv1 5x5 3->256", 32, 32, 3, 256, 5, 1, 2, 1),
    ("conv2 1x1 g2 256", 32, 32, 256, 256, 1, 1, 0, 2),
    ("conv3 1x1 g2 256", 32, 32, 256, 256, 1, 1, 0, 2),
    ("conv4 3x3 g16 256->512", 16, 16, 256, 512, 3, 1, 1, 16),
    ("conv5 1x1 g4 512", 16, 16, 512, 512, 1, 1, 0, 4),
    ("conv6 1x1 g4 512", 16, 16, 512, 512, 1, 1, 0, 4),
    ("conv7 3x3 g32 512->1024", 8, 8, 512, 1024, 3, 1, 1, 32),
    ("conv8 1x1 g8 1024", 8, 8, 1024, 1024, 1, 1, 0, 8),
    ("conv9 1x1 1024->10", 8, 8, 1024, 10, 1, 1, 0, 1),
]

BATCH = 1024


def conv(x, w, stride, pad, groups, pref):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=pref,
    )


def requant(acc, s, out_s):
    out = acc.astype(jnp.float32) * s
    q = jnp.sign(out) * jnp.floor(jnp.abs(out) / out_s + 0.5)
    return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


def main():
    rows = []
    for name, h, w_, cin, cout, k, stride, pad, groups in LAYERS:
        key = jax.random.PRNGKey(0)
        x_f = jax.random.normal(key, (BATCH, h, w_, cin), jnp.float32)
        x_q = jax.random.randint(key, (BATCH, h, w_, cin), -128, 128, jnp.int8)
        wf = jax.random.normal(key, (k, k, cin // groups, cout), jnp.float32)
        wq = jax.random.randint(key, (k, k, cin // groups, cout), -128, 128, jnp.int8)
        s = jnp.float32(0.01)
        out_s = jnp.float32(0.02)

        def fp32_fn(state, xi):
            return conv(xi, state, stride, pad, groups, jnp.float32)

        def bf16_fn(state, xi):
            return conv(
                xi.astype(jnp.bfloat16), state, stride, pad, groups, jnp.bfloat16
            )

        def int8_conv_fn(state, xi):
            acc = conv(xi, state, stride, pad, groups, jnp.int32)
            return requant(acc, s, out_s)

        t_fp32 = per_step_seconds(fp32_fn, wf, x_f, iters=24)
        t_bf16 = per_step_seconds(bf16_fn, wf.astype(jnp.bfloat16), x_f, iters=24)
        t_int8 = per_step_seconds(int8_conv_fn, wq, x_q, iters=24)

        t_dot = float("nan")
        if k == 1 and stride == 1:
            m = BATCH * h * w_
            kg, og = cin // groups, cout // groups

            # (M, C) -> (g, M, kg) batched dot with (g, kg, og) -> (g, M, og)
            def int8_dot_fn(state, xi):
                xm = xi.reshape(m, groups, kg).transpose(1, 0, 2)
                acc = jax.lax.dot_general(
                    xm,
                    state,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )
                q = requant(acc, s, out_s)
                return q.transpose(1, 0, 2).reshape(BATCH, h, w_, cout)

            # weights HWIO (1,1,kg,cout): out channels are group-major:
            # w[0,0,:,gi*og:(gi+1)*og] is group gi
            wq_dot = jnp.stack(
                [wq[0, 0, :, g * og : (g + 1) * og] for g in range(groups)]
            )
            t_dot = per_step_seconds(int8_dot_fn, wq_dot, x_q, iters=24)

        rows.append((name, t_fp32, t_bf16, t_int8, t_dot))
        print(
            f"{name:28s} fp32 {t_fp32*1e3:7.3f}  bf16 {t_bf16*1e3:7.3f}  "
            f"int8conv {t_int8*1e3:7.3f}  int8dot {t_dot*1e3:7.3f}  ms"
        )

    tot = [sum(r[i] for r in rows if not np.isnan(r[i])) for i in range(1, 4)]
    print(f"\ntotals: fp32 {tot[0]*1e3:.2f} bf16 {tot[1]*1e3:.2f} int8conv {tot[2]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
