"""Weight-only int4 compression of an arbitrary parameter pytree.

Run:  python examples/weight_only_llm.py

Shows the LLM-decode recipe (BASELINE configs[4]): quantize every large
2-D weight of a model's params to packed int4 + per-column scales
(~8x smaller), run matmuls through the Pallas W4A16 kernel (2-3x faster
than bf16 at decode shapes on v5e), and verify output agreement.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from micronet_tpu.quant.weight_only import (
        WOTensor,
        pytree_bytes,
        quantize_pytree,
    )

    d, dff = 1024, 4096
    rng = np.random.RandomState(0)
    params = {
        "attn_qkv": jnp.asarray(rng.randn(d, 3 * d).astype(np.float32) * 0.02),
        "attn_out": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.02),
        "mlp_up": jnp.asarray(rng.randn(d, dff).astype(np.float32) * 0.02),
        "mlp_down": jnp.asarray(rng.randn(dff, d).astype(np.float32) * 0.02),
        "ln_scale": jnp.ones((d,)),  # 1-D: stays float
    }

    def block(p, x):
        def mm(w, x):
            return w.matmul(x) if isinstance(w, WOTensor) else x @ w

        qkv = mm(p["attn_qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = jax.nn.softmax(q @ k.T / np.sqrt(d)) @ v
        x = x + mm(p["attn_out"], att)
        x = x * p["ln_scale"]
        return x + mm(p["mlp_down"], jax.nn.gelu(mm(p["mlp_up"], x)))

    x = jnp.asarray(rng.randn(8, d).astype(np.float32) * 0.5)
    y_fp = block(params, x)

    qparams = quantize_pytree(params, min_size=1 << 14)
    y_q = block(qparams, x)

    ratio = pytree_bytes(params) / pytree_bytes(qparams)
    rel = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    print(f"compression: {ratio:.1f}x   max rel err: {rel:.4f}")
    assert ratio > 6 and rel < 0.1


if __name__ == "__main__":
    main()
