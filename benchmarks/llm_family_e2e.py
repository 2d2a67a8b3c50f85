"""End-to-end Llama-3-8B decode through the REAL model family.

``benchmarks/llm_e2e.py`` measures the 32-layer transformer BODY with
raw weight dicts (no embedding, no lm_head, no RoPE). This script runs
the actual :class:`micronet_tpu.models.llama.Llama` module at the 8B
geometry — the code path a user serves — and therefore includes
everything the body-only number excludes:

- RoPE on q/k (elementwise, ~free),
- the embedding lookup (one row per token),
- the LM HEAD: a (4096, 128256) matmul EVERY decoded token. In f32
  that is 2.1 GB/token of weight reads — more than half the W4 body —
  so the family quantizes it to hl8 W4 too (``quantize_lm_head=True``,
  0.26 GB/token): the honest end-to-end number is only possible with
  the quantized head.

Construction uses the as-built W4 path (``w4_group=128``): float
transients peak at one block, so the ~8B-param model initializes inside
a 16 GB chip.

Prints JSON rows ``llm8b_family_decode`` / ``llm8b_family_prefill``
(same methodology as llm_e2e: slope-timed jitted step, warm cache at
S-8, unrolled per-layer weights).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from micronet_tpu.models.llama import Llama, llama3_8b
from micronet_tpu.quant.kv_cache import append_kv

SEQ = 2048
GROUP = 128


def main():
    from micronet_tpu.utils.timing import per_step_seconds

    cfg = llama3_8b(max_seq=SEQ)
    model = Llama(cfg, rngs=nnx.Rngs(0), w4_group=GROUP)
    gdef, state = nnx.split(model)

    # weight-byte accounting: every leaf the decode step must read once
    # per token (embed excluded: a lookup reads one row, not the table)
    n_bytes = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(nnx.to_pure_dict(state)):
        if "embed" in str(path):
            continue
        n_bytes += leaf.size * leaf.dtype.itemsize

    caches = model.init_cache()
    fill = jax.random.normal(
        jax.random.PRNGKey(2),
        (cfg.n_kv_heads, SEQ - 8, cfg.head_dim),
        jnp.float32,
    )
    caches = [append_kv(c, fill, fill) for c in caches]

    def fwd(st, tok, cs, off):
        return nnx.merge(gdef, st).forward(tok, cs, off)

    tok1 = jnp.asarray([17], jnp.int32)
    # numerics gate before the timed run
    gate_logits, _ = jax.jit(fwd)(state, tok1, caches, jnp.int32(SEQ - 8))
    assert np.isfinite(np.asarray(gate_logits)).all(), "non-finite decode logits"

    sec_tok = per_step_seconds(
        lambda s, xi: fwd(s[0], xi, s[1], jnp.int32(SEQ - 8))[0],
        (state, caches),
        tok1,
        iters=32,
    )
    bound = n_bytes / 700e9  # measured read-stream bandwidth (bench.py)
    print(
        json.dumps(
            {
                "metric": "llm8b_family_decode",
                "value": round(1.0 / sec_tok, 1),
                "unit": "tokens/s/chip",
                "ms_per_token": round(sec_tok * 1e3, 2),
                "weight_gb": round(n_bytes / 2**30, 2),
                "frac_of_weight_read_bound": round(bound / sec_tok, 2),
                "includes": "embed lookup + RoPE + W4 lm_head (128256 vocab)",
                "note": (
                    "full models.llama.Llama module (the user-facing code "
                    "path); llm8b_w4_decode measures the body only"
                ),
            }
        ),
        flush=True,
    )

    tp = min(128, cfg.max_seq // 2)
    toks = (jnp.arange(tp, dtype=jnp.int32) * 7) % cfg.vocab
    fresh = model.init_cache()
    sec_pre = per_step_seconds(
        lambda s, xi: fwd(s[0], xi, s[1], jnp.int32(0))[0],
        (state, fresh),
        toks,
        iters=8,
    )
    print(
        json.dumps(
            {
                "metric": "llm8b_family_prefill",
                "value": round(tp / sec_pre, 1),
                "unit": "tokens/s/chip",
                "ms_per_block": round(sec_pre * 1e3, 2),
                "block_tokens": tp,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
